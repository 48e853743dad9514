"""The staleness ledger tool: shape and green/red classification."""

from __future__ import annotations

import importlib


def test_ledger_covers_registry_and_classifies():
    mod = importlib.import_module("tools.staleness")
    led = mod.ledger()
    from high_throughput_etl_pipeline_spark.queries import QUERIES

    assert set(led) == set(QUERIES)
    # classification: all three match flags green; any False is red
    assert mod.is_green(
        {"rows_match": True, "schema_match": True, "hash_match": True}
    )
    assert not mod.is_green(
        {"rows_match": True, "schema_match": True, "hash_match": False}
    )
    assert mod.is_green({"status": "pass"})
    assert not mod.is_green({"status": "fail"})
    assert not mod.is_green(None)
    # the r12 window must be reflected: its 50 green rows carry r12 as
    # their latest green round
    r12_green = [n for n, st in led.items() if st["green"] == 12]
    assert len(r12_green) >= 40
    # red-latest rows would demand rotation priority; currently none
    assert not [
        n
        for n, st in led.items()
        if st["red"] is not None
        and (st["green"] is None or st["red"] > st["green"])
    ]
