"""Value tests for operators/attribution.py — multi-touch credit models.

Pins the credit conventions: single touch takes 100 % in every model,
two touches split 50/50 under position-based, endpoints take 40 % each
with middles sharing 20 %, lookback and ordering bounds, and exact
bigint conservation per conversion."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.attribution import (
    channel_credit_report,
    multi_touch_attribution,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2026, 1, day, hour)


def _touches(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return multi_touch_attribution(
        df, conversion_type="purchase", lookback_days=7
    )


def test_single_touch_full_credit(spark):
    out = _touches(
        spark,
        [
            (1, _ts(1), 10, "click"),
            (2, _ts(2), 10, "purchase"),
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.first_touch, r.last_touch) == (1, 1)
    assert r.linear_micros == 1_000_000
    assert r.position_micros == 1_000_000


def test_two_touches_split_50_50(spark):
    out = _touches(
        spark,
        [
            (1, _ts(1), 10, "view"),
            (2, _ts(2), 10, "click"),
            (3, _ts(3), 10, "purchase"),
        ],
    )
    rows = {r.touch_pos: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[1].first_touch == 1 and rows[1].last_touch == 0
    assert rows[2].first_touch == 0 and rows[2].last_touch == 1
    for r in rows.values():
        assert r.linear_micros == 500_000
        assert r.position_micros == 500_000


def test_u_shape_40_20_40(spark):
    out = _touches(
        spark,
        [
            (1, _ts(1, 1), 10, "view"),
            (2, _ts(1, 2), 10, "click"),
            (3, _ts(1, 3), 10, "error"),
            (4, _ts(1, 4), 10, "view"),
            (5, _ts(2), 10, "purchase"),
        ],
    )
    rows = {r.touch_pos: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].position_micros == 400_000
    assert rows[4].position_micros == 400_000
    assert rows[2].position_micros == 100_000
    assert rows[3].position_micros == 100_000
    assert all(r.linear_micros == 250_000 for r in rows.values())


def test_lookback_and_ordering_bounds(spark):
    # one touch 8 days before (outside lookback), one after the
    # conversion (never credited), one inside — only the inside row
    out = _touches(
        spark,
        [
            (1, _ts(1), 10, "view"),  # conv is day 9: 8 days prior, out
            (2, _ts(5), 10, "click"),  # in window
            (3, _ts(9, 12), 10, "view"),  # after conversion, out
            (4, _ts(9), 10, "purchase"),
        ],
    ).collect()
    assert len(out) == 1
    assert out[0].channel == "click"


def test_conversion_without_touches_emits_nothing(spark):
    out = _touches(
        spark,
        [
            (1, _ts(1), 10, "purchase"),
            (2, _ts(2), 99, "click"),  # other user
        ],
    ).collect()
    assert out == []


def test_timestamp_tie_breaks_on_id(spark):
    # identical timestamps: the id ordering decides first vs last
    out = _touches(
        spark,
        [
            (7, _ts(1), 10, "view"),
            (3, _ts(1), 10, "click"),
            (9, _ts(2), 10, "purchase"),
        ],
    )
    rows = {r.touch_pos: r for r in out.collect()}
    assert rows[1].channel == "click"  # id 3 before id 7
    assert rows[2].channel == "view"


def test_credit_conservation_per_conversion(spark):
    # every conversion's credit sums to scale minus the deterministic
    # integer-division residue: scale - (n-1) <= sum <= scale
    rows = []
    eid = 0
    for u, n_touch in [(1, 1), (2, 2), (3, 3), (4, 6), (5, 7)]:
        for i in range(n_touch):
            eid += 1
            rows.append((eid, _ts(1, i + 1), u, "click" if i % 2 else "view"))
        eid += 1
        rows.append((eid, _ts(3), u, "purchase"))
    per_conv = (
        _touches(spark, rows)
        .groupBy("conv_id")
        .agg(
            F.sum("linear_micros").alias("lin"),
            F.sum("position_micros").alias("pos"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(per_conv) == 5
    for r in per_conv:
        assert 1_000_000 - r.n < r.lin <= 1_000_000
        assert 1_000_000 - r.n < r.pos <= 1_000_000


def test_channel_report_rolls_up_exactly(spark):
    t = _touches(
        spark,
        [
            (1, _ts(1), 10, "view"),
            (2, _ts(2), 10, "click"),
            (3, _ts(3), 10, "purchase"),
            (4, _ts(1), 20, "click"),
            (5, _ts(2), 20, "purchase"),
        ],
    )
    rep = {r.channel: r for r in channel_credit_report(t).collect()}
    assert rep["click"].conversions_touched == 2
    assert rep["click"].first_touch_wins == 1  # user 20's only touch
    assert rep["click"].last_touch_wins == 2
    assert rep["click"].linear_micros == 500_000 + 1_000_000
    assert rep["view"].first_touch_wins == 1
    assert rep["view"].last_touch_wins == 0
