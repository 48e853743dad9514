"""Driver-contract smoke tests: every query runs at sf0.001 and the
oracle dict stays consistent with the query registry.

(The full value-level comparison vs DuckDB runs in
tools/check_correctness.py at sf0.01 — too slow for the unit suite.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_every_oracle_has_a_query():
    qs, os_ = contract.queries(), contract.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


@pytest.mark.parametrize("name", sorted(contract.queries()))
def test_query_runs_at_smoke_sf(spark, name):
    df = contract.queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
