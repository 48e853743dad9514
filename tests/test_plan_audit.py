"""Fleet-wide plan audit: EVERY registered query's physical plan is
checked for the anti-patterns this repo bans, at sf0.001 (construction
cost only — no result collection):

- ``CartesianProduct``   — an unbroadcast cross join; every intentional
  one-row/model cross join must broadcast (BroadcastNestedLoopJoin).
- ``BatchEvalPython``    — a row-at-a-time Python UDF on any path.
- ``ArrowEvalPython``    — a scalar pandas_udf; the only sanctioned
  Python-in-the-loop stages are Arrow-batched mapInPandas /
  applyInPandasWithState (MapInPandas / FlatMapGroupsInPandas nodes),
  which are allowed.

Per-query pins live in test_plans.py; this is the backstop that new
queries cannot skip."""

from __future__ import annotations

from high_throughput_etl_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_every_query_plan_free_of_banned_shapes(spark):
    failures: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # construction failure is its own bug
            failures[name] = f"construction raised: {ex!r:.200}"
            continue
        for bad in FORBIDDEN:
            if bad in plan:
                failures[name] = bad
                break
    assert not failures, failures
