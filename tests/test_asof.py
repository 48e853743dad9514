"""As-of join edge cases: no-prior-match nulls, equal-timestamp ties,
payload columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
)


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "10:00:00", "p1"),   # matches right at 09:59
            (1, "10:30:00", "p2"),   # matches right at 10:30 (tie → match)
            (2, "08:00:00", "p3"),   # no prior right row → null
        ],
        "k BIGINT, t STRING, name STRING",
    ).select("k", F.to_timestamp(F.concat(F.lit("2026-08-12 "), "t")).alias("ts"), "name")
    right = spark.createDataFrame(
        [
            (1, "09:59:00", "v1"),
            (1, "10:30:00", "v2"),
            (1, "11:00:00", "v3"),   # later than all lefts → never matched
            (2, "09:00:00", "v4"),   # after left p3 → not matched
        ],
        "k BIGINT, t STRING, tag STRING",
    ).select("k", F.to_timestamp(F.concat(F.lit("2026-08-12 "), "t")).alias("ts"), "tag")

    out = asof_join_backward(left, right, on=["k"], right_payload=["tag"])
    rows = {r["name"]: r for r in out.collect()}
    assert rows["p1"]["asof_tag"] == "v1"
    assert rows["p2"]["asof_tag"] == "v2"  # equal ts matches (ASOF >=)
    assert rows["p3"]["asof_tag"] is None
    assert rows["p3"]["asof_ts"] is None


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "10:00:00", "p1"),   # next right at 10:30
            (1, "10:30:00", "p2"),   # tie at 10:30 → match (ASOF <=)
            (1, "11:30:00", "p3"),   # nothing after → null
            (2, "08:00:00", "p4"),   # next right at 09:00
        ],
        "k BIGINT, t STRING, name STRING",
    ).select("k", F.to_timestamp(F.concat(F.lit("2026-08-12 "), "t")).alias("ts"), "name")
    right = spark.createDataFrame(
        [
            (1, "09:59:00", "v1"),   # before every left → never matched
            (1, "10:30:00", "v2"),
            (1, "11:00:00", "v3"),
            (2, "09:00:00", "v4"),
        ],
        "k BIGINT, t STRING, tag STRING",
    ).select("k", F.to_timestamp(F.concat(F.lit("2026-08-12 "), "t")).alias("ts"), "tag")

    out = asof_join_forward(left, right, on=["k"], right_payload=["tag"])
    rows = {r["name"]: r for r in out.collect()}
    assert rows["p1"]["asof_tag"] == "v2"
    assert rows["p2"]["asof_tag"] == "v2"  # equal ts matches (ASOF <=)
    assert rows["p3"]["asof_tag"] is None
    assert rows["p3"]["asof_ts"] is None
    assert rows["p4"]["asof_tag"] == "v4"
