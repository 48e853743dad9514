"""Skew-salting helpers and the sessionization operator (batch + stream)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.skew import (
    salted_count,
    salted_join,
)
from high_throughput_etl_pipeline_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


def test_salted_join_matches_plain_join(spark):
    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)],
        "k INT, v INT",
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k INT, name STRING")
    plain = skewed.join(dim, on=["k"]).groupBy("k", "name").count()
    salted = salted_join(skewed, dim, on=["k"], n_salts=8).groupBy(
        "k", "name"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_count(spark):
    df = spark.createDataFrame(
        [("a",)] * 1000 + [("b",)] * 7, "k STRING"
    )
    out = {r["k"]: r["count"] for r in salted_count(df, ["k"], n_salts=8).collect()}
    assert out == {"a": 1000, "b": 7}


def _session_events(spark):
    # user 1: two sessions (gap > 30min); user 2: one session
    rows = [
        (1, "2026-08-12 10:00:00", 1.0),
        (1, "2026-08-12 10:10:00", 2.0),
        (1, "2026-08-12 11:30:00", 3.0),   # 80 min gap → new session
        (2, "2026-08-12 09:00:00", 5.0),
        (2, "2026-08-12 09:05:00", 5.0),
    ]
    return spark.createDataFrame(
        rows, "user_id BIGINT, ts_s STRING, value DOUBLE"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")


def test_sessionize_batch(spark):
    out = sessionize_batch(_session_events(spark), gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert len(by_user[2]) == 1
    s1 = sorted(by_user[1], key=lambda r: r["session_start"])
    assert s1[0]["n_events"] == 2 and s1[0]["total_value"] == 3.0
    assert s1[1]["n_events"] == 1 and s1[1]["total_value"] == 3.0
    assert by_user[2][0]["n_events"] == 2


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Drive the stateful streaming operator and compare closed sessions
    against the batch oracle."""
    ind = tmp_path / "in"
    ind.mkdir()
    events = [
        {"user_id": 1, "ts": "2026-08-12 10:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2026-08-12 10:10:00", "value": 2.0},
        {"user_id": 1, "ts": "2026-08-12 11:30:00", "value": 3.0},
        {"user_id": 2, "ts": "2026-08-12 09:00:00", "value": 5.0},
        {"user_id": 2, "ts": "2026-08-12 09:05:00", "value": 5.0},
    ]
    with open(ind / "batch0.ndjson", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    stream = (
        spark.readStream.schema("user_id BIGINT, ts STRING, value DOUBLE")
        .json(str(ind))
        .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = spark.sql("SELECT * FROM sessions_out").collect()
    # within one batch, user 1's first session closes (gap exceeded by the
    # 11:30 event); open sessions stay in state until timeout
    assert any(
        r["user_id"] == 1 and r["n_events"] == 2 and r["total_value"] == 3.0
        for r in closed
    )
