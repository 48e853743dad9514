"""Scalar expression surface tests (P5-P17 helpers not covered elsewhere)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.functions.scalar import (
    bytes_to_gb,
    bytes_to_mb,
    date_components,
    extract_date_prefix,
    file_name_of,
    md5_shard,
    parse_s3_path,
    split_status,
    status_with_shard,
    ttl_epoch,
)


def test_date_prefix_extraction_and_fallback(spark):
    df = spark.createDataFrame(
        [("input/2026-08-12-file.ndjson",), ("no-date-here.ndjson",)],
        "key STRING",
    )
    out = df.select(
        extract_date_prefix(F.col("key")).alias("d"),
        extract_date_prefix(F.col("key"), fallback_today=False).alias("raw"),
    ).collect()
    assert out[0]["d"] == "2026-08-12"
    assert out[0]["raw"] == "2026-08-12"
    # fallback = today UTC (builder.py:603-610)
    assert out[1]["raw"] == ""
    assert len(out[1]["d"]) == 10 and out[1]["d"].count("-") == 2


def test_s3_path_parse(spark):
    df = spark.createDataFrame([("s3://my-bucket/a/b/c.ndjson",)], "uri STRING")
    bucket, key = parse_s3_path(F.col("uri"))
    row = df.select(
        bucket.alias("b"), key.alias("k"), file_name_of(F.col("uri")).alias("f")
    ).collect()[0]
    assert row["b"] == "my-bucket"
    assert row["k"] == "a/b/c.ndjson"
    assert row["f"] == "c.ndjson"


def test_md5_shard_range_and_determinism(spark):
    df = spark.createDataFrame([(f"file-{i}.ndjson",) for i in range(200)], "k STRING")
    shards = df.select(md5_shard(F.col("k")).alias("s"))
    vals = [r["s"] for r in shards.collect()]
    assert all(0 <= v < 10 for v in vals)
    assert len(set(vals)) == 10  # 200 keys spread over all 10 shards
    again = [r["s"] for r in shards.collect()]
    assert vals == again


def test_status_roundtrip(spark):
    df = spark.createDataFrame([(3,)], "shard INT")
    built = df.select(
        status_with_shard("pending", F.col("shard")).alias("st")
    )
    assert built.collect()[0]["st"] == "pending#3"
    base, shard = split_status(F.col("st"))
    row = built.select(base.alias("b"), shard.alias("s")).collect()[0]
    assert (row["b"], row["s"]) == ("pending", 3)
    # legacy unsharded value → shard -1
    legacy = spark.createDataFrame([("pending",)], "st STRING")
    b2, s2 = split_status(F.col("st"))
    row2 = legacy.select(b2.alias("b"), s2.alias("s")).collect()[0]
    assert (row2["b"], row2["s"]) == ("pending", -1)


def test_unit_conversions(spark):
    df = spark.createDataFrame([(1024 * 1024 * 1024,)], "b BIGINT")
    row = df.select(
        bytes_to_mb(F.col("b")).alias("mb"), bytes_to_gb(F.col("b")).alias("gb")
    ).collect()[0]
    assert row["mb"] == 1024.0
    assert row["gb"] == 1.0


def test_date_components(spark):
    df = spark.createDataFrame(
        [("2026-08-12 13:45:56",)], "t STRING"
    ).select(F.to_timestamp("t").alias("ts"))
    comps = date_components(F.col("ts"))
    row = df.select(*[c.alias(k) for k, c in comps.items()]).collect()[0]
    assert row["date_hour"] == "2026-08-12-13"
    assert (row["year"], row["month"], row["day"]) == (2026, 8, 12)
    assert (row["hour"], row["minute"]) == (13, 45)


def test_ttl_epoch(spark):
    row = spark.range(1).select(ttl_epoch(7).alias("ttl")).collect()[0]
    expected = time.time() + 7 * 86400
    assert abs(row["ttl"] - expected) < 300
