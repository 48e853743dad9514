"""Core transform tests: the correctness oracle of SURVEY.md §5 —
row-count conservation, column set = input ∪ metadata, all-string types,
date partitioning, canonical struct rendering."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.functions.scalar import (
    cast_all_to_string,
    with_metadata_columns,
)
from high_throughput_etl_pipeline_spark.ingest import process_manifest, transform
from high_throughput_etl_pipeline_spark.sources.ndjson import (
    read_ndjson,
    resolve_manifest,
)


def test_row_count_conservation_and_schema(spark, ndjson_dir, tmp_path):
    _, paths = ndjson_dir
    out = str(tmp_path / "out")
    n = process_manifest(spark, paths, out)
    assert n == 6 * 20
    result = spark.read.parquet(out)
    assert result.count() == n
    # column set = input ∪ {_processing_timestamp, _source_file} (+ _date)
    assert set(result.columns) == {
        "id", "v", "flag", "nested",
        "_processing_timestamp", "_source_file", "_date",
    }
    # all data columns are string (the storage semantic)
    for f in result.schema.fields:
        if f.name != "_date":
            assert f.dataType.simpleString() == "string", f.name


def test_event_time_date_partitioning(spark, ndjson_dir, tmp_path):
    _, paths = ndjson_dir
    out = str(tmp_path / "out")
    process_manifest(spark, paths, out)
    dates = {
        str(r[0])
        for r in spark.read.parquet(out).select("_date").distinct().collect()
    }
    # dates come from the FILE NAME (event time), not processing time
    assert dates == {"2026-08-12", "2026-08-10"}


def test_struct_cast_is_canonical_json(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2, "b": [1, 2]})],
        "id INT, nested STRUCT<a: INT, b: ARRAY<INT>>",
    )
    out = cast_all_to_string(df).collect()[0]
    assert out["id"] == "1"
    assert json.loads(out["nested"]) == {"a": 2, "b": [1, 2]}


def test_metadata_columns(spark, ndjson_dir):
    _, paths = ndjson_dir
    df = with_metadata_columns(read_ndjson(spark, paths))
    row = df.select("_source_file", "_processing_timestamp").first()
    assert row["_source_file"].endswith(".ndjson")
    assert row["_processing_timestamp"] is not None


def test_resolve_manifest_reference_shape():
    doc = {
        "fileLocations": [
            {"URIPrefixes": ["s3://b/a.ndjson", "s3://b/b.ndjson"]},
            {"URIPrefixes": ["s3://b/c.ndjson"]},
        ]
    }
    assert resolve_manifest(doc) == [
        "s3://b/a.ndjson", "s3://b/b.ndjson", "s3://b/c.ndjson",
    ]
    assert resolve_manifest(json.dumps(doc)) == resolve_manifest(doc)


def test_transform_single_pass_plan(spark, ndjson_dir):
    """The shaped plan must not force extra jobs: transform is lazy and
    contains no caches/counts (unlike the reference's double action)."""
    _, paths = ndjson_dir
    shaped = transform(read_ndjson(spark, paths))
    plan = shaped._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan


def test_corrupt_record_routing(spark, tmp_path):
    """Row-level quarantine: malformed lines land in _corrupt_record
    instead of failing the batch (the reference could only quarantine
    whole files)."""
    from high_throughput_etl_pipeline_spark.sources.ndjson import (
        read_ndjson,
        split_corrupt,
    )

    p = tmp_path / "2026-08-12-mixed.ndjson"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": 3, "v":\n'
    )
    df = read_ndjson(
        spark, [str(p)], schema="id BIGINT, v STRING", keep_corrupt=True
    )
    good, bad = split_corrupt(df)
    assert good.count() == 2
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 2
    assert all(r["_source_file"].endswith(".ndjson") for r in bad.collect())
