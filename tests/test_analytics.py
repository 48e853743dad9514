"""SQL analytics layer tests — the six Athena queries (Athena.sql:114-177)
over synthesized report rows, plus the metrics profile plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.plans import analytics, metrics
from high_throughput_etl_pipeline_spark.sources.reports import (
    GLUE_REPORT_SCHEMA,
    LAMBDA_REPORT_SCHEMA,
    register_report_views,
)


@pytest.fixture(scope="module")
def report_views(spark):
    lambda_rows = [
        {
            "report_id": f"l{i}",
            "execution_info": {
                "request_id": f"r{i}", "function_name": "mb",
                "function_version": "1", "memory_limit_mb": 512,
                "log_group": "g", "log_stream": "s",
            },
            "execution_metrics": {
                "start_time": f"2026-08-{10 + i % 2:02d}T01:00:00Z",
                "end_time": "x", "duration_seconds": 2.0 + i,
                "remaining_time_ms": 60000,
            },
            "processing_summary": {
                "files_processed": 10 * (i + 1), "files_quarantined": i % 2,
                "manifests_created": i + 1, "errors_count": i % 3,
                "status": "success" if i % 3 == 0 else "partial_success",
            },
            "manifests": [f"manifests/m{i}.json"],
            "errors": ["e"] if i % 3 else [],
            "configuration": {
                "max_files_per_manifest": 10, "expected_file_size_mb": 3.5,
                "size_tolerance_percent": 50.0, "min_files_for_partial_batch": 1,
            },
            "report_metadata": {
                "generated_at": "t", "report_version": "1.0", "environment": "dev",
            },
        }
        for i in range(6)
    ]
    glue_rows = [
        {
            "report_id": f"g{i}",
            "job_info": {
                "job_name": "job", "job_run_id": f"jr{i}",
                "start_time": f"2026-08-{10 + i % 2:02d}T02:00:00Z",
                "end_time": "x", "duration_seconds": 30.0 + i,
            },
            "processing_summary": {
                "manifest_processed": f"manifests/m{i}.json",
                "batches_processed": 1, "records_processed": 1000 * (i + 1),
                "parquet_files_created": 2, "errors_count": 0 if i % 2 else 1,
                "status": "success" if i % 2 else "failed",
            },
            "parquet_files": [],
            "error_message": None if i % 2 else "boom",
            "report_metadata": {
                "generated_at": "t", "report_version": "1.0", "environment": "dev",
            },
        }
        for i in range(4)
    ]
    register_report_views(
        spark,
        lambda_df=spark.createDataFrame(lambda_rows, LAMBDA_REPORT_SCHEMA),
        glue_df=spark.createDataFrame(glue_rows, GLUE_REPORT_SCHEMA),
    )
    return spark


def test_daily_summary(report_views):
    rows = analytics.run(report_views, "daily_summary").collect()
    assert {r["date"] for r in rows} == {"2026-08-10", "2026-08-11"}
    total = sum(r["total_files_processed"] for r in rows)
    assert total == sum(10 * (i + 1) for i in range(6))


def test_failed_executions(report_views):
    rows = analytics.run(report_views, "failed_executions").collect()
    assert all(r["errors_count"] > 0 for r in rows)
    assert len(rows) == 4  # i % 3 != 0 → i in {1,2,4,5}


def test_duration_stats(report_views):
    rows = analytics.run(report_views, "duration_stats").collect()
    assert all(r["avg_duration_sec"] > 0 for r in rows)


def test_glue_performance_and_failures(report_views):
    perf = analytics.run(report_views, "glue_performance").collect()
    assert len(perf) == 4
    fails = analytics.run(report_views, "glue_failures").collect()
    assert {r["report_id"] for r in fails} == {"g0", "g2"}


def test_correlation_join(report_views):
    rows = analytics.run(report_views, "correlation").collect()
    # manifests m0..m3 exist on both sides
    assert len(rows) == 4
    assert all(r["manifest_path"].startswith("manifests/") for r in rows)


def test_metrics_plans(spark):
    df = spark.range(100).select(
        (F.col("id") % 24).alias("hour"),
        F.concat(F.lit("2026-08-12-"), F.format_string("%02d", F.col("id") % 24)).alias("date_hour"),
        (F.col("id") * 1.5).alias("size_mb"),
        (F.col("id") * 1.5 / 1024).alias("size_gb"),
    )
    prof = metrics.size_profile(df).collect()[0]
    assert prof["file_count"] == 100
    assert prof["min_mb"] == 0.0
    vel = metrics.velocity(df, hours_observed=24.0).collect()[0]
    assert vel["files_per_hour"] == round(100 / 24.0, 2)
    peak = metrics.peak_hour(df).collect()[0]
    assert peak["file_count"] >= 4
    hb = metrics.hourly_breakdown(df)
    assert hb.count() == 24


def test_retention_cohorts_counts(spark):
    from high_throughput_etl_pipeline_spark.queries import QUERIES

    import datetime

    rows = []
    # user 1: first seen d0, active d0 and d2 (two events d2 — distinct!)
    # user 2: first seen d0 only; user 3: first seen d1, active d1, d2
    d = lambda i: datetime.datetime(2026, 1, 1 + i, 12, 0)
    rows += [(1, d(0)), (1, d(2)), (1, d(2)), (2, d(0)), (3, d(1)), (3, d(2))]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP")
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        # reuse the registered query by pointing it at a temp sf_dir
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {
            (r["cohort_date"], r["day_offset"]): r["n_users"]
            for r in QUERIES["user_retention_cohorts"](spark, td).collect()
        }
    assert out == {
        ("2026-01-01", 0): 2,  # users 1, 2
        ("2026-01-01", 2): 1,  # user 1 returns once (dedup within day)
        ("2026-01-02", 0): 1,  # user 3
        ("2026-01-02", 1): 1,  # user 3 returns
    }
