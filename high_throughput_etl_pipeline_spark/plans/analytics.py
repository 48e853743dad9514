"""The SQL analytics layer — the six Athena report queries as Spark SQL.

Parity: Athena.sql:114-177 run by the reference against JSON execution
reports via Presto.  Here they are plain Catalyst over the views
registered by :func:`sources.reports.register_report_views` — same SQL
dialect modulo UNNEST→LATERAL/explode.  All are driver-metadata scale
(thousands of rows), so plans are trivially broadcast-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Athena.sql:114-123 — daily processing summary
DAILY_SUMMARY = """
SELECT
    substr(execution_metrics.start_time, 1, 10) AS date,
    COUNT(*)                                    AS executions,
    SUM(processing_summary.files_processed)     AS total_files_processed,
    SUM(processing_summary.manifests_created)   AS total_manifests_created,
    SUM(processing_summary.files_quarantined)   AS total_quarantined,
    SUM(processing_summary.errors_count)        AS total_errors
FROM lambda_reports
GROUP BY substr(execution_metrics.start_time, 1, 10)
ORDER BY date DESC
"""

# Athena.sql:126-133 — executions with failures
FAILED_EXECUTIONS = """
SELECT report_id,
       execution_metrics.start_time  AS start_time,
       processing_summary.status     AS status,
       processing_summary.errors_count AS errors_count,
       errors
FROM lambda_reports
WHERE processing_summary.errors_count > 0
ORDER BY execution_metrics.start_time DESC
"""

# Athena.sql:136-143 — duration statistics by day
DURATION_STATS = """
SELECT
    substr(execution_metrics.start_time, 1, 10)          AS date,
    ROUND(AVG(execution_metrics.duration_seconds), 2)    AS avg_duration_sec,
    ROUND(MAX(execution_metrics.duration_seconds), 2)    AS max_duration_sec,
    ROUND(AVG(execution_metrics.remaining_time_ms / 1000.0), 2)
                                                         AS avg_remaining_sec
FROM lambda_reports
GROUP BY substr(execution_metrics.start_time, 1, 10)
ORDER BY date DESC
"""

# Athena.sql:146-154 — per-run Glue performance
GLUE_PERFORMANCE = """
SELECT report_id,
       job_info.start_time                         AS start_time,
       job_info.duration_seconds                   AS duration_seconds,
       processing_summary.records_processed        AS records_processed,
       processing_summary.parquet_files_created    AS parquet_files_created,
       processing_summary.status                   AS status
FROM glue_reports
ORDER BY job_info.start_time DESC
"""

# Athena.sql:157-163 — Glue failure details
GLUE_FAILURES = """
SELECT report_id,
       job_info.start_time              AS start_time,
       processing_summary.status        AS status,
       error_message
FROM glue_reports
WHERE processing_summary.status <> 'success'
ORDER BY job_info.start_time DESC
"""

# Athena.sql:166-177 — Lambda↔Glue correlation: CROSS JOIN UNNEST(manifests)
# becomes LATERAL VIEW explode; equi-join on manifest path (J1+J2).
CORRELATION = """
SELECT l.report_id                                  AS lambda_report_id,
       g.report_id                                  AS glue_report_id,
       l.manifest_path                              AS manifest_path,
       l.execution_metrics.start_time               AS lambda_start,
       g.job_info.start_time                        AS glue_start,
       g.processing_summary.records_processed       AS records_processed,
       g.processing_summary.status                  AS glue_status
FROM (
    SELECT lr.*, t.manifest_path
    FROM lambda_reports lr
    LATERAL VIEW explode(lr.manifests) t AS manifest_path
) l
JOIN glue_reports g
  ON g.processing_summary.manifest_processed = l.manifest_path
ORDER BY lambda_start DESC
"""

QUERIES: dict[str, str] = {
    "daily_summary": DAILY_SUMMARY,
    "failed_executions": FAILED_EXECUTIONS,
    "duration_stats": DURATION_STATS,
    "glue_performance": GLUE_PERFORMANCE,
    "glue_failures": GLUE_FAILURES,
    "correlation": CORRELATION,
}


def run(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(QUERIES[name])
