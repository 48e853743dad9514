"""Size-targeted, date-partitioned Parquet sink (SURVEY.md §2.1 S5).

The reference wrote `merged-parquet-{date}` dirs with a hand-rolled
``coalesce(max(records/1024/128, 1))`` that mistakes record count for KB
(glue_batch_job.py:186-191; bug documented in the reference's own
PARQUET-SIZE-AND-TIMING-ANALYSIS.md:56-74).  This sink fixes that with a
sampled-bytes estimator + ``spark.sql.files.maxRecordsPerFile`` so Spark
enforces the target per task — no driver-side coalesce that would
serialize the write through few tasks at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TARGET_FILE_MB = 128
# NDJSON→snappy-parquet compression observed 5-7x in the reference
# (PARQUET-SIZE-AND-TIMING-ANALYSIS.md:39-52); we estimate bytes from the
# JSON rendering of sampled rows and assume the mid ratio.
_ASSUMED_COMPRESSION = 6.0
_SAMPLE_ROWS = 1_000


def estimate_avg_row_bytes(df: DataFrame, sample_rows: int = _SAMPLE_ROWS) -> float:
    """Average serialized row size from a bounded sample (never full scan)."""
    sampled = (
        df.limit(sample_rows)
        .select(F.length(F.to_json(F.struct(*df.columns))).alias("sz"))
        .agg(F.avg("sz").alias("avg_sz"))
        .collect()
    )
    avg = sampled[0]["avg_sz"]
    return float(avg) if avg else 256.0


def write_date_partitioned_parquet(
    df: DataFrame,
    out_dir: str,
    date_col: str | None = None,
    target_file_mb: int = TARGET_FILE_MB,
    mode: str = "append",
) -> None:
    """Write Snappy parquet, ~target_file_mb files.

    With ``date_col`` set, uses Hive-style ``partitionBy`` so readers get
    partition pruning for free (improves on the reference's bare
    `merged-parquet-YYYY-MM-DD` dir naming, glue_batch_job.py:170-178).
    """
    avg_row = estimate_avg_row_bytes(df)
    target_bytes = target_file_mb * 1024 * 1024
    max_records = max(int(target_bytes * _ASSUMED_COMPRESSION / avg_row), 1_000)
    writer = (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("maxRecordsPerFile", max_records)
    )
    if date_col:
        writer = writer.partitionBy(date_col)
    writer.parquet(out_dir)
