"""File validation + quarantine routing (SURVEY.md §2.2 P3/P4, §2.1 S8).

The reference validates each S3 object in Lambda: extension must be
`.ndjson`, size within expected±tolerance%, else copy to quarantine with a
reason (lambda_manifest_builder.py:542-593).  Here validation is a single
DataFrame projection over a file-listing DataFrame — one pass, fully
parallel, no per-file control flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.functions.scalar import (
    extract_date_prefix,
    file_name_of,
)

EXPECTED_FILE_SIZE_MB = 3.5
SIZE_TOLERANCE_PERCENT = 50.0


def validate_files(
    files: DataFrame,
    path_col: str = "file_path",
    size_mb_col: str = "file_size_mb",
    expected_size_mb: float = EXPECTED_FILE_SIZE_MB,
    tolerance_percent: float = SIZE_TOLERANCE_PERCENT,
) -> DataFrame:
    """Annotate a file listing with validity, reason, and date_prefix.

    Output adds: ``is_valid`` bool, ``quarantine_reason`` (null when valid),
    ``date_prefix``, ``file_name``.  Callers route ``is_valid == false`` to
    the quarantine sink and the rest into tracking — a filtered write, the
    Spark analog of the reference's copy-to-quarantine-bucket.
    """
    lo = expected_size_mb * (1 - tolerance_percent / 100.0)
    hi = expected_size_mb * (1 + tolerance_percent / 100.0)
    path, size = F.col(path_col), F.col(size_mb_col)
    bad_ext = ~path.endswith(".ndjson")  # P3: builder.py:548-550
    bad_size = ~size.between(lo, hi)  # P4: builder.py:552-560
    reason = (
        F.when(bad_ext, F.lit("invalid_extension"))
        .when(bad_size, F.format_string(
            "size_out_of_range[%.2f,%.2f]", F.lit(lo), F.lit(hi)))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        files.withColumn("quarantine_reason", reason)
        .withColumn("is_valid", F.col("quarantine_reason").isNull())
        .withColumn("date_prefix", extract_date_prefix(path))
        .withColumn("file_name", file_name_of(path))
    )


def quarantine(files_validated: DataFrame) -> DataFrame:
    """The invalid branch with reason metadata (builder.py:570-593)."""
    return files_validated.filter(~F.col("is_valid"))


def valid_files(files_validated: DataFrame) -> DataFrame:
    return files_validated.filter(F.col("is_valid"))
