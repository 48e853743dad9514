"""Scalar/projection functions — the engine's expression surface.

Re-expresses the reference's driver-side Python helpers (SURVEY.md §2.2,
P1–P17) as pure Spark Column expressions so they run JVM-side inside
whole-stage codegen — zero Python UDFs (100 TB rule; the reference computed
these per-file in Lambda, citations below are to /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DATE_RE = r"(\d{4}-\d{2}-\d{2})"
NUM_STATUS_SHARDS = 10


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """P1 — the core storage semantic: every column cast to string.

    Parity: glue_batch_job.py:161-168 ("Cast all NDJSON record values into
    string", metrics.txt:32).  Canonical form for complex types is their
    JSON rendering via ``to_json`` (deterministic, unlike Spark's default
    struct→string cast); primitives use plain CAST.
    """
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            cols.append(F.to_json(c).alias(f.name))
        else:
            cols.append(c.cast("string").alias(f.name))
    return df.select(cols)


def with_metadata_columns(df: DataFrame) -> DataFrame:
    """P2 — inject `_processing_timestamp` and `_source_file`.

    Parity: glue_batch_job.py:152-153.
    """
    return df.withColumn("_processing_timestamp", F.current_timestamp()).withColumn(
        "_source_file", F.input_file_name()
    )


def extract_date_prefix(col: Column, fallback_today: bool = True) -> Column:
    """P5 — first YYYY-MM-DD in a file key; fallback today (UTC).

    Parity: lambda_manifest_builder.py:596-618.
    """
    extracted = F.regexp_extract(col, DATE_RE, 1)
    if not fallback_today:
        return extracted
    return F.when(extracted != "", extracted).otherwise(
        F.date_format(F.current_date(), "yyyy-MM-dd")
    )


def parse_s3_path(col: Column) -> tuple[Column, Column]:
    """P6 — s3://bucket/key → (bucket, key). glue_batch_job.py:211-215."""
    stripped = F.regexp_replace(col, r"^s3a?://", "")
    bucket = F.substring_index(stripped, "/", 1)
    key = F.regexp_replace(stripped, r"^[^/]+/", "")
    return bucket, key


def file_name_of(col: Column) -> Column:
    """P6 — last '/' segment. lambda_manifest_builder.py:996-1004."""
    return F.element_at(F.split(col, "/"), -1)


def md5_shard(col: Column, num_shards: int = NUM_STATUS_SHARDS) -> Column:
    """P8 — deterministic shard id from a filename.

    The reference used ``int(md5(name),16) % N`` (lambda_manifest_builder
    .py:97-103) to spread DynamoDB GSI writes.  We keep the md5 family but
    take the low 60 bits (15 hex chars) so it fits a BIGINT on any engine;
    distribution is equally uniform and the value is portable SQL
    (``conv(substr(md5(x),18,15),16,10) % N``).
    """
    low60 = F.conv(F.substring(F.md5(col), 18, 15), 16, 10).cast("bigint")
    return F.pmod(low60, F.lit(num_shards))


def status_with_shard(status: Column | str, shard: Column) -> Column:
    """P7 — build `pending#3` style sharded status. builder.py:97-121."""
    s = F.lit(status) if isinstance(status, str) else status
    return F.concat_ws("#", s, shard.cast("string"))


def split_status(col: Column) -> tuple[Column, Column]:
    """P7 inverse — `pending#3` → ('pending', 3); legacy unsharded → shard -1.

    Parity: lambda_batch_status_updater.py:162-204 (preserve-shard rewrite).
    """
    base = F.substring_index(col, "#", 1)
    shard = F.when(
        col.contains("#"), F.substring_index(col, "#", -1).cast("int")
    ).otherwise(F.lit(-1))
    return base, shard


def bytes_to_mb(col: Column) -> Column:
    """P9 — metrics_collector_lambda.py:52."""
    return (col / F.lit(1024.0 * 1024.0)).cast("double")


def bytes_to_gb(col: Column) -> Column:
    """P9 — metrics_collector_lambda.py:53."""
    return (col / F.lit(1024.0 * 1024.0 * 1024.0)).cast("double")


def date_components(ts: Column) -> dict[str, Column]:
    """P10/P11 — the metrics row's derived time columns.

    Parity: metrics_collector_lambda.py:47-49, 67-71 (date_hour partition
    key `%Y-%m-%d-%H`, plus y/m/d/h/min ints).
    """
    return {
        "date_hour": F.date_format(ts, "yyyy-MM-dd-HH"),
        "year": F.year(ts),
        "month": F.month(ts),
        "day": F.dayofmonth(ts),
        "hour": F.hour(ts),
        "minute": F.minute(ts),
    }


def ttl_epoch(days: int) -> Column:
    """P14 — now + days*86400 epoch seconds. builder.py:626,677."""
    return (F.unix_timestamp() + F.lit(days * 86400)).cast("long")


def derive_status(errors_count: Column, processed_count: Column) -> Column:
    """P17 — success / partial_success / failed. builder.py:316."""
    return (
        F.when(errors_count == 0, F.lit("success"))
        .when(processed_count > 0, F.lit("partial_success"))
        .otherwise(F.lit("failed"))
    )
