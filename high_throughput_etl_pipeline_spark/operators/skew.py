"""Skew mitigation: salted joins and salted aggregation.

The reference spreads hot DynamoDB partitions with an md5 write-shard
(`status#shard`, lambda_manifest_builder.py:97-103; design note
DEVELOPER_GUIDE.md:368-374).  The Spark analog at 100 TB: a skewed join
key (one user with 1B events) serializes a whole task.  AQE's skew-join
handles sort-merge cases; these helpers cover the explicit-salt pattern
for aggregations and broadcast-averse joins, with the same md5-family
determinism as the reference's shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt 0..n_salts-1 per row (for the skewed side)."""
    return df.withColumn(
        salt_col, (F.rand(seed=42) * n_salts).cast("int")
    )


def explode_salts(
    df: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate the small side once per salt (for the other side)."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``skewed`` has hot keys: salt the skewed side, replicate
    ``other`` n_salts times, join on keys+salt.  Each hot key now spreads
    over n_salts tasks; the replication cost is n_salts × |other|, so use
    only when ``other`` is too big to broadcast but much smaller than the
    skewed side.
    """
    a = with_salt(skewed, n_salts)
    b = explode_salts(other, n_salts)
    return a.join(b, on=[*on, "_salt"], how=how).drop("_salt")


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per
    (key, salt), then final sum per key.  Map-side combine already does
    this for count/sum; the explicit form matters for aggregates without
    partial pushdown (e.g. collect_list-style) — shown here with count
    as the canonical shape.
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_partial").cast("bigint").alias("count")
    )
