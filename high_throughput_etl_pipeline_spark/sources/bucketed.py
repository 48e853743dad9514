"""Bucketed-table support: co-located joins without shuffles.

At 100 TB the recurring join (orders ⋈ lineitem on orderkey, state ⋈
claims on file_key) dominates cost if each run reshuffles both sides.
Hive-style bucketing pre-partitions data by key at WRITE time; joins and
aggregations on the bucket key then skip the exchange entirely — the
scan itself is the shuffle.

The reference had no analog (DynamoDB key-partitioning served the same
role for its state lookups); for the Spark engine this is the standard
answer to "is there a shuffle here that becomes the bottleneck at
scale?" for every *repeated* join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally removes the sort phase of a
    sort-merge join on the same key.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
