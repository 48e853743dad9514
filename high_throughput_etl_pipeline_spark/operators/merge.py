"""MERGE-shaped upsert over a partitioned parquet table.

The generic form of what `state/tracker.py` does for its own tables: an
idempotent, partition-bounded upsert (the reference's conditional-put /
update item pair, lambda_manifest_builder.py:645-705, generalized to any
keyed table).  On plain parquet this is read-modify-overwrite of ONLY the
partitions the updates touch (dynamic partition overwrite); on a
lakehouse the same plan maps 1:1 onto ``MERGE INTO`` — the join shape is
already merge-shaped, which is the point.

Semantics (per key):
- key in updates & in target  → updated row wins (matched-update)
- key in updates only         → inserted (not-matched-insert)
- key in target only          → unchanged

Scale bound: work is O(touched partitions), never O(table).  Updates
must carry the partition column; a cross-partition key move is two
operations (delete+insert) by design, exactly like Hive/Delta dynamic
overwrite semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    schema: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_path``.

    Returns the number of rows written (upserted partitions' new
    contents).  Creates the table if absent.
    """
    import os

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    updates = updates.dropDuplicates(key_cols)
    exists = os.path.isdir(target_path) and any(
        not n.startswith((".", "_")) for n in os.listdir(target_path)
    )
    if not exists:
        out = updates.localCheckpoint(eager=True)
        (
            out.repartition(partition_col)
            .write.mode("append")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
        return out.count()

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    target = reader.parquet(target_path)
    touched = [
        r[0]
        for r in updates.select(partition_col).distinct().collect()
    ]
    # partition-pruned slice of the target; everything else is untouched
    slice_ = target.filter(F.col(partition_col).isin(touched))
    keep = slice_.join(updates.select(key_cols), on=key_cols, how="left_anti")
    merged = keep.unionByName(updates).localCheckpoint(eager=True)
    n = merged.count()
    (
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    return n
