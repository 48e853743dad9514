"""Streaming CDC table maintenance: a change-log store whose serving
view is always the latest-op-wins snapshot (ST4/ST6/ST8 × the
``operators/cdc.py`` family).

The streaming half of CDC application.  The batch operator
(``apply_cdc``) folds a complete log into a snapshot; here the log
ARRIVES as micro-batches (Debezium/DMS topic, binlog tail) and the
table must stay serveable between batches without rewriting O(table)
per batch.  The answer is the lakehouse answer (Delta/Hudi MOR,
Kafka compacted topics), expressed on the shared log-structured store
(``streaming/store.py``):

- each micro-batch pre-collapses ITS OWN rows per key (cheap window),
  stamps them with the batch id, and appends ONE ``batch_<id>``
  directory — rename commit, monotonic replay guard, stream fencing,
  all inherited;
- the serving view collapses across directories on read.  Default
  change order is ``(_cdc_batch, seq)``: micro-batch ARRIVAL order is
  authoritative across batches (a Structured Streaming source delivers
  a key's changes in order and batch ids strictly increase; replay of
  a whole batch is fenced by the monotonic guard), and ``seq`` orders
  within a batch — this is exactly folding each batch through
  ``apply_cdc`` in sequence.  If ``seq`` is a GLOBAL LSN and
  out-of-order redelivery can cross batch boundaries (topic backfill,
  a re-emitted foreign log copy), pass ``global_seq=True`` to make the
  source sequence the authority — ``(seq, _cdc_batch)`` — so a late
  arrival of an old change never overrides a newer one;
- compaction folds the directories into one pre-collapsed directory,
  KEEPING tombstones (a delete must keep shadowing re-inserts of
  absorbed batches) — read cost returns to one window over one
  directory of live+dead keys.

Write amplification per batch is O(batch), not O(table); the full
collapse happens on read/compaction, the classic merge-on-read trade.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.cdc import cdc_latest
from high_throughput_etl_pipeline_spark.streaming import store as _store

BATCH_COL = "_cdc_batch"


def merge_cdc_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> bool:
    """The foreachBatch body: collapse the batch per key (latest seq
    wins — flip-flops never hit disk), stamp the batch id, publish as
    one directory.  Monotonic replay guard, rename commit."""
    if _store.already_absorbed(table_path, batch_id):
        return False
    out_dir = _store.batch_dir(table_path, batch_id)
    collapsed = cdc_latest(batch, key_cols, seq_col, op_col).withColumn(
        BATCH_COL, F.lit(batch_id).cast("bigint")
    )
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    collapsed.write.mode("overwrite").parquet(staging)
    _store.publish(staging, out_dir)
    return True


def stored_changes(spark: SparkSession, table_path: str) -> DataFrame:
    """The collapsed change rows of every published batch (with
    ``_cdc_batch``); empty store raises — callers guard with
    ``store.max_batch_id``."""
    dirs = _store.batch_dirs(table_path)
    if not dirs:
        raise FileNotFoundError(f"empty CDC store: {table_path}")
    return spark.read.parquet(*dirs)


def _change_order(
    seq_col: str, op_col: str, global_seq: bool
) -> list:
    """Arrival-authoritative (default) vs source-sequence-authoritative
    change ordering — see the module docstring for when each is right."""
    if global_seq:
        return [
            F.col(seq_col).desc(),
            F.col(BATCH_COL).desc(),
            F.col(op_col).desc(),
        ]
    return [
        F.col(BATCH_COL).desc(),
        F.col(seq_col).desc(),
        F.col(op_col).desc(),
    ]


def cdc_snapshot(
    spark: SparkSession,
    table_path: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    global_seq: bool = False,
) -> DataFrame:
    """Latest-op-wins serving view over everything ingested so far:
    one window per key over the change order (see module docstring and
    ``global_seq``), tombstones filtered.  Returns the change schema
    minus the bookkeeping columns.  With the default arrival order this
    is identical to folding each batch through
    ``operators.cdc.apply_cdc`` in sequence (pinned by tests); with
    ``global_seq=True`` the source sequence wins across batches, which
    sequential folding cannot express."""
    log = stored_changes(spark, table_path)
    w = Window.partitionBy(*key_cols).orderBy(
        *_change_order(seq_col, op_col, global_seq)
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn", BATCH_COL, seq_col, op_col)
    )


def compact_cdc_store(
    spark: SparkSession,
    table_path: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    global_seq: bool = False,
) -> int:
    """Fold every published directory into one holding the cross-batch
    collapsed log — INCLUDING tombstones, which must survive to keep
    shadowing the keys they deleted (dropping them would resurrect a
    row if an absorbed I re-appeared via replay of a foreign log copy;
    they also document the delete for downstream consumers).  Same
    recoverable swap + absorbed-through marker as every other store."""
    dirs = _store.batch_dirs(table_path, heal=True)
    if len(dirs) <= 1:
        return 0
    max_id = _store.max_batch_id(table_path)
    log = spark.read.parquet(*dirs)
    w = Window.partitionBy(*key_cols).orderBy(
        *_change_order(seq_col, op_col, global_seq)
    )
    collapsed = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out_dir = _store.next_compaction_dir(table_path, max_id)
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    collapsed.write.mode("overwrite").parquet(staging)
    _store.write_absorbed_marker(staging, max_id)
    _store.publish(staging, out_dir)
    # absorbed originals are NOT deleted here: the marker inside the
    # swapped directory already hides them from every new read, and an
    # in-flight serving scan may still hold references to their paths —
    # immediate rmtree is exactly the serve-while-compacting race the
    # concurrency test pins.  They are retained until the NEXT
    # maintainer operation (batch_dirs(heal=True) at the top of this
    # function / the writer), the same retention discipline as Delta
    # VACUUM: a read only has to survive the compaction running WHILE
    # it scans, never the one after it finishes.
    return len(dirs)


def start_cdc_stream(
    changes: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
):
    """Wire a streaming change-log source into the CDC store."""
    _store.stamp_stream_id(table_path, checkpoint_dir, "cdc")

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_cdc_batch(
            batch, batch_id, table_path, key_cols, seq_col, op_col
        )

    writer = (
        changes.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "merge_cdc_batch",
    "stored_changes",
    "cdc_snapshot",
    "compact_cdc_store",
    "start_cdc_stream",
]
