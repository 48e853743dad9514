"""Incremental posting-list (BM25) index maintenance under streaming
ingest.

The 100 TB operating mode for a living corpus: documents arrive
continuously, and retrieval must see them without ever rebuilding the
index.  Each micro-batch appends its OWN postings — (term, doc_id, tf,
dl) rows bucket-partitioned by ``retrieval.term_bucket`` — plus a
one-row additive stats fragment (n_docs, sum_dl).  Nothing existing is
rewritten: an inverted index over an append-only corpus is itself
append-only, so the batch directory rename IS the commit record (the
same exactly-once shape as ``dedup_stream``'s band store; the sketch
sink needs a table swap only because sketch blobs MERGE, postings
don't).

Serving (:func:`bm25_from_stream_index`) unions the published batch
directories, prunes to the query terms' hash buckets at the scan, sums
the stats fragments (avgdl = Σ sum_dl / Σ n_docs — additive, so the
serve-time constants are exact, not approximated), and scores with the
SAME :func:`~..operators.retrieval.score_postings` core as the static
index — streamed and batch-built indexes answer identically by
construction (pinned in tests/test_streaming.py).

Assumes append-only doc ids (re-ingesting a doc would double its
postings); compose upstream exact/near-dup dedup
(``streaming/dedup_stream.py``) when the feed can repeat content.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import norm_words
from high_throughput_etl_pipeline_spark.operators.retrieval import (
    build_term_index,
    query_term_buckets,
    score_postings,
)
from high_throughput_etl_pipeline_spark.streaming import store as _store

_batch_dirs = _store.batch_dirs

POSTINGS_SCHEMA = (
    "term STRING, doc_id BIGINT, dl INT, tf BIGINT, _term_bucket INT"
)
STATS_SCHEMA = "n_docs BIGINT, sum_dl BIGINT"


def stored_postings(
    spark: SparkSession, table_path: str, buckets: list[int] | None = None
) -> DataFrame:
    """Postings across every published batch; ``buckets`` prunes the
    scan to the given ``_term_bucket`` partitions (each batch directory
    carries the same partition layout, so pruning applies per batch)."""
    dirs = [os.path.join(d, "postings") for d in _batch_dirs(table_path)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], POSTINGS_SCHEMA)
    # one scan per batch root, unioned: multi-root partition discovery
    # rejects sibling hive layouts ([CONFLICTING_DIRECTORY_STRUCTURES]),
    # and per-root scans keep true partition pruning on _term_bucket.
    # The plan grows with batch count — compact old batches into one
    # directory when the union gets wide (same discipline as any
    # log-structured store).
    out = None
    for d in dirs:
        df = spark.read.parquet(d)
        if buckets is not None:
            df = df.filter(F.col("_term_bucket").isin(buckets))
        out = df if out is None else out.unionByName(df)
    return out


def stored_index_stats(spark: SparkSession, table_path: str) -> DataFrame:
    """ONE row (_n, _avgdl) from the additive per-batch fragments."""
    dirs = [os.path.join(d, "stats") for d in _batch_dirs(table_path)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        # constants are irrelevant with zero postings; 1.0 keeps the
        # score expression finite if ever evaluated
        return spark.createDataFrame([(0.0, 1.0)], "_n DOUBLE, _avgdl DOUBLE")
    return (
        spark.read.schema(STATS_SCHEMA)
        .parquet(*dirs)
        .agg(
            F.sum("n_docs").cast("double").alias("_n"),
            (
                F.sum("sum_dl").cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("_avgdl"),
        )
    )


def merge_index_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """The foreachBatch body: build the batch's postings + stats
    fragment, publish as one ``batch_<id>`` directory via staging +
    atomic rename.  Returns False for an already-published (replayed)
    batch id — foreachBatch is at-least-once and the rename is the
    idempotency record.  The guard is MONOTONIC (not exact-dir): batch
    ids only grow within one checkpoint, and compaction folds old
    directories into the highest absorbed id, so "any published id >=
    mine" still proves this batch was absorbed even after its own
    directory is gone."""
    if _store.already_absorbed(table_path, batch_id):
        return False
    out_dir = _store.batch_dir(table_path, batch_id)
    postings, _ = build_term_index(batch, id_col, text_col)
    frag = batch.select(
        F.size(norm_words(F.col(text_col))).alias("_dl")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_dl").cast("bigint").alias("sum_dl"),
    )
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    postings.withColumnRenamed(id_col, "doc_id").write.mode(
        "overwrite"
    ).partitionBy("_term_bucket").parquet(os.path.join(staging, "postings"))
    frag.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "stats")
    )
    _store.publish(staging, out_dir)
    return True


def bm25_from_stream_index(
    spark: SparkSession,
    table_path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serve BM25 over everything ingested so far — bucket-pruned scan
    over the published batch directories, exact merged corpus constants,
    the shared scoring core."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    buckets = query_term_buckets(spark, query_terms)
    postings = stored_postings(spark, table_path, buckets)
    stats = stored_index_stats(spark, table_path)
    return score_postings(postings, stats, query_terms, k1, b, "doc_id")


def start_index_stream(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Wire a streaming docs source into the index store.

    Batch directory names are the replay markers, so the table is
    stamped with the stream identity (checkpoint-path hash): a fresh
    checkpoint restarts batch ids at 0 and would silently skip-as-
    replayed against an existing table — that mismatch fails loudly
    instead (same fencing as ``dedup_stream``)."""
    _store.stamp_stream_id(table_path, checkpoint_dir, "index")

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_index_batch(batch, batch_id, table_path, id_col, text_col)

    writer = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "merge_index_batch",
    "bm25_from_stream_index",
    "stored_postings",
    "stored_index_stats",
    "start_index_stream",
    "compact_index",
]


def compact_index(spark: SparkSession, table_path: str) -> int:
    """Fold every published batch directory into ONE, so the serve-time
    union stays narrow as batches accumulate (the log-structured-store
    discipline: appends are cheap, periodic compaction bounds read
    amplification).

    Postings rows are immutable and stats fragments additive, so
    compaction is a pure rewrite: read all batches, write a single
    ``batch_<max_id>`` replacement, then atomically swap it in and drop
    the originals.  The replacement keeps the HIGHEST compacted batch
    id, so the replay guard still no-ops every batch id the store has
    absorbed.  Single-maintainer operation (run it from the stream
    owner between triggers, like any checkpoint maintenance) — the
    stream itself never rewrites, so a crash mid-compaction leaves
    either the old directories or the completed swap, never a mix
    (the swap directory publishes before any original is removed;
    leftover originals are re-dropped on the next compaction).

    Returns the number of batch directories folded (0/1 = nothing to
    do).
    """
    dirs = _batch_dirs(table_path, heal=True)
    if len(dirs) <= 1:
        return 0
    max_id = int(os.path.basename(dirs[-1]).split("_")[1])
    postings = stored_postings(spark, table_path)
    stats = spark.read.schema(STATS_SCHEMA).parquet(
        *[os.path.join(d, "stats") for d in dirs]
    ).agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )
    out_dir = _store.next_compaction_dir(table_path, max_id)
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    postings.write.mode("overwrite").partitionBy("_term_bucket").parquet(
        os.path.join(staging, "postings")
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "stats")
    )
    # fresh-name publish (batch_<max>.c<gen>): one atomic rename, no
    # in-place swap — published paths stay immutable so a concurrent
    # serving scan can never resolve old names to new content
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
