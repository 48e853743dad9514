"""Streaming-native dedup (SURVEY.md §2.6 ST6, the stream form).

The batch engine dedups via keyed anti-join against the state table
(`state/tracker.py:track_files`); the streaming-native form keeps the
seen-key set INSIDE the engine's state store and bounds it with a
watermark — the direct analog of the reference's conditional-put guard
(``attribute_not_exists``, lambda_manifest_builder.py:645-653) without an
external store round-trip per event.

State-size note for 100 TB streams: the watermark is what makes this
viable — without it the seen-key set grows forever.  State is partitioned
by key hash across executors and evicted once the event-time watermark
passes, so memory is bounded by (keys per watermark window), not total
stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def deduped_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events BY KEY within the watermark horizon.

    True by-key dedup: re-delivered events with the same key but a
    different event time (retry after a delay, clock-skewed producers)
    still collapse to one row — ``dropDuplicatesWithinWatermark`` keys
    state on ``key_cols`` alone and uses the event time only for state
    eviction, unlike ``dropDuplicates([*keys, ts])`` which silently keeps
    same-key/different-ts events.

    Works on streaming AND batch frames (batch has no state to bound, so
    it is plain by-key dropDuplicates — the engine's batch/streaming
    symmetry, so a backfill can run the same plan as the live stream).

    Duplicates ARRIVING later than the watermark are not deduplicated
    (their state was evicted) — the at-least-once tail every bounded-state
    dedup has; downstream idempotent sinks absorb it.
    """
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark_delay
        ).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


# ---------------------------------------------------------------------------
# Streaming NEAR-duplicate dedup — incremental corpus ingest (ST6/ST8 x the
# MinHash family).
#
# The 100 TB operating mode for corpus growth: documents arrive
# continuously, and each micro-batch must answer "is this new doc a
# near-dup of ANYTHING already accepted?" without rescanning the corpus.
# The state kept between batches is the banded MinHash index
# (operators.dedup.minhash_band_index rows — KBs per doc, written once): a
# batch probes the store with a (band_id, band_hash) equi-join, estimates
# Jaccard by signature agreement on the candidates, and appends only its
# surviving (kept) docs' index rows.  Matching is therefore incremental
# LSH, the same candidate discipline as the batch operators — never
# all-pairs, never a rescan.
#
# Exactly-once shape: each batch publishes its decisions AND its accepted
# index rows as ONE batch_<id> directory via staging + atomic rename.
# foreachBatch is at-least-once; a replayed batch id finds its directory
# already published and no-ops — the rename IS the commit record (unlike
# the sketch sink, this store is append-only, so no table swap is needed).
#
# Within a batch, dup chains are closed transitively (dedup_clusters over
# the batch's candidate pairs — batch-sized graphs, a few CC rounds);
# across batches, the store always wins: a batch doc matching a stored doc
# is a dup of the STORED doc (first-accepted-wins, the only stable policy
# when history is immutable).  Docs too short to shingle are accepted
# verbatim (no index rows) — exact dedup composes upstream
# (operators.dedup.dedup_exact).
# ---------------------------------------------------------------------------



import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import (
    minhash_band_index,
)
from high_throughput_etl_pipeline_spark.operators.graph import dedup_clusters
from high_throughput_etl_pipeline_spark.streaming import store as _store

BAND_SCHEMA = (
    "doc_id BIGINT, band_id INT, band_hash STRING, sig ARRAY<BIGINT>"
)
DECISION_SCHEMA = "doc_id BIGINT, dup_of BIGINT, est_jaccard DOUBLE"


_batch_dirs = _store.batch_dirs


def stored_band_index(spark: SparkSession, table_path: str) -> DataFrame:
    """All accepted docs' index rows across every published batch."""
    dirs = [os.path.join(d, "bands") for d in _batch_dirs(table_path)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], BAND_SCHEMA)
    return spark.read.schema(BAND_SCHEMA).parquet(*dirs)


def dedup_decisions(spark: SparkSession, table_path: str) -> DataFrame:
    """(doc_id, dup_of, est_jaccard) for every doc ever processed;
    ``dup_of`` NULL = accepted."""
    dirs = [os.path.join(d, "decisions") for d in _batch_dirs(table_path)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], DECISION_SCHEMA)
    return spark.read.schema(DECISION_SCHEMA).parquet(*dirs)


def _est_jaccard(sig_a, sig_b) -> F.Column:
    """Signature agreement rate — the standard MinHash Jaccard estimate."""
    agree = F.aggregate(
        F.zip_with(
            sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(agree / F.size(sig_a), 4)


def merge_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> bool:
    """The foreachBatch body.  Returns False for an already-published
    (replayed) batch id."""
    if _store.already_absorbed(table_path, batch_id):
        # at-least-once replay: a published id >= ours proves absorption
        # (monotonic — survives compaction folding old dirs into one)
        return False
    out_dir = _store.batch_dir(table_path, batch_id)
    spark = batch.sparkSession

    idx = minhash_band_index(
        batch, id_col, text_col, num_hashes, bands, shingle_n
    ).withColumnRenamed(id_col, "doc_id")
    idx = idx.localCheckpoint(eager=True)  # reused 4x below; cut the lineage
    stored = stored_band_index(spark, table_path)

    # 1) batch vs STORE: first-accepted-wins — dup_of = best stored match
    vs_store = (
        idx.select("doc_id", "band_id", "band_hash", "sig")
        .join(
            stored.select(
                F.col("doc_id").alias("dup_of"),
                "band_id",
                "band_hash",
                F.col("sig").alias("sig_s"),
            ),
            on=["band_id", "band_hash"],
        )
        .select(
            "doc_id", "dup_of", _est_jaccard("sig", "sig_s").alias("est")
        )
        .filter(F.col("est") >= threshold)
        .groupBy("doc_id")
        .agg(
            F.min_by("dup_of", F.struct(F.negate("est"), "dup_of")).alias(
                "dup_of"
            ),
            F.max("est").alias("est_jaccard"),
        )
    )
    store_dups = vs_store.localCheckpoint(eager=True)

    # 2) batch vs batch among NOT-store-dup docs: candidate pairs from
    # band collisions, transitively clustered so chains resolve to one
    # canonical (min-id) doc per group
    fresh = idx.join(store_dups.select("doc_id"), on="doc_id", how="left_anti")
    a = fresh.select(
        "band_id", "band_hash", F.col("doc_id").alias("id_a"),
        F.col("sig").alias("sig_a"),
    )
    b = fresh.select(
        "band_id", "band_hash", F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sig_b"),
    )
    batch_pairs = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("est", _est_jaccard("sig_a", "sig_b"))
        .filter(F.col("est") >= threshold)
        .select("id_a", "id_b", "est")
    )
    batch_pairs = batch_pairs.localCheckpoint(eager=True)
    cc = dedup_clusters(batch_pairs)
    batch_dups = (
        cc.filter(F.col("node") != F.col("cluster_id"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("cluster_id").alias("dup_of"),
        )
        .join(
            batch_pairs.select(
                F.col("id_b").alias("doc_id"), "est"
            ).groupBy("doc_id").agg(F.max("est").alias("est_jaccard")),
            on="doc_id",
            how="left",
        )
    )

    all_docs = batch.select(F.col(id_col).cast("long").alias("doc_id"))
    decisions = (
        all_docs.join(
            store_dups.unionByName(batch_dups), on="doc_id", how="left"
        )
        .select("doc_id", "dup_of", "est_jaccard")
    )
    kept_idx = idx.join(
        decisions.filter(F.col("dup_of").isNotNull()).select("doc_id"),
        on="doc_id",
        how="left_anti",
    )

    # 3) atomic publish: decisions + accepted index rows staged together,
    # ONE rename commits both (and records the batch as merged)
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    decisions.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "decisions")
    )
    kept_idx.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "bands")
    )
    _store.publish(staging, out_dir)
    return True


def start_dedup_stream(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    available_now: bool = False,
):
    """Maintain an incremental near-dup index from a streaming document
    frame; every doc gets a durable accept/dup decision."""
    _store.stamp_stream_id(table_path, checkpoint_dir, "dedup")

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_dedup_batch(
            batch, batch_id, table_path, id_col, text_col,
            num_hashes, bands, shingle_n, threshold,
        )

    writer = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_dedup_store(spark: SparkSession, table_path: str) -> int:
    """Fold every published batch directory into one (highest absorbed
    id), preserving BOTH halves of the store — the full decision
    history and the accepted docs' band index.  Both are append-only
    unions, so compaction is a pure rewrite; replay stays idempotent
    through the monotonic guard.  Same recoverable swap as the
    posting-list / vector stores."""
    dirs = _batch_dirs(table_path, heal=True)
    if len(dirs) <= 1:
        return 0
    max_id = _store.max_batch_id(table_path)
    bands = stored_band_index(spark, table_path)
    decisions = dedup_decisions(spark, table_path)
    out_dir = _store.next_compaction_dir(table_path, max_id)
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    bands.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "bands")
    )
    decisions.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staging, "decisions")
    )
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
