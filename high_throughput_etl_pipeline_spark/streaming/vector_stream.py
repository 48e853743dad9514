"""Incremental IVF vector-index maintenance under streaming ingest.

ANN over a LIVING embedding corpus: new vectors arrive continuously and
must become searchable without rebuilding the index.  The coarse
quantizer (centroid set) is FIXED at stream start — the standard
operating mode for production IVF (FAISS et al.): train/derive
centroids once on a sample, then assignment of a new vector is a pure
map (nearest centroid), so each micro-batch appends its own
``list_id``-partitioned assignment rows and nothing existing is ever
rewritten.  Re-training centroids is a REBUILD, by design — it changes
every assignment, so it cannot be incremental; do it offline and swap
tables.

Storage discipline is ``streaming/store.py``: batch-directory commits,
monotonic replay guard, stream-id fencing, recoverable compaction.
Serving unions the published batch directories, prunes each scan to the
probed ``list_id`` partitions (the same "the equi-join IS the pruning"
shape as the static ``ivf_topk_indexed``), and ranks with the shared
``_ivf_rank`` core — streamed and batch-built indexes answer
identically by construction (pinned in tests/test_streaming.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.similarity import (
    _ivf_assign,
    _ivf_rank,
    _maxsim_rerank,
)
from high_throughput_etl_pipeline_spark.streaming import store as _store

VECTOR_SCHEMA = (
    "vec_id BIGINT, embedding ARRAY<FLOAT>, list_id INT"
)


def stored_vectors(
    spark: SparkSession,
    table_path: str,
    list_ids: list[int] | None = None,
) -> DataFrame:
    """Assigned vectors across every published batch; ``list_ids``
    prunes each per-batch scan to the probed partitions."""
    dirs = [
        os.path.join(d, "vectors") for d in _store.batch_dirs(table_path)
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], VECTOR_SCHEMA)
    out = None
    for d in dirs:
        df = spark.read.parquet(d)
        if list_ids is not None:
            df = df.filter(F.col("list_id").isin(list_ids))
        out = df if out is None else out.unionByName(df)
    return out


def merge_vector_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    centers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """The foreachBatch body: assign the batch's vectors to their
    nearest (fixed) centroid, publish as one ``list_id``-partitioned
    batch directory.  Monotonic replay guard, rename commit."""
    if _store.already_absorbed(table_path, batch_id):
        return False
    out_dir = _store.batch_dir(table_path, batch_id)
    assigned = _ivf_assign(batch, centers, id_col, vec_col, 1).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        "list_id",
    )
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(staging, "vectors")
    )
    _store.publish(staging, out_dir)
    return True


def ivf_topk_stream_index(
    spark: SparkSession,
    table_path: str,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    with_list_id: bool = False,
) -> DataFrame:
    """Serve IVF top-k over everything ingested so far.  The probed
    list ids collect to a literal IN-filter (metadata-scale) applied to
    every batch scan, so only nprobe/nlist of each batch is read;
    scoring and ranking are the same helpers as the in-memory and
    static-index paths — all three answer identically."""
    q_probes = _ivf_assign(
        queries, centers, query_id_col, vec_col, nprobe
    ).select(query_id_col, F.col(vec_col).alias("_qvec"), "list_id")
    probe_ids = sorted(
        r["list_id"]
        for r in q_probes.select("list_id").distinct().collect()
    )
    index = stored_vectors(spark, table_path, probe_ids)
    return _ivf_rank(
        index, q_probes, k, "vec_id", "embedding", query_id_col,
        with_list_id,
    )


def maxsim_stream_index(
    spark: SparkSession,
    table_path: str,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    dim: int = 64,
    nprobe: int = 4,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage MaxSim served from the STREAMING-maintained IVF store:
    probe ids prune the per-batch scans (same pruning as
    ``ivf_topk_stream_index``), then the exact late-interaction re-rank
    scores only what was read — the ColBERT serving shape over an index
    that grows by micro-batch.  Identical results to
    ``similarity.maxsim_ann_topk`` over the ingested union (same
    helpers; pinned in tests)."""
    q_probes = _ivf_assign(
        queries, centers, query_id_col, "embedding", nprobe
    ).select(query_id_col, "embedding", "list_id")
    probe_ids = sorted(
        r["list_id"]
        for r in q_probes.select("list_id").distinct().collect()
    )
    index = stored_vectors(spark, table_path, probe_ids)
    return _maxsim_rerank(
        index, q_probes, k, n_sub, dim, "vec_id", "embedding", query_id_col
    )


def compact_vectors(spark: SparkSession, table_path: str) -> int:
    """Fold every published batch into one (keeping the highest
    absorbed id) — same recoverable swap as the posting-list store."""
    dirs = _store.batch_dirs(table_path, heal=True)
    if len(dirs) <= 1:
        return 0
    max_id = _store.max_batch_id(table_path)
    vectors = stored_vectors(spark, table_path)
    out_dir = _store.next_compaction_dir(table_path, max_id)
    staging = out_dir + "._staging"
    shutil.rmtree(staging, ignore_errors=True)
    vectors.write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(staging, "vectors")
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


def start_vector_stream(
    vectors: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    centers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Wire a streaming vector source into the IVF store."""
    _store.stamp_stream_id(table_path, checkpoint_dir, "vector-index")

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_vector_batch(
            batch, batch_id, table_path, centers, id_col, vec_col
        )

    writer = (
        vectors.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "merge_vector_batch",
    "ivf_topk_stream_index",
    "maxsim_stream_index",
    "stored_vectors",
    "compact_vectors",
    "start_vector_stream",
]
