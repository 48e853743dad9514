"""Incremental stored-sketch maintenance over a stream (ST6/ST8 × the
sketch family).

The 100 TB operating mode for approximate distincts is: every
micro-batch sketches its own rows (KB per partition key), and the stored
per-day sketch is the UNION of the stored blob with the batch blob —
a read-modify-write of KBs, never a rescan of history.  Any later
date-range question unions the stored blobs in milliseconds.

Exactly-once shape: the merge into the state table runs inside
``foreachBatch`` keyed by (date); replaying an uncommitted batch
re-merges the same rows into the same day.  HLL union is NOT idempotent
under replay in general — re-unioning the same batch blob IS (union is
idempotent for identical sketches: max-register semantics), which is
what makes this sink safe under foreachBatch's at-least-once contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.sketches import LG_CONFIG_K

SKETCH_SCHEMA = "date STRING, sketch BINARY, n_rows BIGINT"


def _recover_table(table_path: str) -> None:
    """Heal the one crash window the two-rename publish leaves open: a
    death between ``rename(table, ._old)`` and ``rename(._staging,
    table)`` leaves no table but a complete ``._old`` — without this,
    the next merge would find neither table nor marker and silently
    rebuild from the current batch alone, losing all accumulated
    history.  ``._old`` is always a complete previous version (it only
    ever exists post-rename), so restoring it is safe; a leftover
    ``._staging`` is possibly partial and is discarded (its batch was
    never recorded as merged, so it will be re-merged)."""
    old = table_path + "._old"
    if os.path.isdir(old):
        if not os.path.isdir(table_path):
            os.rename(old, table_path)
        else:
            # crash after the publish rename but before cleanup: the
            # table is current, ._old is just debris
            import shutil

            shutil.rmtree(old, ignore_errors=True)
    staging = table_path + "._staging"
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging, ignore_errors=True)


def _read_marker(table_path: str) -> tuple[str | None, int]:
    """(stream_id, batch_id) from the replay marker; legacy bare-int
    markers (no stream id) return stream_id=None."""
    try:
        with open(os.path.join(table_path, "_last_batch_id")) as f:
            raw = f.read().strip()
    except OSError:
        return None, -1
    parts = raw.split()
    try:
        if len(parts) == 2:
            return parts[0], int(parts[1])
        return None, int(parts[0])
    except ValueError:
        return None, -1


def _merge_day_sketches(
    spark: SparkSession,
    table_path: str,
    batch_daily: DataFrame,
    batch_id: int,
    stream_id: str | None = None,
) -> None:
    """Union the batch's per-day sketches into the stored table.

    Full-read + union + overwrite of a KB-per-day table — metadata-scale
    IO regardless of stream volume.  The merged batch id travels INSIDE
    the staged directory (parquet readers ignore ``_``-prefixed files),
    so the atomic rename publishes data + replay marker together: a
    crash between writes can never record a batch as merged without its
    rows, or vice versa.  (On a lakehouse this is a MERGE on ``date``
    with the batch id in the commit metadata.)
    """
    if os.path.isdir(table_path):
        stored = spark.read.schema(SKETCH_SCHEMA).parquet(table_path)
        merged = (
            stored.unionByName(batch_daily)
            .groupBy("date")
            .agg(
                F.expr("hll_union_agg(sketch)").alias("sketch"),
                F.sum("n_rows").alias("n_rows"),
            )
        )
    else:
        merged = batch_daily
    tmp = table_path + "._staging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    marker = f"{stream_id} {batch_id}" if stream_id else str(batch_id)
    with open(os.path.join(tmp, "_last_batch_id"), "w") as f:
        f.write(marker)
    swap = table_path + "._old"
    if os.path.isdir(table_path):
        os.rename(table_path, swap)
    os.rename(tmp, table_path)
    if os.path.isdir(swap):
        import shutil

        shutil.rmtree(swap, ignore_errors=True)


def merge_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    stream_id: str | None = None,
) -> bool:
    """The foreachBatch body: sketch the batch per day and union into
    the stored table.  Returns False (no-op) for a replayed batch id —
    foreachBatch is at-least-once, and while the sketch union alone is
    replay-idempotent, the n_rows recount is not.

    The replay marker records WHICH stream wrote it (``stream_id``,
    derived from the checkpoint location): Structured Streaming batch
    ids restart at 0 with a fresh checkpoint, so a bare ``>= batch_id``
    guard against a marker from a previous checkpoint would silently
    drop every new batch until the new ids grow past the stored one.  A
    marker from a DIFFERENT stream is a table/checkpoint mismatch and
    raises: merging a fresh checkpoint's replayed history would
    double-count.  Reset procedure — delete the sketch table together
    with the checkpoint (full rebuild), or keep both as-is to resume the
    original checkpoint.
    """
    _recover_table(table_path)
    marker_stream, marker_batch = _read_marker(table_path)
    if marker_stream is not None and stream_id is not None:
        if marker_stream != stream_id:
            raise RuntimeError(
                f"sketch table {table_path} was written by stream "
                f"{marker_stream!r} but this stream is {stream_id!r} "
                "(fresh/relocated checkpoint?). Delete the table with "
                "the checkpoint to rebuild, or restore the original "
                "checkpoint."
            )
        if marker_batch >= batch_id:
            return False
    elif marker_batch >= batch_id:
        # legacy marker (no stream id) or no stream identity supplied:
        # fall back to the plain monotonic guard
        return False
    daily = batch.groupBy(
        F.to_date(ts_col).cast("string").alias("date")
    ).agg(
        F.hll_sketch_agg(key_col, F.lit(LG_CONFIG_K)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )
    _merge_day_sketches(
        batch.sparkSession, table_path, daily, batch_id, stream_id
    )
    return True


def start_sketch_stream(
    events: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = False,
):
    """Maintain per-day HLL distinct-key sketches from a streaming frame.

    Each micro-batch aggregates to (date, sketch, n_rows) — a handful of
    rows — then merges into the stored table.  Restart from the same
    checkpoint must not double-count: foreachBatch is at-least-once, so
    a replayed batch id is detected via the marker published atomically
    with the data and skipped (the sketch union alone would be
    idempotent; the n_rows recount would not be).
    """

    import hashlib

    stream_id = hashlib.sha1(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_batch(batch, batch_id, table_path, key_col, ts_col, stream_id)

    writer = (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stored_distinct_estimates(
    spark: SparkSession, table_path: str
) -> DataFrame:
    """Answer distinct-per-day and total from the STORED sketches alone:
    (date, approx_keys, n_rows) plus an ALL row unioned from the blobs."""
    _recover_table(table_path)
    t = spark.read.schema(SKETCH_SCHEMA).parquet(table_path)
    per_day = t.select(
        "date",
        F.hll_sketch_estimate("sketch").alias("approx_keys"),
        "n_rows",
    )
    total = t.agg(
        F.hll_sketch_estimate(F.expr("hll_union_agg(sketch)")).alias(
            "approx_keys"
        ),
        F.sum("n_rows").alias("n_rows"),
    ).select(F.lit("ALL").alias("date"), "approx_keys", "n_rows")
    return per_day.unionByName(total)
