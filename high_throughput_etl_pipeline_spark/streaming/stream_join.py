"""Stream-stream interval join (SURVEY.md §2.6 extension).

The reference joins only within a batch job (its streams are file
queues); real-time attribution — purchase events joined to the click
that preceded them — needs a STREAM-STREAM join, which Spark supports
natively when both sides carry watermarks and the join condition bounds
event time (the state store keeps each side only until the other side's
watermark passes the interval bound).

State sizing at scale: each side buffers rows for
``watermark_delay + max_span`` of event time, keyed by join key across
executors — bounded by arrival rate × horizon, never stream history.
Without the time-interval condition Spark would have to keep BOTH sides
forever (and refuses the plan for append mode); the interval is what
makes the join streamable.

The same function runs on batch frames (watermarks are a no-op there),
so a backfill reuses the live plan — the engine's batch/streaming
symmetry, tested as stream ≡ batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_span: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Inner-join right rows to left rows with the same key where
    ``left.ts <= right.ts <= left.ts + max_span``.

    Columns are prefixed ``l_`` / ``r_`` in the output (stream-stream
    joins need disjoint names; the prefixes also make provenance
    explicit downstream).  Watermarks are attached only to streaming
    inputs — a batch frame runs the identical plan un-watermarked.
    """
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    if left.isStreaming:
        l = l.withWatermark(f"l_{ts_col}", watermark_delay)
    if right.isStreaming:
        r = r.withWatermark(f"r_{ts_col}", watermark_delay)
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {max_span}")
        )
    )
    return l.join(r, cond, "inner")
