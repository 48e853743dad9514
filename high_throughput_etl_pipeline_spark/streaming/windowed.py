"""Watermarked event-time windowed aggregation (SURVEY.md §2.6 ST2/ST3).

The reference buckets by event time (date from the file NAME) and flushes
late files through the orphan path.  The streaming-native form: tumbling
event-time windows + a watermark bounding how late data may arrive; rows
later than the watermark are dropped (the quarantine-analog for time),
everything else lands in its window regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    value_col: str | None = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ value sums) with late-data bound.

    Works on a streaming OR batch DataFrame (batch ignores the watermark —
    same code path for backfills, the engine's batch/streaming symmetry).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    keys = [F.window(ts_col, window_duration).alias("win")]
    if group_cols:
        keys.extend(F.col(c) for c in group_cols)
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in ("n_events", "total_value") if c in out.columns],
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Native ``session_window`` sessionization, batch or streaming.

    The streaming side is the part a manual lag-sessionizer cannot do:
    the engine keeps per-key OPEN sessions in state, MERGES a session
    whose events arrive split across micro-batches (or out of order
    within the watermark), and seals a session only when the watermark
    passes its gap — the batch run of the identical plan is the oracle
    (tests pin set-equality of sealed sessions).

    Same gap semantics as the batch query ``events_session_window_native``:
    a new session starts when the gap is REACHED (delta >= gap).  State
    size is bounded by open sessions per key — watermark eviction is
    what makes this run forever at 100 TB/day.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    out = df.groupBy(
        F.session_window(ts_col, gap).alias("sess"), F.col(key_col)
    ).agg(*aggs)
    return out.select(
        F.col(key_col),
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        *[c for c in ("n_events", "total_value") if c in out.columns],
    )
