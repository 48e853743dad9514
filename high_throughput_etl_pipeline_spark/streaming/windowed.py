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
