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
