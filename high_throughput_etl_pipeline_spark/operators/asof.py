"""As-of join — an operator Spark lacks, composed from built-ins.

For each left row, find the latest right row with ``right_ts <= left_ts``
(backward direction) within the same key — the standard temporal-align
primitive (trade/quote matching, event attribution, feature snapshots).

Implementation is the union-window technique, NOT a range self-join:

    union(left tagged 1, right tagged 0)
    → window per key ordered by (ts, tag)
    → last non-null right-payload among preceding rows
    → keep left rows

One shuffle on the key, linear in |L|+|R|; a naive join-then-filter is
|L|×|R| per key and dies on hot keys.  Ties (right_ts == left_ts) match,
same as DuckDB's ASOF semantics (right sorts before left at equal ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``asof_<ts>`` (+ prefixed payload columns) of the most
    recent right row at-or-before the left timestamp; nulls when no right
    row precedes."""
    right_payload = right_payload or []
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l_tagged.columns)  # align column order for unionByName

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        f"{payload_prefix}ts", F.last("_r_ts", ignorenulls=True).over(w)
    )
    for c in right_payload:
        matched = matched.withColumn(
            f"{payload_prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    drop = ["_ats", "_is_left", "_r_ts"] + [f"_r_{c}" for c in right_payload]
    return matched.filter(F.col("_is_left") == 1).drop(*drop)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Forward direction: the EARLIEST right row at-or-after the left
    timestamp (next-event attribution — e.g. the next browse after a
    purchase).  Same union-window plan as backward with the frame
    reversed: window ordered by (ts, ~tag) descending-frame via
    unboundedFollowing, ``first`` non-null right payload among current
    and following rows.  Ties (right_ts == left_ts) match, mirroring
    DuckDB's ``left.ts <= right.ts`` ASOF semantics (right sorts after
    left at equal ts so the frame sees it)."""
    right_payload = right_payload or []
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l_tagged.columns)

    unioned = l_tagged.unionByName(r_tagged)
    # left (tag 1) sorts BEFORE right (tag 0) at equal ts under
    # descending tag order... we order ascending by (_ats, -_is_left is
    # wrong) — use (ts asc, tag desc) so at equal ts the left row comes
    # first and its following-frame includes the tied right row
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = unioned.withColumn(
        f"{payload_prefix}ts", F.first("_r_ts", ignorenulls=True).over(w)
    )
    for c in right_payload:
        matched = matched.withColumn(
            f"{payload_prefix}{c}",
            F.first(f"_r_{c}", ignorenulls=True).over(w),
        )
    drop = ["_ats", "_is_left", "_r_ts"] + [f"_r_{c}" for c in right_payload]
    return matched.filter(F.col("_is_left") == 1).drop(*drop)
