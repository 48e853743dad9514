"""Time-series aggregation operators: time-weighted averages and
interval-concurrency sweep lines.

Both answer questions a plain GROUP BY gets subtly wrong:

- a mean over irregularly sampled readings overweights bursts; the
  TIME-weighted mean (:func:`time_weighted_avg`) integrates the
  step function each key's readings define, so a value that held for
  an hour counts 60× one that held a minute — metering, pricing
  (TWAP), utilization.
- "how many were active AT ONCE" (:func:`daily_peak_concurrency`) is
  a sweep line over interval endpoints, not a count of rows — capacity
  planning, connection-pool sizing, peak-load audits.

Engine-parity discipline: durations are integer seconds and values
integer-quantized by the caller (cents etc.), so every accumulated
product is exact (decimal(38,0)) and order-independent; doubles appear
only in the final division.

Reference parity: the reference's analytics are the six Athena rollups
(reference/Athena.sql:114-177) — no time-weighted or concurrency
operator exists there; extension surface in the observability family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "y",
    group_cols: list[str] | None = None,
    unit_scale: int = 100,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group time-weighted mean of an integer-quantized step
    function: each reading holds until the next one (last-observation-
    carried-forward, the LOCF convention the forward-fill family
    pins), so the mean is Σ valueᵢ·Δtᵢ / ΣΔtᵢ with Δtᵢ the seconds to
    the next reading (the final reading spans no time and contributes
    nothing — the open end is unknowable, not zero).

    ``value_col`` must already be integer (quantize to cents upstream)
    so the Σ value·Δt accumulates as decimal(38,0) — exact and
    order-independent.  ``tie_cols`` fixes the order of EQUAL-second
    readings: inside a tie run every reading but the ordered-last gets
    Δt = 0 and the last bridges to the next distinct second, so which
    value "holds" depends on the tie order — engine parity needs it
    pinned whenever timestamps can collide.  One partitioned ordered
    window (lead) + one grouped aggregate — per-key sort, the same
    cost as any sessionization.

    Output: (*group_cols, n_readings, covered_seconds, time_weighted
    — value units at 6 dp assuming ``unit_scale`` sub-units).
    """
    group_cols = group_cols or []
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    dt = (
        F.lead(F.col(ts_col)).over(w).cast("long")
        - F.col(ts_col).cast("long")
    )
    staged = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.coalesce(dt, F.lit(0)).alias("_dt"),
    )
    dec = "decimal(38,0)"
    g = staged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_readings"),
        F.sum(F.col("_dt")).cast("bigint").alias("covered_seconds"),
        F.sum(F.col("_v").cast(dec) * F.col("_dt")).alias("_vt"),
    )
    return g.select(
        *group_cols,
        "n_readings",
        "covered_seconds",
        F.when(
            F.col("covered_seconds") > 0,
            F.round(
                F.col("_vt").cast("double")
                / F.col("covered_seconds").cast("double")
                / F.lit(float(unit_scale)),
                6,
            ),
        ).alias("time_weighted"),
    )


def daily_peak_concurrency(
    df: DataFrame,
    ts_col: str = "ts",
    duration_seconds: int = 300,
) -> DataFrame:
    """Peak number of simultaneously active intervals per day, where
    each row opens a half-open interval ``[ts, ts + duration)``
    clipped to its day.

    Sweep line: every interval becomes two endpoint rows (+1 open,
    −1 close), a per-day ordered cumulative sum walks the timeline,
    and the peak is the max prefix.  Half-open semantics fall out of
    the sort order — at equal timestamps the −1 sorts before the +1
    (delta ascending), so back-to-back intervals never double-count.
    Clipping the close to midnight keeps both endpoints in one
    partition, which is what makes the window PER-DAY (parallel
    across days) instead of a global single-task sort; an interval
    crossing midnight counts toward the day it started, by contract.
    For a truly global sweep at scale, range-partition the timeline
    (operators/ranking.py:global_rank machinery) instead.

    Output: (date, n_intervals, peak_concurrency, peak_at) with
    ``peak_at`` the earliest instant the peak is reached.
    """
    day = F.to_date(F.col(ts_col)).alias("date")
    day_end = F.unix_timestamp(
        F.date_add(F.to_date(F.col(ts_col)), 1).cast("timestamp")
    )
    t_open = F.col(ts_col).cast("long")
    t_close = F.least(t_open + F.lit(duration_seconds), day_end)
    opens = df.select(
        day, t_open.alias("t"), F.lit(1).alias("delta")
    )
    closes = df.select(
        day, t_close.alias("t"), F.lit(-1).alias("delta")
    )
    pts = opens.unionAll(closes)
    w = Window.partitionBy("date").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = pts.select(
        "date", "t", F.sum("delta").over(w).alias("_cum")
    )
    return (
        swept.groupBy("date")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
            F.max("_cum").cast("int").alias("peak_concurrency"),
            # argmax with earliest-time tie-break in ONE aggregate:
            # key (cum, -t) maximizes cum then minimizes t
            F.expr("max_by(t, named_struct('c', _cum, 'nt', -t))")
            .cast("timestamp")
            .alias("peak_at"),
        )
    )
