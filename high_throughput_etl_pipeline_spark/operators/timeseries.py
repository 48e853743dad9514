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


def autocorrelation(
    daily: DataFrame,
    group_col: str = "event_type",
    order_col: str = "d",
    x_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation r_k of an integer series, lags 1..max_lag,
    per group — the seasonality / burst-memory diagnostic.

    Exactness: with S = Σx and n the series length, the centered
    deviation scaled by n, ``dev = n·x_t − S``, is an exact bigint, and
    r_k = Σ dev_t·dev_{t−k} / Σ dev_t² is invariant to that scaling —
    so both sums accumulate exact 128-bit integers (decimal(38,0) here,
    HUGEINT in a SQL oracle) and doubles appear only in the final
    division.  No float accumulation, no summation-order sensitivity.

    Scale shape: the lag windows partition by group and the series
    grain is one row per (group, period) — series length grows with
    calendar time, not data volume, so the window state is bounded.
    One shuffle to the group partitioning, one grouped agg.
    """
    stats = daily.groupBy(group_col).agg(
        F.sum(x_col).cast("bigint").alias("_S"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    j = daily.join(F.broadcast(stats), on=group_col).withColumn(
        "_dev", (F.col("_n") * F.col(x_col) - F.col("_S")).cast("bigint")
    )
    w = Window.partitionBy(group_col).orderBy(order_col)
    dec = "decimal(38,0)"
    lag_prods = [
        (
            F.col("_dev").cast(dec) * F.lag("_dev", k).over(w).cast(dec)
        ).alias(f"_p{k}")
        for k in range(1, max_lag + 1)
    ]
    terms = j.select(
        group_col,
        "_n",
        (F.col("_dev").cast(dec) * F.col("_dev").cast(dec)).alias("_dd"),
        *lag_prods,
    )
    agg = terms.groupBy(group_col).agg(
        F.max("_n").alias("n_periods"),
        F.sum("_dd").alias("_den"),
        *[F.sum(f"_p{k}").alias(f"_num{k}") for k in range(1, max_lag + 1)],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.when(
                    F.col("_den") > 0,
                    F.round(
                        F.col(f"_num{k}").cast("double")
                        / F.col("_den").cast("double"),
                        6,
                    ),
                ).alias("acf"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    return (
        agg.select(group_col, "n_periods", F.explode(pairs).alias("_e"))
        .select(
            group_col,
            F.col("_e.lag").alias("lag"),
            "n_periods",
            F.col("_e.acf").alias("acf"),
        )
        .orderBy(group_col, "lag")
    )


def cusum_alarms(
    daily: DataFrame,
    group_col: str = "event_type",
    order_col: str = "d",
    x_col: str = "x",
    slack_div: int = 20,
    h_mult: int = 4,
    target: int | None = None,
    allowance: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page '54) over an integer
    series: per step, ``pos = max(0, pos + (x − target) − allowance)``
    (and the mirrored ``neg``), alarm when the statistic crosses
    ``h = allowance·h_mult``, reset after alarm.  ``target`` is the
    integer floor-mean and ``allowance = max(target div slack_div, 1)``
    — every state transition is bigint arithmetic, so the recursion is
    bit-reproducible in any engine (a SQL oracle replays it as a
    recursive CTE).

    CUSUM is inherently sequential (the max(0,·) clamp breaks
    prefix-sum decomposition), so each group's series folds through
    ``F.aggregate`` over its sorted (period, x) array.  That is safe at
    any data volume for the same reason the window in
    :func:`autocorrelation` is: series length is calendar periods, not
    rows — groups stay parallel, the fold is per-group.

    Pass explicit ``target``/``allowance`` to monitor against a FROZEN
    reference level (the streaming monitor's contract — an evolving
    floor-mean would drift the baseline toward the anomaly); left None,
    both derive from the data as above.
    """
    if (target is None) != (allowance is None):
        raise ValueError(
            "cusum_alarms: pass target and allowance together or neither"
        )
    if target is not None:
        par = daily.select(group_col).distinct().select(
            group_col,
            F.lit(int(target)).cast("bigint").alias("_target"),
            F.lit(int(allowance)).cast("bigint").alias("_allow"),
        ).withColumn("_h", (F.col("_allow") * h_mult).cast("bigint"))
    else:
        stats = daily.groupBy(group_col).agg(
            F.sum(x_col).cast("bigint").alias("_S"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
        par = stats.select(
            group_col,
            F.expr("_S div _n").cast("bigint").alias("_target"),
            F.greatest(
                F.expr(f"(_S div _n) div {slack_div}"), F.lit(1)
            )
            .cast("bigint")
            .alias("_allow"),
        ).withColumn("_h", (F.col("_allow") * h_mult).cast("bigint"))
    series = (
        daily.groupBy(group_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col).alias("d"), F.col(x_col).alias("x")))
            ).alias("_series")
        )
        .join(F.broadcast(par), on=group_col)
    )
    row_t = (
        "array<struct<d:date,x:bigint,pos:bigint,neg:bigint,"
        "up:boolean,dn:boolean>>"
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("pos"),
        F.lit(0).cast("bigint").alias("neg"),
        F.expr(f"CAST(array() AS {row_t})").alias("rows"),
    )

    def step(acc, e):
        pos1 = F.greatest(
            F.lit(0).cast("bigint"),
            acc["pos"] + (e["x"] - F.col("_target")) - F.col("_allow"),
        )
        neg1 = F.greatest(
            F.lit(0).cast("bigint"),
            acc["neg"] + (F.col("_target") - e["x"]) - F.col("_allow"),
        )
        up = pos1 > F.col("_h")
        dn = neg1 > F.col("_h")
        row = F.struct(
            e["d"].alias("d"),
            e["x"].cast("bigint").alias("x"),
            pos1.alias("pos"),
            neg1.alias("neg"),
            up.alias("up"),
            dn.alias("dn"),
        )
        return F.struct(
            F.when(up, F.lit(0).cast("bigint")).otherwise(pos1).alias("pos"),
            F.when(dn, F.lit(0).cast("bigint")).otherwise(neg1).alias("neg"),
            F.concat(acc["rows"], F.array(row)).alias("rows"),
        )

    folded = series.select(
        group_col,
        F.explode(F.aggregate("_series", init, step)["rows"]).alias("_r"),
    )
    return folded.select(
        group_col,
        F.col("_r.d").alias("d"),
        F.col("_r.x").alias("x"),
        F.col("_r.pos").alias("cusum_pos"),
        F.col("_r.neg").alias("cusum_neg"),
        F.col("_r.up").alias("alarm_up"),
        F.col("_r.dn").alias("alarm_dn"),
    ).orderBy(group_col, "d")


def seasonal_backtest(
    daily: DataFrame,
    group_col: str = "event_type",
    order_col: str = "d",
    x_col: str = "x",
    period: int = 7,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (x̂_t = x_{t−period})
    against plain naive (x̂_t = x_{t−1}) on an integer series: per
    group, evaluation-window MAE, WAPE, bias, and the skill ratio
    MAE_seasonal / MAE_naive (< 1 ⇒ the seasonal lag carries signal).

    Eval rows are those where the seasonal lag exists, so both models
    score the identical window.  Absolute/signed errors are exact
    bigints; each reported metric is ONE double division of two bigint
    sums — no float accumulation.  Lag windows partition per group over
    period-grain rows (bounded by calendar, not data volume).
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    scored = (
        daily.withColumn("_fs", F.lag(x_col, period).over(w))
        .withColumn("_fn", F.lag(x_col, 1).over(w))
        .filter(F.col("_fs").isNotNull())
    )
    e_s = F.col(x_col) - F.col("_fs")
    e_n = F.col(x_col) - F.col("_fn")
    agg = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.abs(e_s)).cast("bigint").alias("_ae_s"),
        F.sum(F.abs(e_n)).cast("bigint").alias("_ae_n"),
        F.sum(e_s).cast("bigint").alias("_e_s"),
        F.sum(F.col(x_col)).cast("bigint").alias("_ax"),
    )
    return agg.select(
        group_col,
        "n_eval",
        F.round(F.col("_ae_s") / F.col("n_eval"), 6).alias("mae_seasonal"),
        F.round(F.col("_ae_n") / F.col("n_eval"), 6).alias("mae_naive"),
        F.when(
            F.col("_ax") > 0,
            F.round(F.col("_ae_s") / F.col("_ax"), 6),
        ).alias("wape_seasonal"),
        F.round(F.col("_e_s") / F.col("n_eval"), 6).alias("bias_seasonal"),
        F.when(
            F.col("_ae_n") > 0,
            F.round(F.col("_ae_s") / F.col("_ae_n"), 6),
        ).alias("skill_ratio"),
    ).orderBy(group_col)


def theil_sen(
    daily: DataFrame,
    group_col: str = "event_type",
    date_col: str = "d",
    x_col: str = "x",
) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes
    (x_j − x_i)/(d_j − d_i) per group — breakdown point ~29 %, the
    robust complement to the OLS trend (one wild day cannot move it).

    Determinism: each slope is ONE double division of two exact
    integers; the median ordering is (slope, Δx, Δdays) — a total
    order both engines share (two equal-slope pairs tie-break on the
    exact integer deltas), and the even-count median is the mean of
    exactly two doubles (commutative, order-safe).

    Scale shape: the pair self-join is per-group over PERIOD-grain
    rows — C(days, 2) pairs per group, bounded by calendar span
    squared, not by data volume; the median rank filter is a
    partitioned window, never global.
    """
    a = daily.select(
        F.col(group_col).alias("_g"),
        F.col(date_col).alias("_da"),
        F.col(x_col).alias("_xa"),
    )
    b = daily.select(
        F.col(group_col).alias("_g"),
        F.col(date_col).alias("_db"),
        F.col(x_col).alias("_xb"),
    )
    pairs = a.join(b, on="_g").filter(F.col("_da") < F.col("_db")).select(
        "_g",
        (F.col("_xb") - F.col("_xa")).cast("bigint").alias("_dx"),
        F.datediff(F.col("_db"), F.col("_da")).cast("bigint").alias("_dd"),
    )
    slopes = pairs.select(
        "_g", "_dx", "_dd", (F.col("_dx") / F.col("_dd")).alias("_s")
    )
    w = Window.partitionBy("_g").orderBy("_s", "_dx", "_dd")
    ranked = slopes.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("_g"))
    )
    mid = ranked.filter(
        (F.col("_rn") == F.expr("(_n + 1) div 2"))
        | (F.col("_rn") == F.expr("_n div 2 + 1"))
    )
    return (
        mid.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max("_n").cast("bigint").alias("n_pairs"),
            F.round(F.avg("_s"), 6).alias("theil_sen_slope"),
        )
        .orderBy(group_col)
    )
