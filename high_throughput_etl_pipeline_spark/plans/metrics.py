"""Metrics time-series profile (SURVEY.md §2.4 A6-A10, §2.5 W1).

The reference's metrics CLI (metrics-app/analyze_metrics.py:15-175) loops
hour partitions of a DynamoDB table driver-side and computes statistics in
Python.  Here the whole profile is ONE distributed aggregation pass plus a
tiny rollup — at 100 TB of metrics the hour loop would never finish; a
groupBy does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def size_profile(metrics: DataFrame, size_col: str = "size_mb") -> DataFrame:
    """A6/A7 — mean/median/min/max/stddev + P50/P95/P99 of file sizes."""
    c = F.col(size_col)
    return metrics.agg(
        F.count("*").alias("file_count"),
        F.round(F.sum(c), 4).alias("total_mb"),
        F.round(F.avg(c), 4).alias("mean_mb"),
        F.round(F.expr(f"percentile({size_col}, 0.5)"), 4).alias("median_mb"),
        F.round(F.min(c), 4).alias("min_mb"),
        F.round(F.max(c), 4).alias("max_mb"),
        F.round(F.stddev_samp(c), 4).alias("stddev_mb"),
        F.round(F.expr(f"percentile({size_col}, 0.95)"), 4).alias("p95_mb"),
        F.round(F.expr(f"percentile({size_col}, 0.99)"), 4).alias("p99_mb"),
    )


def velocity(metrics: DataFrame, hours_observed: float) -> DataFrame:
    """A8 — files/hour, files/sec, GB/hour, TB/day projections
    (analyze_metrics.py:104-106): post-aggregation arithmetic."""
    agg = metrics.agg(
        F.count("*").alias("files"),
        F.sum("size_gb").alias("total_gb"),
    )
    h = F.lit(float(hours_observed))
    return agg.select(
        F.col("files"),
        F.round(F.col("files") / h, 2).alias("files_per_hour"),
        F.round(F.col("files") / h / 3600.0, 4).alias("files_per_sec"),
        F.round(F.col("total_gb") / h, 4).alias("gb_per_hour"),
        F.round(F.col("total_gb") / h * 24 / 1024.0, 4).alias("tb_per_day"),
    )


def hourly_breakdown(metrics: DataFrame) -> DataFrame:
    """A10 — per-date_hour count/volume table (analyze_metrics.py:151-160)."""
    return (
        metrics.groupBy("date_hour")
        .agg(
            F.count("*").alias("file_count"),
            F.round(F.sum("size_mb"), 4).alias("volume_mb"),
        )
        .orderBy("date_hour")
    )


def peak_hour(metrics: DataFrame) -> DataFrame:
    """A9/W1 — argmax hour by file count (analyze_metrics.py:109-110).

    max_by keeps it a single aggregation (no window, no second shuffle);
    ties broken by date_hour for determinism.
    """
    per_hour = metrics.groupBy("date_hour").agg(
        F.count("*").alias("file_count"),
        F.round(F.sum("size_mb"), 4).alias("volume_mb"),
    )
    return per_hour.agg(
        F.expr(
            "max_by(named_struct("
            "'date_hour', date_hour, 'file_count', file_count, "
            "'volume_mb', volume_mb), "
            "named_struct('c', file_count, 'h', date_hour))"
        ).alias("peak")
    ).select("peak.*")


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lo, hi] quantiles — the robust-stats step that keeps a handful of
    corrupt readings from dominating means/sums downstream.

    Output = input + (_lo, _hi, value_w, clipped_lo, clipped_hi).
    Shape: one tiny per-group percentile aggregate (rows = #groups)
    broadcast-joins back; the clip itself is map-side.  Exact
    percentiles hold each group's values in the aggregate — fine for
    enum-like groups; at 100 TB with huge groups swap
    ``approx_percentile`` in (same two-column contract, KLL-backed).
    """
    v = F.col(value_col)
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo)).alias("_lo"),
        F.percentile(value_col, F.lit(hi)).alias("_hi"),
    )
    return (
        df.join(F.broadcast(bounds), on=group_col)
        .withColumn("value_w", F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
        .withColumn("clipped_lo", (v < F.col("_lo")).cast("int"))
        .withColumn("clipped_hi", (v > F.col("_hi")).cast("int"))
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Shuffle-skew diagnostics for a prospective join/groupBy key: the
    ``top_n`` heaviest keys with their load share, plus the key count
    and the Herfindahl concentration index (Σ share² — the expected
    fraction of pair-comparisons landing on one key, i.e. exactly the
    quantity that decides whether a self-join on this key needs
    salting).  This is the measurement behind the salt/cap decisions in
    ``dedup.jaccard_pairs`` and ``entity.fuzzy_matches``.

    Scale shape: one grouped count, one metadata-scale aggregate over
    the (distinct-key-sized) count table, top-n via sort+limit
    (TakeOrdered — never a global window).  The concentration index is
    computed from EXACT integer sums (Σn² / T²) so a single final
    division makes it engine-portable.

    Output: (rank, key, n_rows, share, n_keys, herfindahl).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # Σn² in decimal(38,0): a multi-billion-row hot key squares past
    # int64 (1e10² = 1e20 > 9.2e18) and non-ANSI bigint arithmetic
    # would wrap NEGATIVE — the diagnostic must not lie exactly when
    # skew is worst.  The final divisions go through double (no wrap).
    tot = counts.agg(
        F.sum("n_rows").alias("_t"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(
            F.col("n_rows").cast("decimal(38,0)") * F.col("n_rows")
        ).alias("_sq"),
    )
    return (
        counts.orderBy(F.desc("n_rows"), "key")
        .limit(top_n)
        .crossJoin(F.broadcast(tot))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n_rows"), "key"))
            .cast("int")
            .alias("rank"),
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
            "n_keys",
            F.round(
                F.col("_sq").cast("double")
                / (F.col("_t").cast("double") * F.col("_t").cast("double")),
                9,
            ).alias("herfindahl"),
        )
    )


def join_size_estimate(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> DataFrame:
    """EXACT output cardinality of the equi-join ``a ⋈ b`` computed
    WITHOUT running it: Σ_k n_a(k)·n_b(k) over the two per-key count
    tables — the pre-flight check for fan-out blowups (a skewed or
    low-selectivity key turns a "join" into a cross product; this
    measures it for the cost of two grouped counts and a join of
    distinct-key-sized frames, never materializing a single output
    row).

    One row: (join_rows, a_rows, b_rows, matched_keys, max_key_pairs,
    fanout_a) where ``max_key_pairs`` is the single worst key's
    contribution (the straggler-task bound before salting) and
    ``fanout_a`` = join_rows / a_rows (output amplification).
    """
    est = _join_size_estimate_exact(a, b, key_cols)
    # public shape keeps bigint columns; the sums were computed in
    # decimal(38,0), so a value past int64 surfaces as NULL (non-ANSI
    # decimal→bigint overflow) — visible, never a wrapped negative
    return est.select(
        F.col("join_rows").cast("bigint").alias("join_rows"),
        "a_rows",
        "b_rows",
        "matched_keys",
        F.col("max_key_pairs").cast("bigint").alias("max_key_pairs"),
        F.round(
            F.col("join_rows").cast("double") / F.col("a_rows"), 6
        ).alias("fanout_a"),
    )


def _join_size_estimate_exact(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> DataFrame:
    """One-row estimate with ``join_rows``/``max_key_pairs`` as
    decimal(38,0): two billion-row sides on one hot key exceed int64
    pair counts (1e10·1e10 = 1e20), and a silent int64 wrap would make
    the guardrail fail OPEN in exactly the blowup it exists to catch."""
    dec = "decimal(38,0)"
    ca = a.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_na"))
    cb = b.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_nb"))
    ta = ca.agg(F.coalesce(F.sum("_na"), F.lit(0)).cast("bigint").alias("a_rows"))
    tb = cb.agg(F.coalesce(F.sum("_nb"), F.lit(0)).cast("bigint").alias("b_rows"))
    per_key = ca.join(cb, on=key_cols).select(
        (F.col("_na").cast(dec) * F.col("_nb")).alias("_pairs")
    )
    return (
        per_key.agg(
            F.coalesce(F.sum("_pairs"), F.lit(0).cast(dec))
            .cast(dec)
            .alias("join_rows"),
            F.count(F.lit(1)).cast("bigint").alias("matched_keys"),
            F.coalesce(F.max("_pairs"), F.lit(0).cast(dec))
            .cast(dec)
            .alias("max_key_pairs"),
        )
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )


def assert_join_bounded(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    max_rows: int,
    max_key_pairs: int | None = None,
) -> DataFrame:
    """Guardrail form of :func:`join_size_estimate`: raise before a
    runaway join is ever scheduled.  ``max_rows`` bounds total output;
    ``max_key_pairs`` (optional) bounds the worst single key — the
    quantity that decides whether the biggest task finishes.  Returns
    the one-row estimate (already computed) on success so callers can
    log it.  Cost: one metadata-scale job, the cheapest insurance a
    100 TB join can buy."""
    # compare against the EXACT decimal estimate (int64 wraps negative
    # on cross-product-scale joins, which would fail the check open)
    est = _join_size_estimate_exact(a, b, key_cols).first()
    join_rows = int(est["join_rows"])
    worst = int(est["max_key_pairs"])
    if join_rows > max_rows:
        raise ValueError(
            f"join on {key_cols} would produce {join_rows} rows "
            f"(> {max_rows}); worst key contributes "
            f"{worst} — salt, pre-aggregate, or rethink"
        )
    if max_key_pairs is not None and worst > max_key_pairs:
        raise ValueError(
            f"join on {key_cols}: a single key contributes "
            f"{worst} pairs (> {max_key_pairs}) — the "
            "straggler task will not finish; salt this key"
        )
    spark = a.sparkSession
    a_rows = int(est["a_rows"])
    # explicit schema: with an empty `a` side fanout_a is undefined
    # (0/0) — inference over a None field would crash the SUCCESS path
    return spark.createDataFrame(
        [
            (
                join_rows,
                a_rows,
                int(est["b_rows"]),
                int(est["matched_keys"]),
                worst,
                round(join_rows / a_rows, 6) if a_rows else 0.0,
            )
        ],
        "join_rows BIGINT, a_rows BIGINT, b_rows BIGINT, "
        "matched_keys BIGINT, max_key_pairs BIGINT, fanout_a DOUBLE",
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9),
    id_col: str | None = None,
) -> DataFrame:
    """Exact weighted quantiles per group: the smallest ``value`` at
    which the running weight mass reaches q·W (lower weighted
    quantile).  The corpus-composition tool plain quantiles get wrong:
    "the median document BY TOKEN MASS" weighs a 10k-token doc 100×
    a 100-token doc — exactly what a training-mixture decision needs.

    Shape: one ordered window per group for the cumulative weight, one
    grouped aggregate to read off each crossing (min value where
    cum >= q·W) — the same per-group-sort cost as any exact percentile;
    for hot groups swap in the KLL sketch family
    (``operators/sketches.py``), which trades the sort for bounded rank
    error.  With integer weights every comparison is exact and the
    whole computation is engine-portable.

    ``id_col`` breaks ordering ties deterministically (required for
    engine parity when equal values carry different weights).
    Output: (*group_cols, total_weight, wq50, wq90, ...).
    """
    order = [F.col(value_col)] + (
        [F.col(id_col)] if id_col is not None else []
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = F.sum(weight_col).over(wcum)
    tot = F.sum(weight_col).over(wtot)
    staged = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        cum.alias("_cum"),
        tot.alias("_tot"),
    )
    aggs = [F.max("_tot").cast("bigint").alias("total_weight")]
    for q in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") >= F.lit(q) * F.col("_tot"), F.col("_v")
                )
            ).alias(f"wq{int(q * 100)}")
        )
    return staged.groupBy(*group_cols).agg(*aggs)


def grouped_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    x_per_unit: int = 86_400,
    y_per_unit: int = 100,
) -> DataFrame:
    """Per-group least-squares trend line in EXACT integer statistics.

    ``x_col``/``y_col`` must be integer columns (epoch seconds, cents —
    the caller quantizes; see events_value_trend).  The five sufficient
    statistics (Σx, Σy, Σx², Σy², Σxy) accumulate as decimal(38,0) in
    ONE grouped pass — bigint would wrap (epoch² · rows ≈ 10²² at a few
    thousand rows per group, 10²⁸ at a billion) and float sums are
    summation-order-dependent, which would break engine parity.  The
    closed forms then use integer numerators/denominators:

        slope      = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept  = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
        r          = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    converted to double only for the final division (identical IEEE
    operations on identical exact integers on any engine; the variance
    product is multiplied AS doubles — exact decimal would need 76
    digits).  ``x_per_unit``/``y_per_unit`` rescale the outputs (per
    day, currency units).  Degenerate groups (zero variance in x or y)
    emit NULL slope/r instead of dividing by zero.

    One shuffle, metadata-sized output — the cost of a rollup, which
    is what makes fitting 10⁶ per-key trend lines viable at 100 TB.

    Output: (*group_cols, n, slope_per_xunit, intercept, corr_r).
    """
    dec = "decimal(38,0)"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * F.col(x_col)).alias("_sxx"),
        F.sum(yd * F.col(y_col)).alias("_syy"),
        F.sum(xd * F.col(y_col)).alias("_sxy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    den_x = (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    ).cast("double")
    den_y = (
        F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    ).cast("double")
    inum = (
        F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    ).cast("double")
    slope = F.when(
        den_x > 0,
        F.round(num / den_x * F.lit(float(x_per_unit)) / F.lit(float(y_per_unit)), 6),
    )
    intercept = F.when(
        den_x > 0, F.round(inum / den_x / F.lit(float(y_per_unit)), 6)
    )
    corr = F.when(
        (den_x > 0) & (den_y > 0),
        F.round(num / F.sqrt(den_x * den_y), 6),
    )
    return g.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n"),
        slope.alias("slope_per_xunit"),
        intercept.alias("intercept"),
        corr.alias("corr_r"),
    )


def robust_outlier_profile(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier audit via median/MAD (the modified
    z-score of Iglewicz & Hoaglin '93): a point is anomalous when
    ``0.6745·|x − median| > threshold·MAD``.  Unlike mean/stddev, both
    statistics have a 50% breakdown point — the contamination being
    hunted cannot drag its own fences, which is why this is the robust
    sibling of the IQR audit (events_outlier_audit).

    Shape: two tiny per-group percentile aggregates (median, then
    median absolute deviation) broadcast back over the scan — two
    passes by necessity (MAD is a percentile OF deviations from a
    percentile), each costing a rollup.  The comparison is arranged as
    two products (no division), so zero-MAD groups (>50% of mass on
    one value) count outliers sanely and engine replay is exact
    multiplication, not a division each engine may fuse differently.

    Output: (group, n_rows, median, mad, n_outliers, outlier_pct).
    """
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), on=group_col).withColumn(
        "_adev", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile("_adev", F.lit(0.5)).alias("_mad")
    )
    flagged = dev.join(F.broadcast(mad), on=group_col)
    is_out = (F.col("_adev") * F.lit(0.6745)) > (
        F.lit(float(z_threshold)) * F.col("_mad")
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.max("_med"), 4).alias("median"),
            F.round(F.max("_mad"), 4).alias("mad"),
            F.sum(is_out.cast("int")).cast("bigint").alias("n_outliers"),
        )
        .withColumn(
            "outlier_pct",
            F.round(F.col("n_outliers") / F.col("n_rows") * 100, 6),
        )
    )


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    n_buckets: int = 10,
    min_prop: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution — the standard drift gate for a feature/score column
    (PSI < 0.1 stable, 0.1-0.25 shifting, > 0.25 drifted).

    Buckets are REFERENCE equi-depth deciles (exact percentiles of the
    reference, one rollup-cost aggregate); both sides then bucket by
    counting edges passed — an array fold over the broadcast edge
    list, map-side.  PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with proportions
    clamped to ``min_prop`` (an empty bucket otherwise sends the term
    to ±∞ — the clamp is the standard finite-sample correction and
    keeps the statistic defined).  The final sum folds the bucket
    terms IN BUCKET ORDER from a sorted array — float addition is not
    associative, so an unordered SUM would differ across engines in
    the last ulp and break value parity.

    Output (one row): (n_ref, n_cur, psi, worst_bucket,
    worst_contrib, n_shifted_buckets — buckets with |p−q| > 0.02).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = ref.agg(
        F.array(
            *[F.percentile(value_col, F.lit(q)) for q in qs]
        ).alias("_edges")
    )

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = F.expr(
            f"aggregate(_edges, 0, (acc, e) -> "
            f"acc + IF({value_col} > e, 1, 0))"
        )
        return (
            df.crossJoin(F.broadcast(edges))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = bucketed(ref, "_nr")
    c = bucketed(cur, "_nc")
    tot = r.agg(F.sum("_nr").alias("_tr")).crossJoin(
        c.agg(F.sum("_nc").alias("_tc"))
    )
    joined = (
        r.join(c, on="bucket", how="full")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "_tr",
            "_tc",
            F.greatest(
                F.coalesce(F.col("_nr"), F.lit(0)) / F.col("_tr"),
                F.lit(min_prop),
            ).alias("_p"),
            F.greatest(
                F.coalesce(F.col("_nc"), F.lit(0)) / F.col("_tc"),
                F.lit(min_prop),
            ).alias("_q"),
        )
        .withColumn(
            "_term",
            (F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")),
        )
        .withColumn("_shift", (F.abs(F.col("_p") - F.col("_q")) > 0.02))
    )
    return joined.groupBy().agg(
        F.max("_tr").cast("bigint").alias("n_ref"),
        F.max("_tc").cast("bigint").alias("n_cur"),
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "_term"))
                    ),
                    lambda s: s["_term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("psi"),
        F.expr(
            "max_by(bucket, named_struct('t', _term, 'b', -bucket))"
        )
        .cast("int")
        .alias("worst_bucket"),
        F.round(F.max("_term"), 6).alias("worst_contrib"),
        F.sum(F.col("_shift").cast("int")).cast("int").alias(
            "n_shifted_buckets"
        ),
    )


def conversion_rates_wilson(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-variant conversion rate with the Wilson score interval —
    the experiment-readout statistic (unlike the normal approximation,
    Wilson stays inside [0,1] and behaves at small n / extreme rates).

    Input: one row per UNIT (user) with a boolean ``converted_col``
    (aggregate events to units first — rates over raw events
    double-count active users, the classic A/B bug).  Counts are exact
    integers from one grouped pass; the interval is closed-form
    per-row arithmetic on (k, n) — identical IEEE ops on identical
    integers on any engine, no sums of floats anywhere.

        center = (p + z²/2n) / (1 + z²/n)
        half   = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n)

    Output: (variant, n_units, n_converted, rate, wilson_lo,
    wilson_hi), all rates at 6 dp.
    """
    g = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(F.col(converted_col).cast("int"))
        .cast("bigint")
        .alias("n_converted"),
    )
    n = F.col("n_units").cast("double")
    p = F.col("n_converted").cast("double") / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return g.select(
        "variant",
        "n_units",
        "n_converted",
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    )


# Poisson(1) CDF on the 1e-9 lattice — the inverse-CDF thresholds for
# deterministic per-(row, replicate) bootstrap weights.  A shared
# literal: computed once here, embedded verbatim in both the Spark plan
# and the DuckDB oracle, so engine parity never depends on either
# engine's exp().  Mass above k=6 (2.3e-5) lands on weight 7 — the
# truncation bias is ~1e-5 of one unit weight, far below the 1e-6
# output lattice.
import math as _math

_P1 = [_math.exp(-1.0) / _math.factorial(k) for k in range(7)]
POISSON1_CDF_1E9: list[int] = [
    round(sum(_P1[: k + 1]) * 1e9) for k in range(7)
]


def poisson_bootstrap_ci(
    df: DataFrame,
    y_col: str,
    id_col: str,
    group_cols: list[str],
    n_boot: int = 40,
    lo_rank: int = 2,
    hi_rank: int = 39,
    y_per_unit: int = 100,
    salt: str = "pboot-v1",
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean by POISSON
    RESAMPLING — the only bootstrap that distributes: classical
    resampling draws n rows WITH replacement (a global operation), but
    Binomial(n, 1/n) → Poisson(1) as n grows, so each row can draw its
    own i.i.d. replicate weights from a keyed PRF and never coordinate
    with any other row.  One map-side explode of ``n_boot`` weights per
    row, ONE grouped shuffle carrying (group, replicate) partials —
    the 100 TB shape for "error bars on any metric".

    Weights are deterministic: ``u = md5(id:b:salt) mod 1e9`` inverted
    through the shared-literal Poisson(1) CDF (``POISSON1_CDF_1E9``),
    so reruns and the SQL oracle reproduce every draw exactly.
    Replicate means land on the 1e-6 lattice; the interval is RANK
    SELECTION over the ``n_boot`` replicate means (``lo_rank``-th /
    ``hi_rank``-th smallest — 2/39 of 40 ≈ a 92.7% percentile
    interval), and the bootstrap SE is the exact integer variance of
    the lattice means.  ``y_col`` must already be integer (cents).

    Output: (*group_cols, n_rows, point_mean, boot_lo, boot_hi,
    boot_se).
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    dec = "decimal(38,0)"
    point = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(
            F.sum(F.col(y_col).cast(dec)).cast("double")
            / F.count(F.lit(1))
            / float(y_per_unit),
            6,
        ).alias("point_mean"),
    )
    th = F.array(*[F.lit(t) for t in POISSON1_CDF_1E9])
    base = df.select(
        *group_cols,
        F.col(y_col).alias("_y"),
        F.col(id_col).cast("string").alias("_id"),
    )
    # NO guarded repartition here (r14 revert of an r13 change): the
    # n_boot=40 explode + md5 PRF is light enough that the extra
    # exchange costs more than the parallelism buys — interleaved A/B
    # at sf0.1 measured repartition {1.35, 1.37, 0.98} vs none
    # {1.15, 0.78, 1.11} best-of-2 seconds; at warehouse scale the
    # scan already has thousands of splits and the question is moot.
    rep = base.select(
        *group_cols,
        "_y",
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b"),
    )
    u = F.pmod(
        md5_64(
            F.concat(
                F.col("_id"),
                F.lit(":"),
                F.col("_b").cast("string"),
                F.lit(":" + salt),
            )
        ),
        F.lit(1_000_000_000),
    )
    w = F.size(F.filter(th, lambda t: t <= u))
    per_rep = (
        rep.select(
            *group_cols,
            F.col("_b"),
            w.alias("_w"),
            (w.cast(dec) * F.col("_y")).alias("_wy"),
        )
        .groupBy(*group_cols, "_b")
        .agg(
            F.sum("_w").cast("bigint").alias("_sw"),
            F.sum("_wy").alias("_swy"),
        )
        .select(
            *group_cols,
            F.when(
                F.col("_sw") > 0,
                F.round(
                    F.col("_swy").cast("double")
                    / F.col("_sw")
                    / float(y_per_unit)
                    * 1e6,
                    0,
                ).cast("bigint"),
            ).alias("_m"),
        )
    )
    stats = per_rep.groupBy(*group_cols).agg(
        F.count("_m").cast(dec).alias("_nb"),
        F.sum(F.col("_m").cast(dec)).alias("_sm"),
        F.sum(F.col("_m").cast(dec) * F.col("_m")).alias("_smm"),
        F.sort_array(F.collect_list("_m")).alias("_arr"),
    )
    num = (F.col("_nb") * F.col("_smm") - F.col("_sm") * F.col("_sm")).cast(
        "double"
    )
    den = (F.col("_nb") * (F.col("_nb") - 1)).cast("double")
    return point.join(stats, on=group_cols).select(
        *group_cols,
        "n_rows",
        "point_mean",
        F.round(
            F.element_at(F.col("_arr"), lo_rank).cast("double") / 1e6, 6
        ).alias("boot_lo"),
        F.round(
            F.element_at(F.col("_arr"), hi_rank).cast("double") / 1e6, 6
        ).alias("boot_hi"),
        F.when(
            F.col("_nb") > 1, F.round(F.sqrt(num / den) / 1e6, 6)
        ).alias("boot_se"),
    )


def sprt_decisions(
    df: DataFrame,
    success_col: str,
    key_cols: list[str],
    order_cols: list[str],
    p0: float,
    p1: float,
    alpha: float = 0.1,
    beta: float = 0.1,
) -> DataFrame:
    """Per-key Wald SPRT (sequential probability ratio test) — the
    always-valid guardrail monitor: for each key's Bernoulli stream in
    event order, accumulate the log-likelihood ratio of H1 (rate p1)
    against H0 (rate p0) and stop at the FIRST crossing of the Wald
    boundaries ln((1-β)/α) / ln(β/(1-α)).

    The two per-observation LLR increments and both boundaries are
    scaled to a 1e-9 integer lattice as SHARED LITERALS (plain Python
    ``math.log`` at plan-build time), so the running sum is an exact
    integer any engine reproduces bit-for-bit — float never enters the
    recurrence.  The stream is one window PARTITIONED BY KEY (each
    key's scan is local to its partition; nothing orders globally) and
    the stopping rule is a grouped conditional-min — first up-crossing
    rank vs first down-crossing rank; whichever is earlier decided the
    test, neither means the data ran out undecided (``continue``).

    Output: (*key_cols, decision, stop_n, n_obs) — stop_n is the
    1-based observation index the test decided at (or n_obs when it
    never decided).  At 100 TB this is one keyed shuffle + per-key
    linear scans; decisions per key cost what a rollup costs.
    """
    inc1 = round(_math.log(p1 / p0) * 1e9)
    inc0 = round(_math.log((1.0 - p1) / (1.0 - p0)) * 1e9)
    a9 = round(_math.log((1.0 - beta) / alpha) * 1e9)
    b9 = round(_math.log(beta / (1.0 - alpha)) * 1e9)
    wsum = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy(*key_cols).orderBy(*order_cols)
    inc = F.when(F.col(success_col) == 1, F.lit(inc1)).otherwise(
        F.lit(inc0)
    )
    c = df.select(*key_cols, *order_cols, success_col).select(
        *key_cols,
        F.sum(inc).over(wsum).alias("_cum"),
        F.row_number().over(wrn).alias("_rn"),
    )
    per = c.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.min(F.when(F.col("_cum") >= a9, F.col("_rn"))).alias("_hi"),
        F.min(F.when(F.col("_cum") <= b9, F.col("_rn"))).alias("_lo"),
    )
    hi, lo = F.col("_hi"), F.col("_lo")
    h1 = hi.isNotNull() & (lo.isNull() | (hi < lo))
    h0 = lo.isNotNull() & (hi.isNull() | (lo < hi))
    return per.select(
        *key_cols,
        F.when(h1, F.lit("accept_h1"))
        .when(h0, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.when(h1, hi)
        .when(h0, lo)
        .otherwise(F.col("n_obs"))
        .cast("bigint")
        .alias("stop_n"),
        "n_obs",
    )


def zonemap_pruning(
    df: DataFrame,
    group_col,
    value_col: str,
    ranges: list[tuple[str, str, str]],
) -> DataFrame:
    """Zone-map (row-group min/max) pruning audit — the data-layout
    introspection behind "is this table clustered well enough that
    predicates skip I/O?".  ``group_col`` is the storage-unit proxy
    (ingest batch, row-group bucket), ``ranges`` are half-open
    ``[lo, hi)`` timestamp predicates as (label, lo, hi) strings.

    One grouped pass builds the zone map (min/max/count per unit —
    exactly what a parquet footer stores); predicates join in as a
    BROADCAST grid; a unit is pruned when ``max < lo OR min >= hi``.
    The matching-row counts come from the same single scan
    (conditional sums — the predicate set is a plan-time literal, so
    no second pass and no ×|preds| row expansion).  Everything is an
    exact count; the two fractions divide once at the end.

    Output per predicate: (pred_label, n_groups, n_pruned,
    rows_scanned, rows_matching, scan_fraction, match_fraction) —
    scan_fraction vs match_fraction IS the layout verdict: a
    well-clustered table has them close; scan ≫ match means the zone
    maps cannot prune and a re-sort/compaction is due.
    """
    v = F.col(value_col)
    zone_aggs = [
        F.min(v).alias("_zmin"),
        F.max(v).alias("_zmax"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    ]
    match_aggs = [
        F.sum(
            (
                (v >= F.lit(lo).cast("timestamp"))
                & (v < F.lit(hi).cast("timestamp"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias(f"_m{i}")
        for i, (_, lo, hi) in enumerate(ranges)
    ]
    zones = df.groupBy(group_col.alias("_g")).agg(
        *zone_aggs, *match_aggs
    )
    spark = df.sparkSession
    preds = spark.createDataFrame(
        [(i, lab, lo, hi) for i, (lab, lo, hi) in enumerate(ranges)],
        "pred_id INT, pred_label STRING, _lo STRING, _hi STRING",
    ).select(
        "pred_id",
        "pred_label",
        F.col("_lo").cast("timestamp").alias("_lo"),
        F.col("_hi").cast("timestamp").alias("_hi"),
    )
    grid = zones.crossJoin(F.broadcast(preds))
    survives = ~(
        (F.col("_zmax") < F.col("_lo"))
        | (F.col("_zmin") >= F.col("_hi"))
    )
    matching = None
    for i in range(len(ranges)):
        term = F.when(
            F.col("pred_id") == i, F.col(f"_m{i}")
        ).otherwise(F.lit(0))
        matching = term if matching is None else matching + term
    per = grid.groupBy("pred_id", "pred_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((~survives).cast("bigint"))
        .cast("bigint")
        .alias("n_pruned"),
        F.sum(F.when(survives, F.col("_n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum(matching).cast("bigint").alias("rows_matching"),
        F.sum("_n").cast("bigint").alias("_total"),
    )
    return per.select(
        "pred_label",
        "n_groups",
        "n_pruned",
        "rows_scanned",
        "rows_matching",
        F.round(
            F.col("rows_scanned").cast("double") / F.col("_total"), 6
        ).alias("scan_fraction"),
        F.round(
            F.col("rows_matching").cast("double") / F.col("_total"), 6
        ).alias("match_fraction"),
    ).orderBy("pred_label")


def binseg_mean_shift(
    daily: DataFrame,
    day_col: str,
    y_col: str,
    y_per_unit: int = 100,
) -> DataFrame:
    """Depth-2 binary segmentation for a mean shift over an ordered
    integer series (the classic changepoint detector): pick the split
    maximizing the between-segments sum of squares — with exact prefix
    sums S_t the gain collapses to S_L²/n_L + S_R²/n_R − S²/n (the Q_t
    terms cancel), so the scan needs ONE ordered prefix pass — then
    recurse once into each side.

    ``daily`` must already be the aggregated series (one row per
    ``day_col``, ``y_col`` integer) — the windows here run over a
    |days|-sized frame, the documented post-aggregation exception to
    the no-global-window rule; at 100 TB the raw-data pass is the
    rollup that produced ``daily``, never this.

    Prefix sums are exact integers; gains are doubles computed in one
    shared operation order, argmax ties break on earliest day.

    Output: (segment ∈ root|left|right, split_day, n_left, n_right,
    mean_left, mean_right, gain) — a side shorter than 2 points emits
    no row.
    """
    d = daily.select(F.col(day_col).alias("_day"), F.col(y_col).alias("_m"))
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_m").cast("bigint").alias("_s"),
    )
    wseq = Window.orderBy("_day")
    wsum = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = d.crossJoin(F.broadcast(tot)).select(
        "_day",
        "_m",
        "_n",
        "_s",
        F.row_number().over(wseq).alias("_t"),
        F.sum("_m").over(wsum).cast("bigint").alias("_sl"),
    )
    u = float(y_per_unit)

    def scored(frame, n_col, s_col):
        sld = F.col("_sl").cast("double")
        srd = (F.col(s_col) - F.col("_sl")).cast("double")
        nld = F.col("_t").cast("double")
        nrd = (F.col(n_col) - F.col("_t")).cast("double")
        sd = F.col(s_col).cast("double")
        nd = F.col(n_col).cast("double")
        gain = (
            sld * sld / nld + srd * srd / nrd - sd * sd / nd
        )
        return frame.filter(F.col("_t") < F.col(n_col)).select(
            frame["*"],
            F.col("_t").cast("bigint").alias("n_left"),
            (F.col(n_col) - F.col("_t")).cast("bigint").alias("n_right"),
            F.round(sld / nld / u, 6).alias("mean_left"),
            F.round(srd / nrd / u, 6).alias("mean_right"),
            gain.alias("_gain"),
        )

    root = (
        scored(seq, "_n", "_s")
        .orderBy(F.desc("_gain"), F.asc("_day"))
        .limit(1)
        .select(
            F.lit("root").alias("segment"),
            F.col("_day").alias("split_day"),
            "n_left",
            "n_right",
            "mean_left",
            "mean_right",
            F.round(F.col("_gain"), 2).alias("gain"),
            F.col("_t").alias("_root_t"),
        )
    )
    root = root.localCheckpoint(eager=False)
    lab = seq.crossJoin(
        F.broadcast(root.select("_root_t"))
    ).select(
        F.when(F.col("_t") <= F.col("_root_t"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("_seg"),
        "_day",
        "_m",
    )
    wseg = Window.partitionBy("_seg").orderBy("_day")
    wsegsum = wseg.rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    segtot = lab.groupBy("_seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n2"),
        F.sum("_m").cast("bigint").alias("_s2"),
    )
    seq2 = lab.join(F.broadcast(segtot), "_seg").select(
        "_seg",
        "_day",
        "_m",
        "_n2",
        "_s2",
        F.row_number().over(wseg).alias("_t"),
        F.sum("_m").over(wsegsum).cast("bigint").alias("_sl"),
    )
    wpick = Window.partitionBy("_seg").orderBy(
        F.desc("_gain"), F.asc("_day")
    )
    best2 = (
        scored(seq2, "_n2", "_s2")
        .withColumn("_rk", F.row_number().over(wpick))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_seg").alias("segment"),
            F.col("_day").alias("split_day"),
            "n_left",
            "n_right",
            "mean_left",
            "mean_right",
            F.round(F.col("_gain"), 2).alias("gain"),
        )
    )
    return root.drop("_root_t").unionByName(best2).orderBy("segment")


def poisson_bootstrap_uplift(
    df: DataFrame,
    y_col: str,
    id_col: str,
    arm_col: str,
    n_boot: int = 40,
    lo_rank: int = 2,
    hi_rank: int = 39,
    y_per_unit: int = 100,
    salt: str = "abboot-v1",
) -> DataFrame:
    """Bootstrap confidence interval for the MEAN UPLIFT between two
    arms ('A'/'B' in ``arm_col``) — the error bar every A/B readout
    needs, via the same distributed Poisson resample as
    :func:`poisson_bootstrap_ci`: each row draws its own keyed-PRF
    Poisson(1) weights, replicate means land on the 1e-6 lattice per
    (arm, replicate), and the uplift per replicate is the EXACT
    integer difference of the two lattice means.  The interval is rank
    selection over the ``n_boot`` sorted diffs; ``significant`` is the
    zero-exclusion test.  One explode + two grouped shuffles at any
    scale.

    Output (one row): (n_a, n_b, mean_a, mean_b, uplift, boot_lo,
    boot_hi, significant).
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    dec = "decimal(38,0)"
    u_ = float(y_per_unit)
    point = df.groupBy(arm_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.round(
            F.sum(F.col(y_col).cast(dec)).cast("double")
            / F.count(F.lit(1))
            / u_,
            6,
        ).alias("_pm"),
    )
    rep = df.select(
        F.col(arm_col).alias("_arm"),
        F.col(y_col).alias("_y"),
        F.col(id_col).cast("string").alias("_id"),
    ).select(
        "_arm",
        "_y",
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b"),
    )
    u = F.pmod(
        md5_64(
            F.concat(
                F.col("_id"),
                F.lit(":"),
                F.col("_b").cast("string"),
                F.lit(":" + salt),
            )
        ),
        F.lit(1_000_000_000),
    )
    th = F.array(*[F.lit(t) for t in POISSON1_CDF_1E9])
    w = F.size(F.filter(th, lambda t: t <= u))
    per_rep = (
        rep.select(
            "_arm",
            "_b",
            w.alias("_w"),
            (w.cast(dec) * F.col("_y")).alias("_wy"),
        )
        .groupBy("_arm", "_b")
        .agg(
            F.sum("_w").cast("bigint").alias("_sw"),
            F.sum("_wy").alias("_swy"),
        )
        .select(
            "_arm",
            "_b",
            F.when(
                F.col("_sw") > 0,
                F.round(
                    F.col("_swy").cast("double")
                    / F.col("_sw")
                    / u_
                    * 1e6,
                    0,
                ).cast("bigint"),
            ).alias("_m"),
        )
    )
    diffs = per_rep.groupBy("_b").agg(
        (
            F.max(F.when(F.col("_arm") == "B", F.col("_m")))
            - F.max(F.when(F.col("_arm") == "A", F.col("_m")))
        ).alias("_d")
    )
    # A replicate whose arm has zero total resample weight (or a
    # missing arm) yields a NULL diff, which collect_list would DROP
    # silently — the fixed lo_rank/hi_rank selection would then read a
    # shorter array and skew the CI.  Fail loudly instead: the caller
    # should widen n_boot or pre-filter degenerate arms.
    guard = F.when(
        F.col("_nmiss") > 0,
        F.raise_error(
            F.concat(
                F.lit("poisson_bootstrap_uplift: "),
                F.col("_nmiss").cast("string"),
                F.lit(
                    " replicate diff(s) NULL (zero-weight resample or"
                    " missing arm) — fixed-rank CI would silently shift"
                ),
            )
        ).cast("bigint"),
    )
    st = diffs.agg(
        F.sort_array(F.collect_list("_d")).alias("_arr"),
        F.sum(F.when(F.col("_d").isNull(), 1).otherwise(0)).alias(
            "_nmiss"
        ),
    ).select(
        F.round(
            guard.otherwise(F.element_at(F.col("_arr"), lo_rank))
            .cast("double")
            / 1e6,
            6,
        ).alias("boot_lo"),
        F.round(
            guard.otherwise(F.element_at(F.col("_arr"), hi_rank))
            .cast("double")
            / 1e6,
            6,
        ).alias("boot_hi"),
    )
    pa = point.filter(F.col(arm_col) == "A").select(
        F.col("_n").alias("n_a"), F.col("_pm").alias("mean_a")
    )
    pb = point.filter(F.col(arm_col) == "B").select(
        F.col("_n").alias("n_b"), F.col("_pm").alias("mean_b")
    )
    return (
        pa.crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(st))
        .select(
            "n_a",
            "n_b",
            "mean_a",
            "mean_b",
            F.round(F.col("mean_b") - F.col("mean_a"), 6).alias(
                "uplift"
            ),
            "boot_lo",
            "boot_hi",
            (
                (F.col("boot_lo") > 0) | (F.col("boot_hi") < 0)
            ).alias("significant"),
        )
    )


def isotonic_fit_bins(
    bins: DataFrame,
    bin_col: str = "bin",
    w_col: str = "w",
    y_col: str = "y",
) -> DataFrame:
    """Isotonic regression (pool-adjacent-violators) over a binned
    (bin, weight, positives) frame — WITHOUT iterating: PAV's fixed
    point has the closed minimax form

        fit(k) = max_{i ≤ k} min_{j ≥ k} (Y_j − Y_{i−1}) / (W_j − W_{i−1})

    over exact prefix sums, so the whole fit is pair enumeration on
    the B-sized POST-AGGREGATION frame (the documented tiny-frame
    exception; B² pairs, B³ worst-case candidate rows — calendar-scale
    numbers).  Prefixes are exact integers; each segment mean is one
    double division both engines share; min/max over identical doubles
    are deterministic.  Bin ids must be ≥ 0 (a −1 sentinel seeds the
    empty prefix).

    Output: (bin, w, y, rate, isotonic) — ``isotonic`` is the
    monotone-nondecreasing calibrated rate, the PAV solution exactly.
    """
    spark = bins.sparkSession
    b = bins.select(
        F.col(bin_col).cast("bigint").alias("bin"),
        F.col(w_col).cast("bigint").alias("w"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    wseq = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = b.select(
        "bin",
        F.sum("w").over(wseq).cast("bigint").alias("cw"),
        F.sum("y").over(wseq).cast("bigint").alias("cy"),
    )
    p = p.localCheckpoint(eager=False)
    sent = spark.createDataFrame(
        [(-1, 0, 0)], "bin bigint, cw bigint, cy bigint"
    )
    pa = sent.unionByName(p)
    pairs = (
        pa.alias("a")
        .join(
            F.broadcast(p.alias("j")),
            F.col("j.bin") > F.col("a.bin"),
        )
        .select(
            F.col("a.bin").alias("i0"),
            F.col("j.bin").alias("j"),
            (
                (F.col("j.cy") - F.col("a.cy")).cast("double")
                / (F.col("j.cw") - F.col("a.cw")).cast("double")
            ).alias("m"),
        )
    )
    inner = (
        b.select(F.col("bin").alias("k"))
        .join(
            F.broadcast(pairs),
            (F.col("i0") < F.col("k")) & (F.col("j") >= F.col("k")),
        )
        .groupBy("k", "i0")
        .agg(F.min("m").alias("mn"))
    )
    fit = inner.groupBy("k").agg(F.max("mn").alias("_fit"))
    return (
        b.join(fit, b["bin"] == fit["k"])
        .select(
            "bin",
            "w",
            "y",
            F.round(
                F.col("y").cast("double") / F.col("w").cast("double"),
                6,
            ).alias("rate"),
            F.round(F.col("_fit"), 6).alias("isotonic"),
        )
        .orderBy("bin")
    )
