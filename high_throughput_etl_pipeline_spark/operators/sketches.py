"""Mergeable sketches — approximate distinct/quantiles at 100 TB.

Exact COUNT(DISTINCT) is a full shuffle of every key; exact percentiles
are a sort.  At 100 TB the standard answer is a mergeable sketch
(Apache DataSketches, built into Spark 4): each partition builds a
KB-sized summary, summaries merge associatively (map-side combine,
tiny shuffle), and — the operational win — PRE-AGGREGATED sketches
stored per day/partition can be unioned later to answer "distinct over
any date range" in milliseconds WITHOUT rescanning rows.  That rollup
pattern is what the reference's metrics pipeline would need at scale
(its exact per-run counts stop being computable when a run is 100 TB).

Accuracy is bounded: HLL with lgConfigK=12 gives ~1.6% standard error;
tests gate the realized error vs exact at 5%.  Estimates are
engine-specific, so queries built on these are rows-only at the driver
gate (documented in ``oracle_sql``) — the pytest accuracy gates are the
verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 12  # 4 KiB sketches, ~1.6% relative standard error


def daily_distinct_sketches(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day HLL sketches of ``key_col``: (date, sketch, exact).

    One grouped agg; the sketch column is the KB-sized binary a 100 TB
    deployment would PERSIST per partition (state-table style) so later
    range queries union sketches instead of rescanning events.  ``exact``
    rides along for accuracy verification at test scale.
    """
    return (
        df.groupBy(F.to_date(ts_col).alias("date"))
        .agg(
            F.hll_sketch_agg(key_col, F.lit(LG_CONFIG_K)).alias("sketch"),
            F.count_distinct(key_col).alias("exact_keys"),
            F.count("*").alias("n_rows"),
        )
    )


def distinct_rollup(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily approx-distinct plus an ALL row merged FROM THE DAILY
    SKETCHES — the mergeability contract: the total never re-reads rows.

    Output: (date, approx_keys, exact_keys, n_rows) with date='ALL' for
    the union row; approx/exact agree within the HLL error bound.
    """
    daily = daily_distinct_sketches(df, key_col, ts_col).localCheckpoint(
        eager=False
    )
    per_day = daily.select(
        F.col("date").cast("string").alias("date"),
        F.hll_sketch_estimate("sketch").alias("approx_keys"),
        "exact_keys",
        "n_rows",
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_keys"),
        # exact over the union cannot come from per-day exacts (days
        # share keys) — recompute only for the test-scale accuracy gate
        F.sum("n_rows").alias("n_rows"),
    ).select(
        F.lit("ALL").alias("date"),
        "approx_keys",
        F.lit(None).cast("long").alias("exact_keys"),
        "n_rows",
    )
    return per_day.unionByName(merged)


def distinct_rollup_verified(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tol: float = 0.05,
) -> DataFrame:
    """:func:`distinct_rollup` with the estimate BOUND to a checkable
    tolerance: the output carries only engine-portable values — the
    exact distinct count, the row count, and ``within_tol`` =
    |approx − exact| / exact <= tol — so an independent SQL engine can
    verify the whole row (it computes the exact side and expects the
    boolean TRUE; a drifting estimate flips the boolean).

    The exact counts are the *verification harness* and cost one extra
    count-distinct pass — at 100 TB serve :func:`distinct_rollup`
    itself (sketches only) and run this gate on a sampled partition.
    """
    roll = distinct_rollup(df, key_col, ts_col)
    exact_all = df.agg(
        F.count_distinct(key_col).alias("_exact_all")
    )
    exact = F.coalesce(F.col("exact_keys"), F.col("_exact_all"))
    return roll.crossJoin(F.broadcast(exact_all)).select(
        "date",
        exact.alias("exact_keys"),
        "n_rows",
        (
            F.abs(F.col("approx_keys") - exact) <= F.lit(tol) * exact
        ).alias("within_tol"),
    )


def value_quantile_sketches(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 200,
) -> DataFrame:
    """KLL quantile sketches per group, then group sketches merged into
    an ALL row — the scale path for percentiles-over-anything (an exact
    percentile is a sort; a KLL sketch is a bounded-size summary with
    provable rank error ~1/k).

    Output: (grp, is_merged, n, q50, q90, q99) — one row per group plus
    the all-groups merge.  ``is_merged`` is an explicit boolean, NOT a
    sentinel group name: a real group whose value happens to be the
    string 'ALL' stays distinguishable from the merged row everywhere
    downstream (join predicates, group-bys, oracles).
    """
    sk = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("sketch"),
        F.count("*").alias("n"),
    ).localCheckpoint(eager=False)

    def qcols(sketch):
        return [
            F.round(
                F.kll_sketch_get_quantile_double(sketch, F.lit(q)), 6
            ).alias(f"q{int(q * 100)}")
            for q in quantiles
        ]

    per_group = sk.select(
        "grp", F.lit(False).alias("is_merged"), "n", *qcols(F.col("sketch"))
    )
    # kll_merge_agg_double is a true aggregate over sketch blobs —
    # map-side combinable, the shape that merges 10⁵ partition sketches
    merged = sk.agg(
        F.expr("kll_merge_agg_double(sketch)").alias("m"),
        F.sum("n").alias("n"),
    ).select(
        F.lit("ALL").alias("grp"),
        F.lit(True).alias("is_merged"),
        "n",
        *qcols(F.col("m")),
    )
    return per_group.unionByName(merged)


def quantile_ranks_verified(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 200,
    tol: float = 0.05,
) -> DataFrame:
    """:func:`value_quantile_sketches` with each estimate BOUND to its
    rank-error contract, in engine-portable form: for every group (and
    the merged row) the output is ``(grp, is_merged, n_rows, r50_ok,
    ...)``
    where ``rQ_ok`` verifies the sketch's returned quantile value v
    really sits within ``tol`` of normalized rank Q —
    ``count(x < v)/n <= Q + tol`` and ``count(x <= v)/n >= Q - tol``
    (the two-sided form is exact under ties/mass points).  KLL with
    k=200 guarantees ~2% rank error, so tol=0.05 is conservative.

    An independent engine verifies the exact side (group sizes) and
    expects every boolean TRUE; a drifting estimate flips its boolean.
    The rank check is one broadcast of the tiny quantile frame over one
    extra scan — the verification harness, not the serving path.
    """
    qs = value_quantile_sketches(df, value_col, group_col, quantiles, k)
    ev = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    )
    j = ev.join(
        F.broadcast(qs),
        # null-safe on the group key: a NULL group is a real group to
        # value_quantile_sketches (and to the oracle's GROUP BY) — a
        # plain == would NULL the predicate and drop its row.  The
        # merged row matches every event via the explicit is_merged
        # boolean, never via a group-name sentinel (a real group
        # literally named 'ALL' must not absorb the whole table).
        (~F.col("is_merged") & F.col("grp").eqNullSafe(F.col("_g")))
        | F.col("is_merged"),
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for q in quantiles:
        c = f"q{int(q * 100)}"
        aggs.append(
            F.sum(
                F.when(F.col("_v") < F.col(c), 1).otherwise(0)
            ).alias(f"_lt_{c}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("_v") <= F.col(c), 1).otherwise(0)
            ).alias(f"_le_{c}")
        )
    g = j.groupBy("grp", "is_merged").agg(*aggs)
    cols = [F.col("grp"), F.col("is_merged"), F.col("n_rows")]
    for q in quantiles:
        c = f"q{int(q * 100)}"
        ok = (
            F.col(f"_lt_{c}") <= (F.lit(q + tol) * F.col("n_rows"))
        ) & (F.col(f"_le_{c}") >= (F.lit(q - tol) * F.col("n_rows")))
        cols.append(ok.alias(f"r{int(q * 100)}_ok"))
    return g.select(*cols)


def segment_overlap(
    df: DataFrame,
    key_col: str = "user_id",
    seg_col: str = "event_type",
    lg_k: int = LG_CONFIG_K,
) -> DataFrame:
    """Distinct-key overlap between every segment pair via theta sketches.

    HLL only unions; theta sketches support INTERSECTION and DIFFERENCE,
    which is what audience-overlap / segment-containment questions need
    ("how many users did both A and B?") — at 100 TB the alternative is
    a distinct self-join per pair.  One grouped pass builds a sketch per
    segment; the pair matrix is a broadcast self-join over (tiny)
    segment rows; every estimate derives from the stored sketches.

    Output per (seg_a < seg_b): distinct counts, union, intersection,
    |A\\B|, and Jaccard — estimates, engine-specific → rows-only at the
    driver gate; accuracy and the inclusion-exclusion identity are gated
    in tests/test_sketches.py.
    """
    sk = (
        df.groupBy(F.col(seg_col).alias("seg"))
        .agg(
            F.theta_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
            F.count_distinct(key_col).alias("exact_keys"),
        )
        .localCheckpoint(eager=False)
    )
    a = sk.select(
        F.col("seg").alias("seg_a"),
        F.col("sketch").alias("_sa"),
        F.col("exact_keys").alias("exact_a"),
    )
    b = sk.select(
        F.col("seg").alias("seg_b"),
        F.col("sketch").alias("_sb"),
        F.col("exact_keys").alias("exact_b"),
    )
    est = lambda e: F.round(F.expr(e), 1)  # noqa: E731
    return (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            "exact_a",
            "exact_b",
            est("theta_sketch_estimate(theta_union(_sa, _sb))").alias(
                "union_est"
            ),
            est("theta_sketch_estimate(theta_intersection(_sa, _sb))").alias(
                "intersect_est"
            ),
            est("theta_sketch_estimate(theta_difference(_sa, _sb))").alias(
                "a_only_est"
            ),
        )
        .withColumn(
            "jaccard_est",
            F.round(F.col("intersect_est") / F.col("union_est"), 4),
        )
    )


def segment_overlap_verified(
    df: DataFrame,
    key_col: str = "user_id",
    seg_col: str = "event_type",
    lg_k: int = LG_CONFIG_K,
    tol: float = 0.05,
) -> DataFrame:
    """:func:`segment_overlap` with every set-algebra estimate BOUND to
    the theta-sketch error contract in engine-portable form: exact
    pairwise intersection/union ride along (computable by any SQL
    engine from distinct (key, segment) rows) and each estimate
    collapses to a boolean ``|est − exact| <= tol · exact_union`` —
    theta intersection error is bounded relative to the UNION size
    (Dasgupta et al., "Theta Sketch Framework"), so that is the right
    normalizer for all three.

    Output: (seg_a, seg_b, exact_a, exact_b, exact_intersect,
    exact_union, union_ok, intersect_ok, diff_ok).  The exact pair
    join is the verification harness — at 100 TB serve
    :func:`segment_overlap` (sketch-only) and gate on a sample.
    """
    est = segment_overlap(df, key_col, seg_col, lg_k)
    d = df.select(
        F.col(seg_col).alias("_s"), F.col(key_col).alias("_k")
    ).distinct()
    inter = (
        d.select(F.col("_s").alias("seg_a"), "_k")
        .join(d.select(F.col("_s").alias("seg_b"), "_k"), on="_k")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    j = est.join(inter, on=["seg_a", "seg_b"], how="left").withColumn(
        "exact_intersect",
        F.coalesce(F.col("exact_intersect"), F.lit(0)).cast("bigint"),
    )
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_intersect")
    )
    bound = F.lit(tol) * exact_union

    def ok(est_col: str, exact) -> F.Column:
        return F.abs(F.col(est_col) - exact) <= bound

    return j.select(
        "seg_a",
        "seg_b",
        "exact_a",
        "exact_b",
        "exact_intersect",
        exact_union.cast("bigint").alias("exact_union"),
        ok("union_est", exact_union).alias("union_ok"),
        ok("intersect_est", F.col("exact_intersect")).alias("intersect_ok"),
        ok("a_only_est", F.col("exact_a") - F.col("exact_intersect")).alias(
            "diff_ok"
        ),
    )


def _cms_bucket(key, row, width: int) -> F.Column:
    """Row-salted md5 bucket — the i-th CMS hash function.  Uses the
    engine-portable low-60-bit md5 slice, so an independent SQL engine
    reproduces the same counters bit-for-bit."""
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    return F.pmod(
        md5_64(F.concat(row.cast("string"), F.lit(":"), key.cast("string"))),
        F.lit(width),
    )


def cms_sketches(
    df: DataFrame,
    key_col: str = "user_id",
    group_col: F.Column | str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-group count-min sketches: (group, cms, n_rows).

    ``cms`` is a depth×width counter matrix (array<array<bigint>>) — a
    KB-scale summary supporting point-frequency estimates with the
    classic guarantee: estimate ≥ true, and ≤ true + (e/width)·N with
    probability 1−e^−depth.  Unlike HLL/KLL the arithmetic is exact
    integer counting over deterministic hashes, so the whole pipeline is
    value-checkable against an independent engine.

    Shape: rows explode ×depth (map-side), one grouped count on
    (group, row, bucket) — cardinality ≤ groups·depth·width, tiny —
    then two map-from-entries densification passes.  The heavy shuffle
    carries (group,row,bucket) partial counts, never raw keys; at
    100 TB the per-partition combine reduces each partition to ≤
    depth·width cells before anything moves.
    """
    group = (
        F.lit("ALL") if group_col is None else F.col(group_col)
        if isinstance(group_col, str)
        else group_col
    ).alias("group")
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("_row")
    keyed = df.select(group, F.col(key_col).alias("_k")).select(
        "group", "_k", rows
    )
    cells = (
        keyed.withColumn("_b", _cms_bucket(F.col("_k"), F.col("_row"), width))
        .groupBy("group", "_row", "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    dense_rows = cells.groupBy("group", "_row").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_cnt")))
        ).alias("_m")
    ).select(
        "group",
        "_row",
        F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda b: F.coalesce(
                F.element_at(F.col("_m"), b.cast("bigint")), F.lit(0)
            ).cast("bigint"),
        ).alias("_arr"),
    )
    mat = F.map_from_entries(
        F.collect_list(F.struct(F.col("_row"), F.col("_arr")))
    )
    return dense_rows.groupBy("group").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.element_at(mat, i.cast("int")),
        ).alias("cms"),
        # every row of the matrix sums to the group's row count; read it
        # off row 0 so n_rows needs no second pass over the input
        F.sum(
            F.when(
                F.col("_row") == 0,
                F.aggregate(
                    "_arr", F.lit(0).cast("bigint"), lambda a, x: a + x
                ),
            ).otherwise(F.lit(0))
        ).alias("n_rows"),
    )


def cms_merge(sketches: DataFrame, depth: int = 4, width: int = 256):
    """Merge all per-group CMS matrices into ONE matrix column
    (one-row DataFrame) by elementwise sum — the mergeability contract:
    totals come from stored sketches, never from rescanning rows."""
    zero = F.array_repeat(
        F.array_repeat(F.lit(0).cast("bigint"), width), depth
    )
    return sketches.agg(
        F.aggregate(
            F.collect_list("cms"),
            zero,
            lambda acc, m: F.zip_with(
                acc,
                m,
                lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
            ),
        ).alias("cms")
    )


def cms_estimate(
    probes: DataFrame,
    merged: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]`` against the
    one-row merged sketch: min over rows of the key's counter.  The
    matrix rides in as a broadcast one-row join (never a plan literal —
    huge literals break codegen)."""
    est = F.least(
        *[
            F.element_at(
                F.element_at(F.col("cms"), i + 1),
                (_cms_bucket(F.col(key_col), F.lit(i), width) + 1).cast(
                    "int"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        probes.crossJoin(F.broadcast(merged))
        .withColumn(out_col, est)
        .drop("cms")
    )
