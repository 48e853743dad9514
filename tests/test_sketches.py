"""Sketch accuracy + mergeability gates.

Sketch estimates are engine-specific, so the driver gate records these
queries rows-only; THESE tests are the verification: realized error
against exact answers, and the merge identities that make sketches the
100 TB path (union of per-partition sketches == sketch of the whole).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.sketches import (
    LG_CONFIG_K,
    daily_distinct_sketches,
    distinct_rollup,
    value_quantile_sketches,
)
from high_throughput_etl_pipeline_spark.queries import _t

SF = "/root/testdata/sf0.01"


def test_hll_daily_error_within_bound(spark):
    ev = _t(spark, SF, "events")
    rows = distinct_rollup(ev, "user_id", "ts").collect()
    daily = [r for r in rows if r["date"] != "ALL"]
    assert daily, "no daily rows"
    for r in daily:
        err = abs(r["approx_keys"] - r["exact_keys"]) / max(r["exact_keys"], 1)
        assert err <= 0.05, (r["date"], r["approx_keys"], r["exact_keys"])
    # row counts conserved
    assert sum(r["n_rows"] for r in daily) == ev.count()


def test_hll_union_matches_whole_table_sketch(spark):
    """The merge identity: union of daily sketches must estimate the
    SAME value as one sketch built over the whole table — HLL union is
    lossless over sketches of the same configuration."""
    ev = _t(spark, SF, "events")
    all_row = [
        r
        for r in distinct_rollup(ev, "user_id", "ts").collect()
        if r["date"] == "ALL"
    ][0]
    whole = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(LG_CONFIG_K))
        ).alias("e")
    ).first()["e"]
    assert all_row["approx_keys"] == whole
    exact_total = ev.select("user_id").distinct().count()
    err = abs(all_row["approx_keys"] - exact_total) / exact_total
    assert err <= 0.05, (all_row["approx_keys"], exact_total)


def test_hll_sketch_column_is_bounded_size(spark):
    """The entire point: a day's summary is KBs regardless of row count."""
    ev = _t(spark, SF, "events")
    sizes = (
        daily_distinct_sketches(ev)
        .select(F.length("sketch").alias("b"))
        .agg(F.max("b").alias("mx"))
        .first()
    )
    assert sizes["mx"] <= (1 << LG_CONFIG_K) + 64  # ~4 KiB + header


def test_kll_quantiles_rank_error(spark):
    """Each sketched quantile must sit within 2% RANK error of its
    target: the fraction of values below q_hat(p) must be in
    [p - 0.02, p + 0.02] (KLL guarantees ~0.8% at k=200)."""
    ev = _t(spark, SF, "events")
    rows = value_quantile_sketches(ev, "value", "event_type").collect()
    vals_by_grp = {
        r["event_type"]: r["vals"]
        for r in ev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    }
    vals_by_grp["ALL"] = sorted(v for vs in vals_by_grp.values() for v in vs)
    import bisect

    for r in rows:
        vals = vals_by_grp[r["grp"]]
        assert r["n"] == len(vals)
        for p, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
            rank = bisect.bisect_right(vals, r[col]) / len(vals)
            assert p - 0.02 <= rank <= p + 0.02 + 1e-9, (r["grp"], col, rank)


def test_theta_segment_overlap_accuracy_and_identity(spark):
    """Theta estimates vs exact pairwise overlaps (computed by exact
    distinct-join at test scale), plus inclusion-exclusion:
    |A∪B| == |A| + |B| - |A∩B| (exact for theta at this cardinality)."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        segment_overlap,
    )

    ev = _t(spark, SF, "events")
    rows = segment_overlap(ev, "user_id", "event_type").collect()
    assert rows, "no segment pairs"
    users = {
        r["event_type"]: set(r["us"])
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    for r in rows:
        A, B = users[r["seg_a"]], users[r["seg_b"]]
        for est, exact in (
            (r["union_est"], len(A | B)),
            (r["intersect_est"], len(A & B)),
            (r["a_only_est"], len(A - B)),
        ):
            err = abs(est - exact) / max(exact, 1)
            assert err <= 0.05, (r["seg_a"], r["seg_b"], est, exact)
        incl_excl = r["exact_a"] + r["exact_b"] - r["intersect_est"]
        assert abs(r["union_est"] - incl_excl) / r["union_est"] <= 0.05


def test_verified_wrappers_bind_estimates(spark):
    """The tolerance-bound wrappers emit engine-portable exacts plus
    booleans, every boolean TRUE at realized sketch accuracy — and the
    binding is LIVE: an impossible tolerance flips booleans false, so a
    drifting estimate cannot pass the driver hash."""
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        distinct_rollup_verified,
        quantile_ranks_verified,
        segment_overlap_verified,
    )

    ev = _t(spark, SF, "events")

    dr = distinct_rollup_verified(ev, "user_id", "ts").collect()
    assert {r["date"] for r in dr} >= {"ALL"}
    assert all(r["within_tol"] for r in dr)
    assert all(r["exact_keys"] is not None for r in dr)  # ALL row bound too

    qr = quantile_ranks_verified(ev, "value", "event_type").collect()
    assert {r["grp"] for r in qr} >= {"ALL"}
    for r in qr:
        assert r["r50_ok"] and r["r90_ok"] and r["r99_ok"], r

    so = segment_overlap_verified(ev, "user_id", "event_type").collect()
    assert so
    for r in so:
        assert r["union_ok"] and r["intersect_ok"] and r["diff_ok"], r
        assert (
            r["exact_union"]
            == r["exact_a"] + r["exact_b"] - r["exact_intersect"]
        )

    # negative control: tol < 0 is unsatisfiable -> booleans go false
    neg = distinct_rollup_verified(ev, "user_id", "ts", tol=-1.0).collect()
    assert not any(r["within_tol"] for r in neg)
