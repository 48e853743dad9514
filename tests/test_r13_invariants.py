"""Mathematical invariants of the r13 analytics queries.

Same contract as test_r12_invariants: the oracle hash gate proves
Spark ≡ DuckDB; these prove both engines compute the STATISTIC the
docstring claims (two agreeing engines can still share a semantic bug).
Two of the tests go further and replay the estimator brute-force in
Python on collected sf0.01 data — the Gini midrank algebra and the
Theil–Sen pairwise median are exactly the shapes where a shared
algebraic slip would hide.
"""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.queries import QUERIES, _t
from tests.conftest import SF_CORRECT


def rows(spark, name):
    return QUERIES[name](spark, SF_CORRECT).collect()


def test_ship_lag_order_statistics_are_consistent(spark):
    out = rows(spark, "lineitem_ship_lag_profile")
    assert len(out) == 3  # one row per return flag
    for r in out:
        assert r["n_items"] > 0
        assert r["min_days"] <= r["max_days"]
        # median and mean both live inside [min, max]
        assert 2 * r["min_days"] <= r["median_x2_days"] <= 2 * r["max_days"]
        assert (
            1_000_000 * r["min_days"]
            <= r["mean_days_micros"]
            <= 1_000_000 * r["max_days"]
        )


def test_order_gap_stats_are_consistent(spark):
    out = rows(spark, "customer_order_gap_stats")
    assert len(out) == 5  # one row per market segment
    for r in out:
        assert r["n_gaps"] > 0
        assert r["min_days"] >= 0  # window order makes gaps non-negative
        assert 2 * r["min_days"] <= r["median_x2_days"] <= 2 * r["max_days"]
        assert (
            1_000_000 * r["min_days"]
            <= r["mean_days_micros"]
            <= 1_000_000 * r["max_days"]
        )


def test_theil_sen_matches_bruteforce_python(spark):
    out = {r["event_type"]: r for r in rows(spark, "events_theil_sen_trend")}
    for r in out.values():
        # every (earlier, later) day pair contributes exactly one slope
        assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    # brute-force replay for one type: daily counts -> pairwise lattice
    # slopes -> doubled exact median
    ev = (
        _t(spark, SF_CORRECT, "events")
        .groupBy(F.col("event_type"), F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    typ = sorted({r["event_type"] for r in ev})[0]
    series = sorted(
        (r["day"], r["count"]) for r in ev if r["event_type"] == typ
    )
    d0 = series[0][0]
    pts = [((d - d0).days, x) for d, x in series]
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dt, dx = pts[j][0] - pts[i][0], pts[j][1] - pts[i][1]
            q, sgn = abs(dx), 1 if dx >= 0 else -1
            slopes.append(sgn * ((2_000_000 * q + dt) // (2 * dt)))
    expect = round(2 * statistics.median(slopes))
    assert out[typ]["sen_slope_x2_micros"] == expect


def test_affinity_grid_is_complete_and_mass_conserving(spark):
    out = rows(spark, "part_brand_type_affinity")
    brands = {r["brand"] for r in out}
    words = {r["type_word"] for r in out}
    assert len(out) == len(brands) * len(words)  # full grid, zeros included
    assert all(r["lift_ppm"] >= 0 for r in out)
    # an absent cell has zero lift by the half-up lattice (num term is 0)
    assert all(r["lift_ppm"] == 0 for r in out if r["n_parts"] == 0)
    # total part mass equals the catalog
    n_parts = _t(spark, SF_CORRECT, "part").count()
    assert sum(r["n_parts"] for r in out) == n_parts


def test_gini_matches_bruteforce_python(spark):
    out = {r["mktsegment"]: r for r in rows(spark, "customer_revenue_gini")}
    assert all(0 <= r["gini_ppm"] < 1_000_000 for r in out.values())
    # brute-force replay for one segment: per-customer revenue (zeros for
    # customers without orders), ascending sort, textbook rank formula
    c = _t(spark, SF_CORRECT, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, SF_CORRECT, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100, 0).alias("cents")
    )
    seg = sorted(out)[0]
    per_cust = {
        r["c_custkey"]: 0
        for r in c.filter(F.col("c_mktsegment") == seg).collect()
    }
    for r in o.collect():
        if r["o_custkey"] in per_cust:
            per_cust[r["o_custkey"]] += int(r["cents"])
    xs = sorted(per_cust.values())
    n, s = len(xs), sum(xs)
    twoix = 2 * sum(i * x for i, x in enumerate(xs, start=1))
    num = twoix - (n + 1) * s
    expect = (2_000_000 * num + n * s) // (2 * n * s)
    assert out[seg]["n_customers"] == n
    assert out[seg]["total_cents"] == s
    assert out[seg]["gini_ppm"] == expect


def test_sentence_profile_bounds(spark):
    out = rows(spark, "doc_sentence_length_profile")
    assert len(out) > 0
    for r in out:
        assert r["n_sentences"] > 0
        # a kept sentence has at least one non-empty token
        assert r["median_x2_words"] >= 2
        assert 1_000_000 <= r["mean_words_micros"] <= 1_000_000 * r["max_words"]
        assert r["median_x2_words"] <= 2 * r["max_words"]


def test_changepoint_split_is_interior_and_gain_is_a_ratio(spark):
    out = rows(spark, "events_changepoint_binseg")
    assert len(out) > 0
    for r in out:
        assert r["n_days_left"] >= 1 and r["n_days_right"] >= 1
        # explained-variance fraction is a probability (ppm)
        assert 0 <= r["gain_ratio_ppm"] <= 1_000_000
        assert r["mean_left_micros"] > 0 and r["mean_right_micros"] > 0
