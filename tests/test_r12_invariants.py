"""Mathematical invariants of the r12 analytics queries.

The oracle hash gate proves Spark ≡ DuckDB; these tests prove both
engines compute the STATISTIC the docstring claims (an agreeing pair of
engines can still share a semantic bug — the part_xyz_classification
Y/Z boundary caught by the r11 advice is exactly that class).  Each
invariant is a property of the estimator itself, checked on real
sf0.01 data.
"""

from __future__ import annotations

import pytest

from high_throughput_etl_pipeline_spark.queries import QUERIES
from tests.conftest import SF_CORRECT


def rows(spark, name):
    return QUERIES[name](spark, SF_CORRECT).collect()


def test_benford_shares_and_chi2_are_consistent(spark):
    out = rows(spark, "orders_benford_first_digit")
    assert [r["digit"] for r in out] == list(range(1, 10))
    # Benford ppm column is the exact driver-side table and sums to 1e6
    assert sum(r["benford_ppm"] for r in out) == 1_000_000
    # observed shares are half-up ppm of the same N, so they sum to
    # 1e6 within rounding slack (one half-up per digit)
    assert abs(sum(r["observed_ppm"] for r in out) - 1_000_000) <= 9
    # chi-square terms are non-negative by construction
    assert all(r["chi2_term_micros"] >= 0 for r in out)


def test_autocorr_is_bounded_and_lag_complete(spark):
    out = rows(spark, "events_autocorr_daily")
    assert [r["lag"] for r in out] == list(range(1, 8))
    # |r_k| <= 1 (Cauchy-Schwarz on the shared denominator), in micros
    assert all(abs(r["autocorr_micros"]) <= 1_000_000 for r in out)
    # n_pairs decreases by exactly 1 per extra lag on a gapless series
    diffs = {
        out[i]["n_pairs"] - out[i + 1]["n_pairs"]
        for i in range(len(out) - 1)
    }
    assert diffs == {1}


def test_spearman_rho_is_bounded(spark):
    out = rows(spark, "lineitem_spearman_price_qty")
    assert len(out) == 3  # one row per return flag
    assert all(-1.0 <= r["spearman_rho"] <= 1.0 for r in out)


def test_cusum_peak_is_within_scaled_total(spark):
    out = rows(spark, "events_cusum_drift")
    for r in out:
        # |m*P_t - t*S| <= m*S for all t (P_t <= S and t <= m)
        assert 0 <= r["peak_dev_scaled"] <= r["n_days"] * r["n_events"]
        assert 0 <= r["drift_ppm"] <= 1_000_000


def test_ndcg_is_bounded_and_dcg_matches_hits(spark):
    out = rows(spark, "ranker_ndcg_eval")
    assert len(out) == 20
    for r in out:
        assert 0 <= r["ndcg_micros"] <= 1_000_000
        assert 0 <= r["rel_at_10"] <= min(r["n_rel"], 10)
        # dcg is at most rel_at_10 gains of the top weight (1e9 at r=1)
        assert r["dcg_nanos"] <= r["rel_at_10"] * 1_000_000_000
        # a fully-relevant top 10 IS the ideal ranking: ndcg == 1 exactly
        if r["n_rel"] >= 10 and r["rel_at_10"] == 10:
            assert r["ndcg_micros"] == 1_000_000


def test_mad_is_at_most_range_and_median_in_range(spark):
    out = rows(spark, "part_brand_price_mad")
    assert len(out) == 25
    for r in out:
        assert r["median_x2_cents"] > 0
        assert r["mad_x4_cents"] >= 0


def test_fano_horizon_bounds_presence(spark):
    out = rows(spark, "events_fano_burstiness")
    for r in out:
        assert 0 < r["n_present"] <= r["horizon_hours"]
        # variance >= 0 always; micros lattice keeps it >= 0
        assert r["fano_micros"] >= 0


def test_simpson_lambda_is_a_probability(spark):
    out = rows(spark, "corpus_simpson_diversity")
    assert len(out) == 20
    assert all(0 <= r["simpson_lambda_ppm"] <= 1_000_000 for r in out)


def test_cohort_retention_month_zero_is_total(spark):
    out = rows(spark, "customer_cohort_retention")
    by_cohort = {}
    for r in out:
        by_cohort.setdefault((r["cohort_year"], r["cohort_month"]), {})[
            r["months_since"]
        ] = r
    for k, m in by_cohort.items():
        # k=0 exists for every cohort and retains 100% by definition
        assert 0 in m, f"cohort {k} missing month-0 row"
        assert m[0]["n_active"] == m[0]["cohort_size"]
        assert m[0]["retention_ppm"] == 1_000_000
        # retention never exceeds 100%
        assert all(r["retention_ppm"] <= 1_000_000 for r in m.values())


def test_weekday_seasonality_shares_sum_to_one(spark):
    out = rows(spark, "orders_weekday_seasonality")
    assert sorted(r["iso_weekday"] for r in out) == list(range(1, 8))
    assert abs(sum(r["revenue_share_ppm"] for r in out) - 1_000_000) <= 7
    # the revenue-share-weighted... index averages ~1 over days by
    # construction: n-weighted mean of (s/n)/(ts/tn) is exactly 1
    tot_n = sum(r["n_orders"] for r in out)
    wmean = (
        sum(r["seasonality_index_micros"] * r["n_orders"] for r in out)
        / tot_n
    )
    assert abs(wmean - 1_000_000) < 50  # micros rounding slack


def test_lift_deciles_monotone_gains_and_final_values(spark):
    out = rows(spark, "classifier_lift_deciles")
    assert [r["decile"] for r in out] == list(range(10))
    gains = [r["cum_gain_ppm"] for r in out]
    assert gains == sorted(gains)  # cumulative capture is monotone
    assert gains[-1] == 1_000_000  # all positives captured at decile 9
    # final cumulative lift is exactly 1 (cp=tp, cn=tn)
    assert out[-1]["cum_lift_micros"] == 1_000_000


def test_chao1_at_least_observed_richness(spark):
    out = rows(spark, "corpus_chao1_richness")
    for r in out:
        assert r["chao1_micros"] >= r["n_types"] * 1_000_000
        assert r["f1"] + 2 * r["f2"] <= r["n_tokens"]


def test_winsorized_mean_sits_between_clip_bounds(spark):
    out = rows(spark, "events_winsorized_mean")
    for r in out:
        lo_micros = r["lo_x20_cents"] * 1_000_000 // 20
        hi_micros = -((-r["hi_x20_cents"] * 1_000_000) // 20)
        assert lo_micros - 1 <= r["winsorized_mean_micros"] <= hi_micros + 1
        assert r["lo_x20_cents"] <= r["hi_x20_cents"]


def test_kendall_tau_is_bounded(spark):
    out = rows(spark, "events_kendall_tau_hour_value")
    for r in out:
        assert -1.0 <= r["tau_b"] <= 1.0
        # concordant+discordant pairs cannot exceed n(n-1)/2
        n0 = r["n"] * (r["n"] - 1) // 2
        assert r["concordant"] + r["discordant"] <= n0
