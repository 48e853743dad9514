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


def test_triangle_clustering_matches_bruteforce_python(spark):
    out = rows(spark, "supplier_triangle_clustering")
    assert 0 < len(out) <= 25
    # brute-force replay: same capped co-supply graph, same w>=2
    # sparsifier, triangles counted per node over Python sets
    ps = (
        _t(spark, SF_CORRECT, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_part = {}
    for r in ps:
        by_part.setdefault(r["l_partkey"], []).append(r["l_suppkey"])
    from collections import Counter

    wcount = Counter()
    for supps in by_part.values():
        supps = sorted(supps)[:8]
        for i in range(len(supps)):
            for j in range(i + 1, len(supps)):
                wcount[(supps[i], supps[j])] += 1
    adj = {}
    for (u, v), w in wcount.items():
        if w >= 2:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    tri = Counter()
    for u, nbrs in adj.items():
        for v in nbrs:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    for node in (u, v, w):
                        tri[node] += 1
    scored = sorted(
        (
            (-tri[s], s, len(nbrs), tri[s])
            for s, nbrs in adj.items()
            if len(nbrs) >= 2
        ),
    )[:25]
    assert len(out) == len(scored)
    for row, (_, supp, d, t) in zip(out, scored):
        assert row["suppkey"] == supp
        assert row["degree"] == d
        assert row["n_triangles"] == t
        den = d * (d - 1)
        assert row["local_cc_ppm"] == (2_000_000 * 2 * t + den) // (2 * den)


def test_durbin_watson_matches_float_replay(spark):
    out = {r["event_type"]: r for r in rows(spark, "events_durbin_watson")}
    assert out
    ev = (
        _t(spark, SF_CORRECT, "events")
        .groupBy(F.col("event_type"), F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append((r["day"], r["count"]))
    for typ, r in out.items():
        pts = sorted(series[typ])
        d0 = pts[0][0]
        t = [(d - d0).days for d, _ in pts]
        y = [float(x) for _, x in pts]
        n = len(t)
        assert r["n_days"] == n
        st1, st2 = sum(t), sum(ti * ti for ti in t)
        sy, sty = sum(y), sum(ti * yi for ti, yi in zip(t, y))
        det = n * st2 - st1 * st1
        b = (n * sty - st1 * sy) / det
        a = (sy * st2 - st1 * sty) / det
        e = [yi - a - b * ti for ti, yi in zip(t, y)]
        num = sum(
            (e[i] - e[i - 1]) ** 2
            for i in range(1, n)
            if t[i] == t[i - 1] + 1
        )
        den = sum(ei * ei for ei in e)
        assert den > 0
        dw = num / den
        assert 0.0 <= dw <= 4.0
        assert abs(dw - r["dw_micros"] / 1e6) < 1e-5
        assert abs(b - r["slope_nano"] / 1e9) < 1e-4


def test_wilcoxon_matches_bruteforce_python(spark):
    out = {
        r["event_type"]: r
        for r in rows(spark, "events_wilcoxon_signed_rank")
    }
    assert out
    ev = _t(spark, SF_CORRECT, "events").select(
        "event_type",
        (F.weekday(F.col("ts").cast("date")) * 24 + F.hour("ts")).alias(
            "how"
        ),
        F.datediff(
            F.col("ts").cast("date"),
            F.lit(
                _t(spark, SF_CORRECT, "events")
                .agg(F.min(F.col("ts").cast("date")))
                .collect()[0][0]
            ),
        ).alias("k"),
    ).collect()
    from collections import Counter

    a_cnt, b_cnt = Counter(), Counter()
    for r in ev:
        if 0 <= r["k"] <= 13:
            a_cnt[(r["event_type"], r["how"])] += 1
        elif 14 <= r["k"] <= 27:
            b_cnt[(r["event_type"], r["how"])] += 1
    for typ, r in out.items():
        keys = {k for t, k in a_cnt if t == typ} | {
            k for t, k in b_cnt if t == typ
        }
        diffs = [
            a_cnt[(typ, k)] - b_cnt[(typ, k)]
            for k in keys
            if a_cnt[(typ, k)] != b_cnt[(typ, k)]
        ]
        n = len(diffs)
        assert r["n_pairs"] == n
        # doubled midranks over |d|
        srt = sorted(abs(d) for d in diffs)
        rank2 = {}
        i = 0
        while i < len(srt):
            j = i
            while j < len(srt) and srt[j] == srt[i]:
                j += 1
            rank2[srt[i]] = (i + 1) + j  # 2 * midrank = (i+1) + j
            i = j
        w2 = sum(rank2[abs(d)] for d in diffs if d > 0)
        assert r["w_doubled"] == w2
        t3 = 0
        for v in set(srt):
            c = srt.count(v)
            t3 += c * c * c - c
        den = 2 * n * (n + 1) * (2 * n + 1) - t3
        num = 2 * w2 - n * (n + 1)
        assert r["shift_sign"] == (1 if num > 0 else -1 if num < 0 else 0)
        assert r["z2_micros"] == (2_000_000 * 3 * num * num + den) // (
            2 * den
        )


def test_gamma_matches_bruteforce_python(spark):
    out = rows(spark, "lineitem_gamma_ordinal")
    assert len(out) == 1
    r = out[0]
    cells = (
        _t(spark, SF_CORRECT, "lineitem")
        .groupBy(
            F.round("l_quantity", 0).cast("bigint").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("y"),
        )
        .count()
        .collect()
    )
    cs = [(c["x"], c["y"], c["count"]) for c in cells]
    C = D = 0
    for x1, y1, n1 in cs:
        for x2, y2, n2 in cs:
            if x2 > x1:
                if y2 > y1:
                    C += n1 * n2
                elif y2 < y1:
                    D += n1 * n2
    from collections import Counter

    mx, my = Counter(), Counter()
    for x, y, n in cs:
        mx[x] += n
        my[y] += n
    t_x = (sum(v * v for v in mx.values()) - sum(
        n * n for _, _, n in cs
    )) // 2
    t_y = (sum(v * v for v in my.values()) - sum(
        n * n for _, _, n in cs
    )) // 2
    assert (r["c_pairs"], r["d_pairs"]) == (C, D)
    assert (r["t_x"], r["t_y"]) == (t_x, t_y)
    num, den = C - D, C + D
    sgn = 1 if num >= 0 else -1
    assert r["gamma_ppm"] == sgn * (
        (2_000_000 * abs(num) + den) // (2 * den)
    )
    den2 = C + D + t_y
    assert r["somers_dyx_ppm"] == sgn * (
        (2_000_000 * abs(num) + den2) // (2 * den2)
    )
    assert abs(r["gamma_ppm"]) <= 1_000_000


def test_stump_split_boundaries_are_complete_and_concave(spark):
    out = rows(spark, "lineitem_stump_split")
    assert len(out) == 63  # every interior boundary of the 64 buckets
    n_total = _t(spark, SF_CORRECT, "lineitem").count()
    prev_nl = 0
    for r in out:
        assert 0 < r["n_left"] < n_total
        assert r["n_left"] >= prev_nl  # prefix sums are monotonic
        prev_nl = r["n_left"]
        assert 0 <= r["pos_left"] <= r["n_left"]
        assert 0 <= r["impurity_ppm"] <= 500_000  # Gini of a binary <= 1/2
        # Gini concavity: a split never increases impurity (the shared
        # ppm lattice can round the difference to -1 at most)
        assert r["gain_ppm"] >= -1


def test_rca_matches_bruteforce_python(spark):
    out = rows(spark, "nation_rca_index")
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in _t(spark, SF_CORRECT, "supplier").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in _t(spark, SF_CORRECT, "nation").collect()
    }
    pt = {
        r["p_partkey"]: r["p_type"]
        for r in _t(spark, SF_CORRECT, "part").collect()
    }
    li = (
        _t(spark, SF_CORRECT, "lineitem")
        .select(
            "l_suppkey",
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    from collections import Counter

    x = Counter()
    for r in li:
        x[(nat[sup[r["l_suppkey"]]], pt[r["l_partkey"]])] += r["cents"]
    xn, xt, xa = Counter(), Counter(), 0
    for (n, t), v in x.items():
        xn[n] += v
        xt[t] += v
        xa += v
    expect = []
    for n in sorted(xn):
        scored = sorted(
            (
                -(
                    (2_000_000 * x[(n, t)] * xa + xn[n] * xt[t])
                    // (2 * xn[n] * xt[t])
                ),
                t,
            )
            for t in {t for (nn, t) in x if nn == n}
        )[:3]
        for rank, (neg_rca, t) in enumerate(scored, start=1):
            expect.append((n, rank, t, x[(n, t)], -neg_rca))
    got = [
        (r["nation"], r["rank"], r["ptype"], r["rev_cents"], r["rca_ppm"])
        for r in out
    ]
    assert got == expect


def _daily_counts(spark, typ=None):
    ev = (
        _t(spark, SF_CORRECT, "events")
        .groupBy(F.col("event_type"), F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append((r["day"], r["count"]))
    return {t: sorted(v) for t, v in series.items()}


def test_brown_forsythe_matches_bruteforce_python(spark):
    out = rows(spark, "orders_brown_forsythe")
    assert len(out) == 1
    r = out[0]
    vals = (
        _t(spark, SF_CORRECT, "orders")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("x"),
        )
        .collect()
    )
    groups = {}
    for v in vals:
        groups.setdefault(v["o_orderpriority"], []).append(v["x"])
    sqm = st = qt = nn = 0
    k = len(groups)
    for xs in groups.values():
        xs.sort()
        n = len(xs)
        med2 = (
            2 * xs[n // 2]
            if n % 2
            else xs[n // 2 - 1] + xs[n // 2]
        )
        z2 = [abs(2 * x - med2) for x in xs]
        s, q = sum(z2), sum(z * z for z in z2)
        sqm += (1000 * s * s) // n
        st += s
        qt += q
        nn += n
    ssb = sqm - (1000 * st * st) // nn
    ssw = 1000 * qt - sqm
    assert r["n_orders"] == nn and r["k_groups"] == k
    assert r["ssb_share_ppm"] == (2_000_000 * ssb + (ssb + ssw)) // (
        2 * (ssb + ssw)
    )
    assert r["w_micros"] == (
        2_000_000 * (nn - k) * ssb + (k - 1) * ssw
    ) // (2 * (k - 1) * ssw)


def test_ljung_box_matches_bruteforce_python(spark):
    out = {r["event_type"]: r for r in rows(spark, "events_ljung_box")}
    series = _daily_counts(spark)
    for typ, r in out.items():
        pts = series[typ]
        d0 = pts[0][0]
        by_t = {(d - d0).days: x for d, x in pts}
        n, s = len(by_t), sum(by_t.values())
        c = {t: n * x - s for t, x in by_t.items()}
        den = sum(v * v for v in c.values())
        tsum = n_lags = 0
        for lag in range(1, 8):
            num = sum(
                c[t] * c[t + lag] for t in c if t + lag in c
            )
            pairs = [t for t in c if t + lag in c]
            if not pairs or n - lag <= 0:
                continue
            n_lags += 1
            sgn = 1 if num >= 0 else -1
            r_nano = sgn * (
                (2_000_000_000 * abs(num) + den) // (2 * den)
            )
            tsum += (2 * r_nano * r_nano + (n - lag) * 1_000_000) // (
                2 * (n - lag) * 1_000_000
            )
        assert r["n_days"] == n
        assert r["n_lags"] == n_lags
        assert r["q_micros"] == n * (n + 2) * tsum


def test_moran_i_matches_bruteforce_python(spark):
    out = rows(spark, "nation_moran_i")
    assert len(out) == 1
    r = out[0]
    sup = {
        s["s_suppkey"]: s["s_nationkey"]
        for s in _t(spark, SF_CORRECT, "supplier").collect()
    }
    nreg = {
        n["n_nationkey"]: n["n_regionkey"]
        for n in _t(spark, SF_CORRECT, "nation").collect()
    }
    li = (
        _t(spark, SF_CORRECT, "lineitem")
        .select(
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    from collections import Counter

    tot = Counter()
    for row in li:
        tot[sup[row["l_suppkey"]]] += row["cents"]
    t = {nk: v // 1000 for nk, v in tot.items()}
    N, T = len(t), sum(t.values())
    z = {nk: N * v - T for nk, v in t.items()}
    den = sum(v * v for v in z.values())
    num = w = 0
    for i in z:
        for j in z:
            if i != j and nreg[i] == nreg[j]:
                w += 1
                num += z[i] * z[j]
    assert (r["n_nations"], r["w_pairs"]) == (N, w)
    sgn = 1 if num >= 0 else -1
    assert r["i_micros"] == sgn * (
        (2_000_000 * N * abs(num) + w * den) // (2 * w * den)
    )
    assert r["expected_i_micros"] == -(
        (2_000_000 + (N - 1)) // (2 * (N - 1))
    )


def test_haar_energy_matches_bruteforce_python(spark):
    out = rows(spark, "events_haar_energy")
    series = _daily_counts(spark)
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for typ, rws in by_type.items():
        assert [r["scale_days"] for r in rws] == [1, 2, 4, 8]
        assert [r["n_coeffs"] for r in rws] == [8, 4, 2, 1]
        # shares are a partition of unity on the ppm lattice
        assert abs(sum(r["share_ppm"] for r in rws) - 1_000_000) <= 2
        pts = series[typ]
        d0 = pts[0][0]
        y = [0] * 16
        for d, x in pts:
            tt = (d - d0).days
            if tt < 16:
                y[tt] = x
        for r in rws:
            h = r["scale_days"]
            energy = 0
            for cidx in range(16 // (2 * h)):
                base = cidx * 2 * h
                cv = sum(y[base : base + h]) - sum(
                    y[base + h : base + 2 * h]
                )
                energy += cv * cv
            assert r["energy"] == energy


def test_turning_points_matches_bruteforce_python(spark):
    out = {r["event_type"]: r for r in rows(spark, "events_turning_points")}
    series = _daily_counts(spark)
    for typ, r in out.items():
        pts = series[typ]
        d0 = pts[0][0]
        by_t = {(d - d0).days: x for d, x in pts}
        n = len(by_t)
        tcount = sum(
            1
            for t in by_t
            if t - 1 in by_t
            and t + 1 in by_t
            and (
                (by_t[t] > by_t[t - 1] and by_t[t] > by_t[t + 1])
                or (by_t[t] < by_t[t - 1] and by_t[t] < by_t[t + 1])
            )
        )
        num = 3 * tcount - 2 * (n - 2)
        den = 16 * n - 29
        assert r["n_days"] == n
        assert r["n_turning"] == tcount
        assert r["excess_x3"] == num
        assert r["z2_micros"] == (2_000_000 * 10 * num * num + den) // (
            2 * den
        )


def test_record_highs_matches_bruteforce_python(spark):
    out = {r["event_type"]: r for r in rows(spark, "events_record_highs")}
    series = _daily_counts(spark)
    for typ, r in out.items():
        ys = [x for _, x in series[typ]]
        n = len(ys)
        highs = lows = 0
        for i, v in enumerate(ys):
            if i == 0 or v > max(ys[:i]):
                highs += 1
            if i == 0 or v < min(ys[:i]):
                lows += 1
        assert (r["n_days"], r["n_highs"], r["n_lows"]) == (n, highs, lows)
        assert r["harmonic_micro"] == sum(
            (2_000_000 + k) // (2 * k) for k in range(1, n + 1)
        )
