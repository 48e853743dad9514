"""Partition-invariance pins for the r13 optimization round.

The r13 optimizations changed operator INTERNALS (guarded
hash-repartitions before heavy map stages, a lineage cut on the shared
MinHash band index, the array_intersect verify in prefix filtering)
without changing what any operator computes.  These tests pin exactly
that: results must be identical regardless of input partitioning and of
row arrival order — the two things the optimizations touch.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_prefix_filter_verify_is_row_order_independent(spark):
    """The array_intersect verify builds per-doc token arrays with
    collect_list (nondeterministic order); intersections must not
    depend on token arrival order or input partitioning."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [
        (1, t) for t in ["a", "b", "c", "d", "e"]
    ] + [
        (2, t) for t in ["f", "d", "c", "b", "a"]
    ] + [
        (3, t) for t in ["e", "d", "c", "b", "a"]
    ] + [(4, "x"), (4, "y"), (4, "z"), (5, "w"), (5, "x"), (5, "y")]

    def run(df):
        return sorted(
            (r["id_a"], r["id_b"], r["intersection"], r["jaccard"])
            for r in prefix_filter_pairs(
                df, "doc_id", "tok", t_num=3, t_den=5
            ).collect()
        )

    one = spark.createDataFrame(rows, "doc_id bigint, tok string").coalesce(1)
    many = (
        spark.createDataFrame(list(reversed(rows)), "doc_id bigint, tok string")
        .repartition(7, F.col("tok"))
    )
    got_one, got_many = run(one), run(many)
    assert got_one == got_many
    assert (1, 3, 5, 1.0) in got_one  # identical sets survive verify


def test_minhash_band_pipeline_is_partition_invariant(spark):
    """jaccard_pairs_via_minhash (guarded hash-repartition + banded
    checkpoint) must return the same pairs for a 1-partition input and
    a many-partition input."""
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        jaccard_pairs_via_minhash,
    )

    docs = [
        (i, "the quick brown fox jumps over the lazy dog number %d" % (i % 3))
        for i in range(30)
    ]

    def run(df):
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_pairs_via_minhash(
                df, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
            ).collect()
        )

    one = spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(1)
    many = spark.createDataFrame(docs, "doc_id bigint, text string").repartition(5)
    got_one, got_many = run(one), run(many)
    assert got_one == got_many
    assert got_one  # near-dup triples exist by construction


def test_pinned_iterative_operators_are_partition_invariant(spark):
    """The wave-3 static-relation pins (_pin_partitioned: pre-shuffled
    persisted edge copies replacing per-round checkpoints) re-key the
    edge list by the round join key; results must be identical for any
    input layout, and identical to a direct hand replay."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        hits_int,
        pagerank_int,
        sssp_bounded,
    )

    edges = [(i % 7 + 1, (i * 3) % 11 + 100) for i in range(40)]

    def runs(make):
        one = spark.createDataFrame(
            edges, "src bigint, dst bigint"
        ).coalesce(1)
        many = spark.createDataFrame(
            list(reversed(edges)), "src bigint, dst bigint"
        ).repartition(9)
        return make(one), make(many)

    # hits: (id, kind, score) rows equal across layouts
    h1, h2 = runs(
        lambda e: sorted(map(tuple, hits_int(e, iterations=3).collect()))
    )
    assert h1 == h2 and h1

    # pagerank over the symmetrized list (no sinks)
    def pr(e):
        und = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return sorted(map(tuple, pagerank_int(und, iterations=3).collect()))

    p1, p2 = runs(pr)
    assert p1 == p2 and p1

    # sssp: seed at supplier 1, unit weights, 3 rounds
    def sp(e):
        w = e.select(
            F.col("src").alias("s"),
            F.col("dst").alias("p"),
            F.lit(1).cast("bigint").alias("w"),
        )
        src = spark.createDataFrame(
            [("s", 1, 0)], "kind string, id bigint, dist bigint"
        )
        return sorted(map(tuple, sssp_bounded(w, src, rounds=3).collect()))

    s1, s2 = runs(sp)
    assert s1 == s2 and s1


def test_kcenter_single_collect_matches_direct_replay(spark):
    """kcenter_greedy now reads the coverage radius² off the SAME
    TakeOrdered(1) row that picks the next center; the radius must
    still equal the true max of the running min-distance column."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        kcenter_greedy,
    )

    pts = [(i, [float(i % 4), float((i * i) % 5)]) for i in range(12)]
    df = spark.createDataFrame(pts, "vec_id bigint, embedding array<double>")
    centers = kcenter_greedy(df, "vec_id", "embedding", k=3, scale=10)

    # direct NumPy-free replay of Gonzalez on the same integer lattice
    q = {i: (round(v[0] * 10), round(v[1] * 10)) for i, v in pts}
    cid = min(q)
    mind = {
        i: (q[i][0] - q[cid][0]) ** 2 + (q[i][1] - q[cid][1]) ** 2
        for i in q
    }
    expect = []
    for rank in range(1, 4):
        radius = max(mind.values())
        expect.append((rank, cid, radius))
        if rank == 3:
            break
        cid = min(i for i in q if mind[i] == radius)
        mind = {
            i: min(
                mind[i],
                (q[i][0] - q[cid][0]) ** 2 + (q[i][1] - q[cid][1]) ** 2,
            )
            for i in q
        }
    assert centers == expect


def test_scatter_cells_is_partition_invariant(spark):
    """scatter_cells (guarded hash-repartition before the products
    pass) must return identical cells/means for any input layout."""
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        scatter_cells,
    )

    rows = [([float(i % 5), float(-i % 7), float(i) / 3],) for i in range(40)]
    one = spark.createDataFrame(rows, "embedding array<double>").coalesce(1)
    many = spark.createDataFrame(rows, "embedding array<double>").repartition(6)
    c1, n1, m1 = scatter_cells(one, "embedding", dim=3, scale=1000)
    c2, n2, m2 = scatter_cells(many, "embedding", dim=3, scale=1000)
    assert (sorted(c1), n1, m1) == (sorted(c2), n2, m2)
    assert n1 == 40 and len(c1) == 6  # d(d+1)/2 upper-triangle cells
