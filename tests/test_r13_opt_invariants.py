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
