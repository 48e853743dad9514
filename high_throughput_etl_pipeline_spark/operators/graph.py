"""Connected components over a pair list — dedup cluster formation.

Near-duplicate detection (MinHash/LSH, SimHash, Jaccard — ``dedup.py``)
emits *pairs*; corpus dedup needs *clusters* (keep one doc per component
of the similarity graph).  This operator turns an edge DataFrame into a
(node, component) labeling where ``component`` is the minimum node id
reachable — the canonical cluster representative.

Algorithm: iterative min-label propagation.  Each round every node takes
the min label over itself and its neighbors; convergence in O(graph
diameter) rounds.  Near-dup similarity graphs are dense clumps with tiny
diameters (docs similar to each other are mostly pairwise-linked), so in
practice this converges in 2-4 rounds.  Each round is one shuffle join +
one groupBy — both keyed on node id, never all-pairs.

Scale notes (100 TB corpus, billions of edges):
- the adjacency list is persisted once and reused every round; labels —
  the only iterating state — are two long columns, a few GB per billion
  nodes;
- ``localCheckpoint`` after every round truncates the lineage so the
  plan does not grow with iteration count (classic iterative-algorithm
  trap: round k re-derives rounds 1..k-1);
- for adversarial long-chain graphs (diameter ≫ 10) the
  alternating large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) converges in
  O(log² n) rounds with the same per-round join shape; the propagation
  loop below is the simple special case that wins on real dedup graphs.

Reference parity: the reference pipeline has no graph stage (its dedup
is key-equality only); this extends SURVEY §2.6 dedup to the cluster
granularity an LLM-corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph with its component id.

    ``edges`` is any DataFrame with two node-id columns (long-castable);
    duplicate and self edges are tolerated.  Returns (node, component)
    with one row per distinct node appearing in the edge list; isolated
    nodes never appear in ``edges`` and are the caller's responsibility
    (left-join and coalesce to the node's own id).

    Raises ``RuntimeError`` if the labeling has not converged after
    ``max_iter`` rounds (a correct labeling must be a fixpoint).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # materialize the edge list ONCE before the undirected union: both
    # union branches reference `edges`, and when the pair-generation
    # plan upstream is expensive (banded MinHash + verify) Catalyst may
    # not reuse its exchanges across branches — without this cut the
    # whole pair pipeline runs twice (measured 2x on the cluster query)
    e = e.localCheckpoint(eager=True)
    # undirected: propagate both ways; distinct keeps the adjacency minimal
    adj = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    adj = adj.persist()

    labels = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    # labels only ever decrease, so the labeling changed iff the total
    # dropped — convergence is one cheap agg on the checkpointed result,
    # not a join against the previous round.  Sum in DECIMAL(38,0): a
    # bigint sum over billions of 64-bit ids can wrap in non-ANSI mode,
    # and a wrapped sum could in principle fake sum-equality at a
    # non-fixpoint.
    label_total = F.sum(F.col("component").cast("decimal(38,0)"))
    prev_sum = labels.agg(label_total).collect()[0][0]

    try:
        for _ in range(max_iter):
            # each neighbor offers its current label; min over self + offers
            offers = adj.join(
                labels, adj.src == labels.node, "inner"
            ).select(F.col("dst").alias("node"), "component")
            new_labels = (
                labels.unionByName(offers)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            new_labels = new_labels.localCheckpoint(eager=True)
            new_sum = new_labels.agg(label_total).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                return labels
            prev_sum = new_sum
    finally:
        adj.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph has a longer chain than expected — raise max_iter or "
        "switch to large-star/small-star"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs: (node, cluster_id) with cluster_id = the
    minimum doc id of the component.  Keep-policy 'lowest id wins' falls
    out directly: keep rows where node == cluster_id."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(F.col("node"), F.col("component").alias("cluster_id"))
