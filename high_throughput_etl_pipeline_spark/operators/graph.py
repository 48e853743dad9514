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


def _pin_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """Pre-shuffle a STATIC relation once by the key its per-round
    join/groupBy uses, and ``persist`` the result.

    Why persist and not the repo's usual ``localCheckpoint``: each
    round of an iterative operator cuts lineage with a checkpoint, so
    when the consumer's action finally runs, every round materializes
    as its OWN QueryExecution — AQE's exchange/stage reuse never sees
    two rounds at once, and the static edge relation re-shuffles every
    round (profiled r13: ``supplier_part_sssp`` shuffled its 7.8 MB
    edge list 12× in one run).  A checkpointed frame cannot fix this:
    its ``Scan ExistingRDD`` reports ``UnknownPartitioning`` under
    AQE, so the next round plans a fresh Exchange anyway.  An
    ``InMemoryRelation`` DOES expose the cached plan's
    ``hashpartitioning``, so every later QueryExecution plans the join
    with NO Exchange on this side — the in-session analog of a
    bucketed table (guide §2.4), which is exactly what a persistent
    deployment of these operators would use on disk.

    The partition count is SIZE-DERIVED (guide §2: make partitioning
    scale-adaptive, never a constant tuned for one regime): Catalyst's
    optimized-plan size estimate over a ~64 MB advisory target, capped
    at ``spark.sql.shuffle.partitions``.  A cached plan's partitioning
    is exempt from AQE coalescing, so pinning the full shuffle count
    onto a small relation would force every later round to run
    shuffle-partition-count near-empty tasks (measured: the 6-round
    SSSP's per-round jobs went 13 → 65 tasks); at warehouse scale the
    estimate saturates the cap and the pin IS the shuffle width.  The
    other (per-round, dynamic) side's ENSURE_REQUIREMENTS exchange
    aligns to the cached count.  Default storage level
    (MEMORY_AND_DISK) spills cleanly when the edge list outgrows
    executor storage.  Callers whose loop runs driver-side actions
    unpersist after the loop; lazy operators leave the blocks to the
    session's cache release (the bench clears caches between queries).
    """
    try:
        cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # non-numeric conf (e.g. "auto" on some AQE platforms) — fall
        # back to cluster parallelism rather than raising in every
        # pinned operator (r13 ADVICE)
        cap = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # 1 MB advisory at the SMALL end only: the pinned relation's
        # per-round consumers are CPU-bound join+agg stages, and a 64 MB
        # advisory collapsed a 5.7 MB edge cache to ONE partition,
        # serializing every hits_int half-step (measured).  Anything
        # non-tiny saturates the cap, so the advisory never shapes the
        # at-scale width — the (production-configured) shuffle partition
        # count does.
        n = max(1, min(cap, (est + (1 << 20) - 1) >> 20))
    except Exception:  # stats unavailable (e.g. plan shapes w/o estimates)
        n = cap
    return df.repartition(n, *cols).persist()


def _star_components(
    adj: DataFrame, max_iter: int = 64, nodes: DataFrame | None = None
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the O(log² n)-round algorithm that handles ADVERSARIAL topologies
    (long chains, high-diameter meshes) where min-label propagation's
    O(diameter) rounds are unaffordable.

    State is a directed edge set (child, parent) with child > parent.
    Each half-round: for every node ``u``, ``m = min(Γ(u) ∪ {u})``;
    large-star rewires u's LARGER neighbors to m (keeps small-to-large
    chains shrinking), small-star rewires the smaller-or-equal ones.
    Every half-round is one groupBy-min plus one keyed join — the same
    shuffle shape as a propagation round, so the 100 TB cost model is
    identical per round and the round COUNT is what improves.

    At the fixpoint every component is a star rooted at its minimum
    node; labels read directly off the edges.  Input ``adj`` must be
    self-loop-free canonical pairs (src > dst).  ``nodes`` (one ``node``
    column) overrides the output node universe — callers whose original
    edge list had self-loop-only nodes pass it so those nodes still get
    labeled (as their own singleton component).
    """
    # LAZY checkpoints throughout the loop (r14, the bfs_layers fold):
    # each full large+small round ends in the signature collect below,
    # and that one action materializes every pending checkpoint block
    # in ONE job — the previous eager cuts ran one materialization job
    # per half-round plus the collect (3 driver round-trips per round;
    # profiled r14: customer_golden_record spent 8.2 s of its 15.2 s
    # wall in driver gaps across 86 tiny jobs, guide §5 driver).
    # Shared references inside one round (both union branches of the
    # large-star, m's two consumers in the small-star) point at the
    # same RDD, so nothing computes twice.
    e = adj.localCheckpoint(eager=False)
    # fixpoint detector: (count, hash-sum) of the canonical edge set.
    # decimal(38,0) so a billions-of-edges sum cannot wrap into a
    # false fixpoint.
    sig_cols = [
        F.count(F.lit(1)),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
    ]
    prev_sig = None
    for i in range(max_iter):
        if i % 2 == 0:
            # LARGE-STAR: per node u over its FULL neighborhood,
            # m = min(Γ(u) ∪ {u}); rewire every larger neighbor to m
            both = e.union(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            m = both.groupBy("src").agg(
                F.least(F.min("dst"), F.first("src")).alias("_m")
            )
            e = (
                both.join(m, on="src")
                .filter(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            )
        else:
            # SMALL-STAR: per node u over its SMALLER neighbors Γ⁻(u)
            # (exactly the (src=u, dst) edges of the canonical set),
            # m = min(Γ⁻(u)); rewire them all to m AND link u itself
            m = e.groupBy("src").agg(F.min("dst").alias("_m"))
            rewired = (
                e.join(m, on="src")
                .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            )
            e = rewired.union(
                m.select(F.col("src"), F.col("_m").alias("dst"))
            )
        e = (
            e.filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        if i % 2 == 1:  # compare after each full large+small pair
            # this collect materializes both half-rounds' checkpoints
            sig = tuple(e.agg(*sig_cols).collect()[0])
            if sig == prev_sig:
                break
            prev_sig = sig
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in {max_iter} rounds"
        )
    if nodes is None:
        nodes = (
            adj.select(F.col("src").alias("node"))
            .union(adj.select(F.col("dst").alias("node")))
            .distinct()
        )
    labels = e.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    )
    return nodes.join(labels, on="node", how="left").select(
        "node",
        F.coalesce("component", F.col("node")).alias("component"),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """Label every node of the undirected graph with its component id.

    ``edges`` is any DataFrame with two node-id columns (long-castable);
    duplicate and self edges are tolerated.  Returns (node, component)
    with one row per distinct node appearing in the edge list; isolated
    nodes never appear in ``edges`` and are the caller's responsibility
    (left-join and coalesce to the node's own id).

    ``algorithm``: ``"minlabel"`` — O(diameter) min-label propagation,
    the right trade for real near-dup graphs (dense clumps, diameter
    2-4); ``"star"`` — alternating large-star/small-star, O(log² n)
    rounds, for adversarial/high-diameter graphs; ``"auto"`` (default) —
    propagate up to ``max_iter`` rounds, and if the labeling has not
    converged (a long-chain topology), AUTO-SWITCH to large-star/
    small-star seeded with the propagated labels (label edges connect
    nodes already proven same-component, so seeding preserves components
    while collapsing every already-propagated region to depth 1).

    Raises ``RuntimeError`` only when ``algorithm="minlabel"`` exhausts
    ``max_iter`` (a correct labeling must be a fixpoint).
    """
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(f"algorithm must be auto|minlabel|star: {algorithm!r}")
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # materialize the edge list ONCE before the undirected union: both
    # union branches reference `edges`, and when the pair-generation
    # plan upstream is expensive (banded MinHash + verify) Catalyst may
    # not reuse its exchanges across branches — without this cut the
    # whole pair pipeline runs twice (measured 2x on the cluster query)
    e = e.localCheckpoint(eager=True)
    all_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    canon = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
    )
    if algorithm == "star":
        return _star_components(canon, nodes=all_nodes)
    # undirected: propagate both ways; distinct keeps the adjacency minimal.
    # The distinct leaves the frame hashpartitioned on (src, dst), which
    # does NOT serve the per-round join on src — re-key the persisted
    # copy by src so every propagation round (each its own
    # QueryExecution after the lineage cut) plans no adjacency exchange
    # (see _pin_partitioned)
    adj = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    adj = _pin_partitioned(adj, "src")

    labels = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # LAZY checkpoint + the agg collect below materializes the same
    # blocks in one job instead of two (r14, the bfs_layers fold —
    # guide §5 driver: one action per round, not two)
    labels = labels.localCheckpoint(eager=False)
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
            new_labels = new_labels.localCheckpoint(eager=False)
            new_sum = new_labels.agg(label_total).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                return labels
            prev_sum = new_sum
    finally:
        adj.unpersist()
    if algorithm == "auto":
        # AUTO-SWITCH: a topology min-label cannot afford (diameter >
        # max_iter).  Seed large-star/small-star with the original edges
        # PLUS the partially-propagated label edges — every label edge
        # links nodes already proven same-component, so components are
        # unchanged while each already-propagated region collapses to
        # depth 1, giving the star rounds a head start.
        seed = canon.union(
            labels.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("src"),
                F.col("component").alias("dst"),
            )
        ).distinct()
        return _star_components(seed, nodes=all_nodes)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph has a longer chain than expected — raise max_iter or "
        "switch to algorithm='star' (large-star/small-star)"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "auto",
) -> DataFrame:
    """Cluster near-dup pairs: (node, cluster_id) with cluster_id = the
    minimum doc id of the component.  Keep-policy 'lowest id wins' falls
    out directly: keep rows where node == cluster_id.  ``algorithm``
    passes through to :func:`connected_components` — callers that KNOW
    their graph is high-diameter (e.g. sequential-name match chains)
    skip the 25 wasted min-label rounds by asking for ``"star"``."""
    cc = connected_components(pairs, src=id_a, dst=id_b, algorithm=algorithm)
    return cc.select(F.col("node"), F.col("component").alias("cluster_id"))


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    Rank is carried as bigint micro-units (``scale`` total mass /
    node at start) and every update is integer: per-edge contribution
    ``rank div outdeg``, then ``rank' = ((100-d)·(scale div N)) div
    100 + (d · Σ contrib) div 100``.  Floor division leaks a
    deterministic ulp of mass per step — the price for a result that
    is bit-identical on ANY engine (bigint sums are order-independent;
    float power iteration is not), which is what makes an iterative
    graph metric value-checkable against an independent SQL replay.

    Scale shape: the adjacency (src, dst, outdeg) is built once and
    lineage-pinned; each of the ``iterations`` rounds is ONE keyed
    join (state × adjacency on src) + ONE groupBy(dst) — the same
    per-round cost as :func:`connected_components`, state is two long
    columns.  ``localCheckpoint`` per round truncates lineage.

    Sink nodes (no out-edges) would silently lose their mass, so they
    raise up front — undirected graphs (caller supplies both edge
    directions) satisfy this trivially; for directed graphs add
    self-loops or trim sinks first.  Multi-edges count once each
    (pre-``distinct`` the edge list if that is not intended).

    Output: (id, rank) — rank in integer micro-units.
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    # pin the edge list once — it feeds nodes (twice via the union),
    # deg, the sink check, and the adjacency build; without a cut the
    # caller's edge derivation (typically distinct over a fact table)
    # recomputes in every one of those subtrees (profiled r13:
    # supplier_part_pagerank re-ran the lineitem distinct ~8x).  The
    # pin is now a _s-partitioned persist, not a checkpoint: each
    # round's lineage cut makes the rounds separate QueryExecutions,
    # so only a cached hashpartitioning lets them skip the adjacency
    # exchange (see _pin_partitioned); deg (grouped on _s) and the adj
    # build (join on _s) become exchange-free for the same reason.
    e = _pin_partitioned(e, "_s")
    # nodes/adj keep their derived hashpartitioning only if THEY are
    # cached too — a checkpoint here would erase it to
    # UnknownPartitioning and put the per-round exchanges back
    nodes = (
        e.select(F.col("_s").alias("id"))
        .union(e.select(F.col("_d").alias("id")))
        .distinct()
        .persist()
    )
    deg = e.groupBy(F.col("_s").alias("id")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    sinks = nodes.join(deg, on="id", how="left_anti").count()
    if sinks:
        raise ValueError(
            f"pagerank_int: {sinks} sink node(s) with no out-edges — "
            "their mass would silently drain; supply both directions "
            "(undirected), add self-loops, or trim sinks"
        )
    n = nodes.count()
    r_init = scale // n
    base = ((100 - damping_pct) * r_init) // 100
    adj = e.join(deg, on=F.col("_s") == F.col("id")).select(
        F.col("_s"), F.col("_d"), F.col("_outdeg")
    ).persist()
    state = nodes.select("id", F.lit(r_init).cast("bigint").alias("rank"))
    for _ in range(iterations):
        # NOTE: unlike hits_int, state here is NOT broadcast — these
        # rounds are fully lazy (no per-round action), so Spark
        # pipelines the chained shuffle joins into one job; forcing a
        # broadcast would materialize every round's state to build the
        # table and serialize the rounds (measured 10.8 s -> 18.8 s at
        # sf1).  hits_int broadcasts because its max-rescale collect
        # already forces per-round materialization.
        contrib = (
            adj.join(state, on=F.col("_s") == F.col("id"))
            .select(
                F.col("_d").alias("id"),
                F.expr("rank div _outdeg").alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_c"))
        )
        state = (
            nodes.join(contrib, on="id", how="left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(_c, 0L)) div 100"
                    )
                ).cast("bigint").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return state


def label_propagation(
    seeds: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    id_col: str = "id",
    label_col: str = "label",
    src_col: str = "src",
    dst_col: str = "dst",
    max_label: int = 1023,
) -> DataFrame:
    """Semi-supervised sticky label propagation over a similarity graph
    — the weak-supervision step that turns a small labeled seed set
    into corpus-scale labels by spreading through near-neighbor edges.

    ``seeds``: (id, label) with label NULL for unlabeled nodes.
    ``edges``: directed rows; supply both directions for an undirected
    graph.  Each round, every still-unlabeled node takes the MODE of
    its currently-labeled neighbors' labels (ties → smallest label);
    once assigned, a label is STICKY — first reach wins, like BFS
    layering.  Sticky semantics make the result independent of
    execution order and expressible as a fixed unrolled replay (an
    engine-checkable iterative algorithm, same discipline as
    :func:`pagerank_int`); classic re-flipping LPA is order-chaotic.

    Labels must be small non-negative ints (≤ ``max_label``): the mode
    argmax rides ONE ``max_by`` with the composite integer key
    ``count·(max_label+1) − label`` — no window, no second shuffle.
    Each round is one keyed join + one grouped vote; lineage cut per
    round.  Output: (id, label) — NULL = never reached.
    """
    state = seeds.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lbl")
    ).localCheckpoint(eager=False)
    # the edge list joins into EVERY round — pin it once (it may be an
    # expensive derivation, e.g. an LSH candidate pipeline), pre-shuffled
    # by the per-round join key so the rounds' separate QueryExecutions
    # plan no edge exchange (see _pin_partitioned)
    e = _pin_partitioned(
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")),
        "_s",
    )
    k = max_label + 1
    for _ in range(rounds):
        votes = (
            e.join(
                state.filter(F.col("_lbl").isNotNull()),
                on=F.col("_s") == F.col("_id"),
            )
            .groupBy(F.col("_d"), F.col("_lbl").alias("_vl"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        best = votes.groupBy("_d").agg(
            F.expr(f"max_by(_vl, _c * {k} - _vl)").alias("_bl")
        )
        state = (
            state.join(best, on=F.col("_id") == F.col("_d"), how="left")
            .select(
                "_id", F.coalesce("_lbl", "_bl").alias("_lbl")
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        F.col("_id").alias(id_col), F.col("_lbl").alias(label_col)
    )


def triangle_stats(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph given as CANONICAL unique edges (``a < b``,
    one row per edge — violations raise, silent dedup would hide a
    modeling bug upstream).

    Triangles via DEGREE-ORDERED orientation (the canonical
    distributed algorithm — Cohen '09 / Suri-Vassilvitskii '11):
    every edge is directed from its lower-(degree, id) endpoint to the
    higher, each triangle then has exactly ONE source vertex (its
    minimum under that order) and is counted once as two out-edges
    ``u→v, u→w`` closed by the oriented edge ``v→w``.  The wedge
    enumeration costs Σ out-deg² where orientation bounds out-degree
    by O(√m) — on a near-complete 1000-node graph that is ~500× less
    work than the naive low→high-id orientation (Σ deg² ≈ 10⁹ paths),
    and it is what survives hub nodes at scale.  Still two keyed
    equi-joins + one broadcast of the (node, degree) table.

    Output (one row, all exact integers except the 6-dp ratio):
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering)
    where global_clustering = 3·triangles / wedges (wedges = over ALL
    vertices, Σ deg·(deg−1)/2 — the orientation changes the work, not
    the statistic).
    """
    # the edge list is consumed by four downstream passes (canonical
    # check, degrees, orientation, closing join) and may itself be an
    # expensive derivation (an LSH candidate pipeline) — pin it once;
    # the canonical-check count below materializes the blocks
    e = edges.select(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).localCheckpoint(eager=False)
    bad = e.filter(F.col("_a") >= F.col("_b")).count()
    if bad:
        raise ValueError(
            f"triangle_stats: {bad} edge(s) not in canonical a < b "
            "form (self-loops or reversed) — canonicalize and dedup "
            "first; silently fixing here would mask upstream bugs"
        )
    deg = (
        e.select(F.col("_a").alias("_v"))
        .unionAll(e.select(F.col("_b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    ).localCheckpoint(eager=False)
    counts = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum("_d") / 2).cast("bigint").alias("n_edges"),
        F.sum(
            F.col("_d").cast("decimal(38,0)") * (F.col("_d") - 1) / 2
        )
        .cast("decimal(38,0)")
        .alias("_wedges"),
    )
    # orient each edge from its lower-(degree, id) endpoint: attach
    # both endpoint degrees (two broadcast joins against the tiny
    # degree table), then flip where needed
    da = deg.select(F.col("_v").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_v").alias("_b"), F.col("_d").alias("_db"))
    keyed = e.join(F.broadcast(da), on="_a").join(
        F.broadcast(db), on="_b"
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(a_first, F.col("_b")).otherwise(F.col("_a")).alias("_w"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dw"),
    ).localCheckpoint(eager=False)
    # out-neighbor pairs of each source u, ordered by (deg, id) so the
    # closing edge's orientation is known to be v→w
    e1 = oriented.select(
        F.col("_u"), F.col("_w").alias("_v"), F.col("_dw").alias("_dv")
    )
    e2 = oriented.select("_u", "_w", "_dw")
    v_first = (F.col("_dv") < F.col("_dw")) | (
        (F.col("_dv") == F.col("_dw")) & (F.col("_v") < F.col("_w"))
    )
    wedges = (
        e1.join(e2, on="_u")
        .filter(v_first)
        .select(F.col("_v").alias("_u"), F.col("_w"))
    )
    tri = wedges.join(
        oriented.select("_u", "_w"), on=["_u", "_w"]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return (
        counts.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("_wedges").cast("bigint").alias("n_wedges"),
            "n_triangles",
            F.when(
                F.col("_wedges") > 0,
                F.round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("_wedges").cast("double"),
                    6,
                ),
            ).alias("global_clustering"),
        )
    )


def ancestor_closure(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_rounds: int = 20,
) -> DataFrame:
    """(id, root, depth) for every node of a FOREST given as
    (id, parent) rows — parent NULL marks a root.  The recursive-CTE
    workload (org charts, BOM explosions, category trees, thread
    reply chains) Spark SQL cannot express natively.

    Algorithm: pointer doubling (path halving).  State per node is its
    currently-known ancestor pointer and the step distance to it;
    roots self-loop at distance 0.  Each round composes the pointer
    with itself — ``anc ← anc(anc)``, ``d ← d + d(anc)`` — so the
    reached ancestor distance DOUBLES per round: O(log depth) keyed
    self-joins total, not O(depth) — ``max_rounds`` hops handle any
    depth up to ``2^max_rounds`` (a 1M-deep chain needs 20).  Each
    round is one shuffle join on the pointer key; state is three long
    columns; ``localCheckpoint`` truncates lineage per round like
    :func:`connected_components`.  Convergence is ONE metadata-scale
    anti-join count per round (pointers not yet at a root).  Bad data
    fails LOUDLY, never silently: a parent id that is not itself a
    node raises up front (an inner hop join would otherwise drop the
    row), and a parent cycle never reaches a root so it surfaces as
    ``max_rounds`` exhaustion → ValueError.
    """
    ids = nodes.select(F.col(id_col).alias("_pid"))
    dangling = (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(F.col(parent_col).alias("_pid"))
        .join(ids, on="_pid", how="left_anti")
        .count()
    )
    if dangling:
        raise ValueError(
            f"ancestor_closure: {dangling} parent reference(s) point at "
            "ids that are not nodes — the closure would silently drop "
            "those subtrees; repair the forest first"
        )
    state = nodes.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("_anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("_d"),
    ).localCheckpoint(eager=False)
    roots = nodes.filter(F.col(parent_col).isNull()).select(
        F.col(id_col).alias("_anc")
    )

    def _remaining() -> int:
        # pointers not yet aimed at a root — one anti-join count
        return state.join(
            F.broadcast(roots), on="_anc", how="left_anti"
        ).count()

    done = _remaining() == 0
    for _ in range(max_rounds):
        if done:
            break
        hop = state.select(
            F.col("_id").alias("_anc"),
            F.col("_anc").alias("_anc2"),
            F.col("_d").alias("_d2"),
        )
        state = (
            state.join(hop, on="_anc")
            .select(
                "_id",
                F.col("_anc2").alias("_anc"),
                (F.col("_d") + F.col("_d2")).alias("_d"),
            )
            .localCheckpoint(eager=False)
        )
        done = _remaining() == 0
    if not done:
        raise ValueError(
            f"ancestor_closure did not converge in {max_rounds} rounds — "
            f"a parent cycle or depth > 2^{max_rounds}; fix the data or "
            "raise max_rounds"
        )
    return state.select(
        F.col("_id").alias(id_col),
        F.col("_anc").alias("root"),
        F.col("_d").cast("int").alias("depth"),
    )


def hits_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    scale: int = 10**6,
    broadcast_state: bool = True,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg '99) in EXACT integer
    arithmetic over a directed edge list: authority(d) = Σ hub(s) over
    in-edges, hub(s) = Σ authority(d) over out-edges, renormalized
    each half-step so the max score is exactly ``scale``.

    Exactness discipline (the :func:`pagerank_int` convention): scores
    are bigint micro-units; the rescale ``x·scale div max`` runs in
    decimal(38,0) (HUGEINT in a SQL oracle) so nothing overflows at any
    degree, and every sum is integer — order-independent, so the whole
    iteration replays bit-for-bit in an independent engine.  The only
    driver-side value per half-step is the max (one scalar collect).

    Scale shape: each half-step is one keyed equi-join (state ×
    edges) + one groupBy — shuffle on the edge keys, state is one long
    column per node.  ``localCheckpoint`` per round truncates lineage.
    Sums run in decimal(38,0), so hot nodes (degree × scale past
    int64) stay exact.

    Output: ``(id, kind, score)`` with kind ∈ {'hub', 'authority'} —
    a node that appears on both sides gets a row per role.

    ``broadcast_state`` (default True) broadcasts the node-score frame
    into each half-step join, turning two edge shuffles per half-step
    into ONE groupBy shuffle (measured ~2× on the sf1 bipartite
    graph).  State is |V|-grain — two longs per node, so the broadcast
    holds to ~10⁸ nodes; pass False beyond that and the joins fall
    back to keyed shuffles.
    """
    dec = "decimal(38,0)"

    def _st(df):
        return F.broadcast(df) if broadcast_state else df
    ee = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    # With the state broadcast, the only per-half-step shuffle left is
    # the grouped sum over the edge-scale join output.  A broadcast
    # join PRESERVES the streamed side's partitioning, so pre-shuffling
    # the static edge list by each half-step's GROUP key (authority
    # step groups by _d, hub step by _s — guide §2.4) makes every
    # grouped sum exchange-free: 2×iterations edge-scale shuffles → 2
    # one-time ones.  persist, not localCheckpoint: a checkpointed scan
    # reports UnknownPartitioning (see _pin_partitioned).  Cut lineage
    # ONCE before the two pins so an expensive caller edge derivation
    # computes once, not once per pinned copy (r13 ADVICE).
    ee = ee.localCheckpoint(eager=False)
    e_by_d = _pin_partitioned(ee, "_d")
    e_by_s = _pin_partitioned(ee, "_s")
    # distinct over _s on the _s-partitioned copy is exchange-free too
    hubs = e_by_s.select(F.col("_s").alias("id")).distinct()
    h = hubs.select(
        "id", F.lit(scale).cast("bigint").alias("_h")
    ).localCheckpoint(eager=False)
    a = None
    for _ in range(iterations):
        # pin the raw sums BEFORE the max collect: the collect
        # materializes the checkpoint, so the rescale projection reads
        # the same blocks instead of recomputing the join+agg
        a_raw = (
            e_by_d.join(_st(h), on=F.col("_s") == F.col("id"))
            .groupBy(F.col("_d").alias("id"))
            .agg(F.sum(F.col("_h").cast(dec)).alias("_raw"))
            .localCheckpoint(eager=False)
        )
        am = a_raw.agg(F.max("_raw")).collect()[0][0]
        a = a_raw.select(
            "id",
            F.expr(f"CAST(_raw * {scale} div CAST('{am}' AS {dec}) "
                   "AS BIGINT)").alias("_a"),
        )
        h_raw = (
            e_by_s.join(_st(a), on=F.col("_d") == F.col("id"))
            .groupBy(F.col("_s").alias("id"))
            .agg(F.sum(F.col("_a").cast(dec)).alias("_raw"))
            .localCheckpoint(eager=False)
        )
        hm = h_raw.agg(F.max("_raw")).collect()[0][0]
        h = h_raw.select(
            "id",
            F.expr(f"CAST(_raw * {scale} div CAST('{hm}' AS {dec}) "
                   "AS BIGINT)").alias("_h"),
        )
    # the loop's collects materialized every checkpoint, so the
    # returned frame reads only checkpoint blocks — the edge caches
    # can go now instead of waiting for the session-level cache sweep
    e_by_d.unpersist(False)
    e_by_s.unpersist(False)
    return h.select(
        "id", F.lit("hub").alias("kind"), F.col("_h").alias("score")
    ).unionAll(
        a.select(
            "id",
            F.lit("authority").alias("kind"),
            F.col("_a").alias("score"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman '02): the Pearson
    correlation between the degrees at the two ends of every edge.
    Positive ⇒ hubs link to hubs; negative ⇒ hub-and-spoke.  The
    caller supplies the edge list with BOTH directions for an
    undirected graph (the standard symmetric estimator).

    Exactness: degrees are integers, so all five correlation sums
    (Σjk, Σj, Σk, Σj², Σk²) accumulate in decimal(38,0) (HUGEINT in a
    SQL oracle); the numerator M·Σjk − Σj·Σk is exact, and doubles
    enter only in the final sqrt/division — fixed term order both
    engines.  Output is one row: (m_edges, sum_jk, assortativity).

    Scale shape: one degree groupBy, two broadcast-or-shuffle joins to
    annotate endpoints, one global agg — no iteration, no window.
    """
    dec = "decimal(38,0)"
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    deg = (
        e.groupBy(F.col("_s").alias("id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint(eager=False)
    )
    # out-degree of the directed list == undirected degree when both
    # directions are present
    ann = (
        e.join(deg.select(F.col("id").alias("_s"),
                          F.col("deg").alias("_j")), on="_s")
        .join(deg.select(F.col("id").alias("_d"),
                         F.col("deg").alias("_k")), on="_d")
    )
    s = ann.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum((F.col("_j").cast(dec) * F.col("_k").cast(dec))).alias("sjk"),
        F.sum(F.col("_j").cast(dec)).alias("sj"),
        F.sum(F.col("_k").cast(dec)).alias("sk"),
        F.sum((F.col("_j").cast(dec) * F.col("_j").cast(dec))).alias("sjj"),
        F.sum((F.col("_k").cast(dec) * F.col("_k").cast(dec))).alias("skk"),
    )
    num = (F.col("m") * F.col("sjk") - F.col("sj") * F.col("sk")).cast(
        "double"
    )
    t1 = (F.col("m") * F.col("sjj") - F.col("sj") * F.col("sj")).cast(
        "double"
    )
    t2 = (F.col("m") * F.col("skk") - F.col("sk") * F.col("sk")).cast(
        "double"
    )
    return s.select(
        F.col("m").cast("bigint").alias("m_edges"),
        F.col("sjk").cast("double").alias("sum_jk"),
        F.when(
            (t1 > 0) & (t2 > 0),
            F.round(num / (F.sqrt(t1) * F.sqrt(t2)), 6),
        ).alias("assortativity"),
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "a",
    dst_col: str = "b",
    max_rounds: int = 64,
) -> DataFrame:
    """k-core of an undirected graph (Seidman '83) by iterative
    peeling: drop every node with degree < k, recompute, repeat to
    fixpoint.  The surviving induced subgraph is the cohesion skeleton
    — in a dedup/linkage candidate graph it separates dense duplicate
    blobs from accidental chains (a chain has an empty 2-core).

    Pass each undirected edge ONCE (``src < dst``); the operator
    symmetrizes internally.  Output: ``(id, core_degree)`` — nodes of
    the k-core with their degree inside the core.

    Determinism: peeling is confluent — the fixpoint is unique
    regardless of removal order — and every step is integer degree
    arithmetic, so a SQL oracle replays it exactly with enough
    unrolled rounds (extra rounds past fixpoint are no-ops).  Rounds
    to converge are bounded by the peel depth (longest degeneracy
    cascade), not data volume; each round is one degree groupBy + two
    semi-joins, lineage cut per round.  Raises if ``max_rounds`` pass
    without convergence (the check runs AFTER the hop so the bound is
    the documented one).
    """
    sym = (
        edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("_a"), F.col(src_col).alias("_b")
            )
        )
        .localCheckpoint(eager=False)
    )
    rounds = 0
    while True:
        deg = sym.groupBy("_a").agg(F.count(F.lit(1)).alias("_deg"))
        dropped = deg.filter(F.col("_deg") < k).count()
        rounds += 1
        if dropped == 0:
            break
        if rounds > max_rounds:
            raise RuntimeError(
                f"k_core: no fixpoint after {max_rounds} peel rounds"
            )
        keep = (
            deg.filter(F.col("_deg") >= k)
            .select(F.col("_a").alias("_id"))
            .localCheckpoint(eager=False)
        )
        sym = (
            sym.join(keep, on=F.col("_a") == F.col("_id"), how="left_semi")
            .join(keep, on=F.col("_b") == F.col("_id"), how="left_semi")
            .localCheckpoint(eager=False)
        )
    return sym.groupBy(F.col("_a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def sssp_bounded(
    edges: DataFrame,
    source: DataFrame,
    rounds: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Single-source shortest paths on a typed bipartite graph by
    ROUND-BOUNDED Bellman-Ford — ``rounds`` synchronous relaxations,
    so the result is exact for every node within ``rounds`` hops of
    the source (the classic bounded-horizon SSSP: at 100 TB you cap
    the horizon, not the data).

    ``edges`` is (s, p, w) with integer weights — distances stay on
    the exact integer lattice, so any engine replaying the same
    relaxation rounds agrees bit-for-bit.  ``source`` is a one-or-few
    row frame (kind, id, dist) seeding the frontier; ``carry_cols``
    are extra key columns (e.g. a source-id column for multi-source
    runs) carried through every relaxation — the state becomes one
    row per (*carry_cols, kind, id).

    Each round is two keyed equi-joins (frontier × edges on the
    frontier's OWN side) + one grouped min — never a cartesian,
    never a global sort; ``localCheckpoint`` cuts lineage so the plan
    does not double per round.  The edge side carries a SHUFFLE_HASH
    hint: letting AQE broadcast the edge table 2×rounds times
    accumulates driver-built broadcasts faster than GC reclaims them
    (observed OOM at sf1 on round 5 of 6) — and at real graph scale
    the edge table must shuffle anyway, so the hint pins the plan
    that survives both regimes.  Unreached nodes simply never appear.

    Output: (kind, id, dist) — the tentative-final distance table.
    """
    # the edge list is STATIC across rounds but each round's lineage
    # cut makes the rounds separate QueryExecutions, so a plain
    # checkpoint re-shuffles it twice per round (profiled: 12 × 7.8 MB
    # edge exchanges in the 6-round supplier query).  Pre-shuffle it
    # once per join side instead (guide §2.4 — the bucketed-join
    # shape); the per-round exchanges that remain carry only the
    # frontier.  Cut lineage ONCE before the two pins: each pin is its
    # own persist, and without the shared cut an expensive caller edge
    # derivation (e.g. a distinct over a fact table) would compute
    # twice, once per pinned copy (r13 ADVICE).
    edges = edges.localCheckpoint(eager=False)
    es = _pin_partitioned(edges, "s").hint("shuffle_hash")
    ep = _pin_partitioned(edges, "p").hint("shuffle_hash")
    carry = [F.col(f"d.{c}").alias(c) for c in carry_cols]
    dist = source
    for _ in range(rounds):
        ds = dist.filter(F.col("kind") == "s").alias("d")
        dp = dist.filter(F.col("kind") == "p").alias("d")
        nxt_p = ds.join(es.alias("e"), F.col("d.id") == F.col("e.s")).select(
            *carry,
            F.lit("p").alias("kind"),
            F.col("e.p").alias("id"),
            (F.col("d.dist") + F.col("e.w")).alias("dist"),
        )
        nxt_s = dp.join(ep.alias("e"), F.col("d.id") == F.col("e.p")).select(
            *carry,
            F.lit("s").alias("kind"),
            F.col("e.s").alias("id"),
            (F.col("d.dist") + F.col("e.w")).alias("dist"),
        )
        dist = (
            dist.unionByName(nxt_p)
            .unionByName(nxt_s)
            .groupBy(*carry_cols, "kind", "id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def betweenness_bounded(
    edges: DataFrame, sources: DataFrame, rounds: int = 6
) -> DataFrame:
    """Bounded-horizon Brandes betweenness from a small source set —
    the sampled/bounded approximation every large-graph system ships
    (exact Brandes is one BFS per node; at 100 TB you bound BOTH the
    source sample and the horizon).  Contributions are EXACT for every
    shortest path of length ≤ ``rounds`` starting at a source.

    ``edges`` is an undirected (u, v) pair list over STRING node ids
    (callers namespace bipartite sides, e.g. ``'s:'||suppkey``);
    ``sources`` is a one-column (src) frame, typically a handful of
    rows.

    Forward pass: strict level-synchronous BFS carrying the source
    column — layer k+1 = neighbors of layer k not yet visited, with
    path counts σ summed per (src, node); σ stays on the exact integer
    lattice, so both engines agree bit-for-bit.  Backward pass
    (Brandes' dependency accumulation δ(v) = Σ_w σv/σw · (1 + δw)):
    each per-successor term is rounded to the 1e9 integer lattice
    BEFORE the cross-row sum (grouped float sums have no deterministic
    order; integer sums are exact), so δ — and the final betweenness —
    is hash-checkable against an unrolled SQL replay.

    Every round is one keyed equi-join + one grouped sum (frontiers
    key on (src, node), never all-pairs); ``localCheckpoint`` cuts
    lineage per round; the edge list carries the same SHUFFLE_HASH
    hint as :func:`sssp_bounded` (repeated AQE broadcasts of the edge
    side accumulate driver memory faster than GC reclaims it).

    Returns (node, bc_int): the 1e9-lattice betweenness sum over all
    sources, source nodes excluded (layer-0 δ is the classic
    "dependency of s on itself" and is not betweenness mass).
    """
    if rounds < 2:
        # the backward pass accumulates from layer rounds-1 down to 1;
        # with rounds < 2 there is no layer to accumulate and the fold
        # below would index an empty list — fail loudly (the kmeans
        # seed-contract precedent) rather than return a frame whose
        # semantics differ from every other horizon
        raise ValueError(
            f"betweenness_bounded needs rounds >= 2, got {rounds}"
        )
    # every forward round AND every backward round joins the
    # symmetrized edge list on u; pre-shuffle it once by u (persist,
    # not checkpoint — see _pin_partitioned) so the 2×rounds per-round
    # QueryExecutions plan no edge exchange
    ed = _pin_partitioned(
        edges.select(F.col("u"), F.col("v")).unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ),
        "u",
    ).hint("shuffle_hash")
    layer = sources.select(
        F.col("src"),
        F.col("src").alias("node"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint(eager=False)
    visited = layer.select("src", "node")
    layers = [layer]
    for _ in range(rounds):
        cand = (
            layer.join(ed, layer["node"] == ed["u"])
            .groupBy("src", F.col("v").alias("node2"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("node2", "node")
        )
        layer = cand.join(
            visited, ["src", "node"], "left_anti"
        ).localCheckpoint(eager=False)
        visited = visited.unionByName(
            layer.select("src", "node")
        ).localCheckpoint(eager=False)
        layers.append(layer)
    # delta carries (src, node, sigma, delta_int): while computing layer
    # k it holds layer k+1's state, so the successor lookup is ONE join
    delta = layers[rounds].select(
        "src", "node", "sigma", F.lit(0).cast("bigint").alias("delta_int")
    )
    acc = []
    for k in range(rounds - 1, -1, -1):
        lk = layers[k].alias("lv")
        succ = (
            lk.join(ed.alias("e"), F.col("lv.node") == F.col("e.u"))
            .join(
                delta.alias("dw"),
                (F.col("dw.src") == F.col("lv.src"))
                & (F.col("dw.node") == F.col("e.v")),
            )
            .select(
                F.col("lv.src").alias("src"),
                F.col("lv.node").alias("node"),
                F.round(
                    F.col("lv.sigma").cast("double")
                    / F.col("dw.sigma").cast("double")
                    * (
                        F.lit(1.0)
                        + F.col("dw.delta_int").cast("double") / 1e9
                    )
                    * 1e9,
                    0,
                )
                .cast("bigint")
                .alias("term"),
            )
            .groupBy("src", "node")
            .agg(F.sum("term").alias("dsum"))
        )
        delta = (
            layers[k]
            .join(succ, ["src", "node"], "left")
            .select(
                "src",
                "node",
                "sigma",
                F.coalesce(F.col("dsum"), F.lit(0))
                .cast("bigint")
                .alias("delta_int"),
            )
            .localCheckpoint(eager=False)
        )
        if k >= 1:
            acc.append(delta)
    out = acc[0].select("src", "node", "delta_int")
    for d in acc[1:]:
        out = out.unionByName(d.select("src", "node", "delta_int"))
    return out.groupBy("node").agg(
        F.sum("delta_int").cast("bigint").alias("bc_int")
    )
