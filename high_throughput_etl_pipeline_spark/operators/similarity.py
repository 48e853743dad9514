"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline (a broadcast-join + window
— fine whenever |queries| is small).  The scale paths are:

- **LSH (random hyperplanes)**: sign-projection buckets; queries only pair
  with same-bucket vectors.  Hyperplanes are deterministic literals so the
  plan is reproducible (and oracle-checkable).
- **IVF**: k-means coarse quantizer (pyspark.ml), probe the nearest
  ``nprobe`` centroids.  Centroid assignment is a narrow map after a tiny
  broadcast; the candidate set shrinks ~nlist/nprobe-fold.

All dot products run as ``aggregate(zip_with(...))`` higher-order
expressions — JVM-side, no Python.  At 100 TB the embedding table is
bucketed by the LSH/IVF key so repeated queries never reshuffle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    # cast operands (not the product) so float32 inputs multiply in f64 —
    # keeps results bit-comparable with engines computing over DOUBLE[]
    #
    # HOF form, deliberately: A/B measurement showed flat 64-term SQL
    # only TIES the fold on scan-side stages and loses 4x on join-side
    # verify stages (the single big expression cannot method-split over
    # array locals, falls out of codegen, and an interpreted flat tree is
    # slower than the interpreted fold).  Flat SQL wins only for SMALL
    # per-subspace expressions — see pq_encode/_neg2dot_sql.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize: cosine becomes a plain dot product downstream.

    PERF NOTE: prefer precomputing the scalar ``_norm`` column and scoring
    ``dot/(na*nb)`` (as every operator below does).  A per-element
    division lambda re-evaluates any inlined norm aggregate PER ELEMENT
    (higher-order functions run interpreted, outside codegen and common-
    subexpression elimination) — measured 2.4x slower than the scalar-norm
    form.  Kept for callers that genuinely need the unit array itself."""
    df = df.withColumn("_vec_norm", _norm(F.col(vec_col)))
    unit = F.transform(
        F.col(vec_col), lambda x: (x / F.col("_vec_norm")).cast("double")
    )
    return df.withColumn("_unit", unit).drop("_vec_norm")


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding).  Plan: broadcast queries, one pass
    over vectors, per-query top-k via window.  Ties broken by id for
    determinism; similarity rounded to 6 dp so results are stable across
    engines/summation orders.
    """
    v = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    scored = v.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_v"), F.col("_q")) / (F.col("_na") * F.col("_nb")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (numpy, fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]) -> F.Column:
    """Sign-projection bucket id: bit i = 1 iff dot(v, plane_i) > 0."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) > 0, 1 << i)
        .otherwise(0)
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def build_lsh_index(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The one-time linear indexing pass: (id, _v, _na, _bucket).

    Persist this bucketed BY ``_bucket`` (``sources.bucketed.
    write_bucketed(..., ["_bucket"])``) and every subsequent
    ``lsh_topk(..., indexed=True, broadcast_queries=False)`` joins
    against it WITHOUT shuffling the vector table — the scan itself is
    the shuffle.  That is the 100 TB serving shape: the index is written
    once, queries only ever exchange the (small) query side.
    """
    planes = hyperplanes(dim, n_planes, seed)
    return vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    seed: int = 42,
    n_probes: int = 1,
    indexed: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket(s).

    With 2^n_planes buckets the candidate set shrinks ~2^n_planes-fold;
    at 100 TB, store the vector table bucketed by `_bucket`
    (build_lsh_index + write_bucketed) and pass ``indexed=True`` — the
    vector side then joins without any exchange.  ``broadcast_queries=
    False`` switches the probe join to sort-merge for LARGE query sets
    (the bucketed layout makes the vector side exchange-free either way).

    ``n_probes`` > 1 enables multi-probe: each query also searches the
    buckets at Hamming distance 1 (one hyperplane flipped), trading
    n_probes× candidate volume for recall — the standard LSH recall knob
    that avoids adding hash tables (memory) or reducing planes
    (precision).  n_probes caps at n_planes+1 (the bucket itself plus
    every single-bit flip).
    """
    planes = hyperplanes(dim, n_planes, seed)
    if indexed:
        v = vectors.select(id_col, "_v", "_na", "_bucket")
    else:
        v = build_lsh_index(vectors, n_planes, id_col, vec_col, dim, seed)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col)).alias("_nb"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    n_probes = max(1, min(n_probes, n_planes + 1))
    if n_probes > 1:
        # probe 0 = own bucket; probe i = bucket with plane (i-1) flipped
        flips = F.array(
            F.col("_bucket"),
            *[
                F.col("_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_probes - 1)
            ],
        )
        q = q.withColumn("_bucket", F.explode(flips))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = v.join(q_side, on="_bucket").select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_v"), F.col("_q")) / (F.col("_na") * F.col("_nb")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centers: DataFrame | None = None,
    with_list_id: bool = False,
) -> DataFrame:
    """IVF-flat: coarse quantizer, probe the ``nprobe`` nearest lists.

    By default the quantizer is k-means (pyspark.ml) — training samples
    to the driver only ``nlist``-scale statistics, and the assignment
    pass is a broadcast of nlist centroids.  Pass ``centers`` (schema
    ``list_id INT, center ARRAY<DOUBLE>``) to supply the quantizer
    instead — e.g. fixed seed vectors — which makes every stage
    (assignment argmin, probe selection, per-list ranking)
    engine-portable and value-checkable; ``with_list_id`` exposes each
    result's coarse cell so the oracle pins the bucket assignment too.
    """

    if centers is not None:
        centers_df = centers
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = vectors.select(
            array_to_vector(F.col(vec_col)).alias("features")
        )
        km = KMeans(k=nlist, seed=seed, maxIter=10).fit(train)
        fitted = [
            (i, [float(x) for x in c])
            for i, c in enumerate(km.clusterCenters())
        ]
        centers_df = vectors.sparkSession.createDataFrame(
            fitted, "list_id INT, center ARRAY<DOUBLE>"
        )

    v_assigned = _ivf_assign(vectors, centers_df, id_col, vec_col, 1).select(
        id_col, vec_col, "list_id"
    )
    q_probes = _ivf_assign(
        queries, centers_df, query_id_col, vec_col, nprobe
    ).select(query_id_col, F.col(vec_col).alias("_qvec"), "list_id")
    return _ivf_rank(
        v_assigned, q_probes, k, id_col, vec_col, query_id_col, with_list_id
    )


def kmeans_centers_lattice(
    vectors: DataFrame,
    nlist: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Deterministic, engine-replayable Lloyd training for the IVF
    coarse quantizer: vectors quantized to the 1/``scale`` integer
    lattice, init = the first ``nlist`` vectors by id (list_id = id),
    a FIXED number of assignment/update rounds, and centroid updates
    by exact round-half-away integer division (:func:`linalg.
    round_div`) — no float ever enters the recurrence, so an oracle
    can replay training bit-for-bit as ``rounds`` unrolled CTEs.

    Each round is one broadcast-assign pass + one (list, dim) rollup;
    only nlist×dim integer statistics ever reach the driver (the same
    bounded-collect discipline as pyspark.ml's own KMeans).  A list
    that empties in some round is dropped (identically on any engine
    replaying the same rule).  Returns ``list_id INT, center
    ARRAY<DOUBLE>`` ready for :func:`ivf_topk`'s ``centers=``.
    """
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        round_div,
    )

    spark = vectors.sparkSession
    vi = vectors.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * scale, 0).cast("bigint"),
        ).alias("_vi"),
    ).persist()
    init = vi.filter(F.col("_id") < nlist).orderBy("_id").collect()
    if len(init) != nlist:
        # the seed rule is part of the replayable contract (oracles
        # unroll it as `id < nlist`), so a sparse / non-zero-based id
        # space must fail loudly here — silently training with fewer
        # (possibly zero) centers makes ivf_topk/semdedup return empty
        # results with no error anywhere near the cause
        raise ValueError(
            f"kmeans_centers_lattice seeds from ids 0..{nlist - 1} "
            f"(list_id = id, oracle-replayable); found {len(init)} of "
            f"{nlist} seed ids — re-key {id_col!r} to a dense 0-based "
            "id space first"
        )
    centers = [(int(r["_id"]), list(r["_vi"])) for r in init]
    for _ in range(rounds):
        cdf = spark.createDataFrame(
            centers, "list_id INT, c ARRAY<BIGINT>"
        )
        d2 = F.aggregate(
            F.zip_with("_vi", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        # argmin via min_by over struct(_d2, list_id) — same semantics
        # as a rank-1 window (exact integer distance, list_id
        # tie-break) but the aggregation combines map-side right where
        # the broadcast crossJoin produced the 8 candidate rows, so no
        # per-id sort/shuffle of the wide arrays
        assigned = (
            vi.crossJoin(F.broadcast(cdf))
            .withColumn("_d2", d2)
            .groupBy("_id")
            .agg(
                F.min_by(
                    "list_id", F.struct("_d2", "list_id")
                ).alias("list_id"),
                F.first("_vi").alias("_vi"),
            )
        )
        cells = (
            assigned.select(
                "list_id", F.posexplode("_vi").alias("_pos", "_x")
            )
            .groupBy("list_id", "_pos")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        bylist: dict[int, dict[int, tuple[int, int]]] = {}
        for r in cells:
            bylist.setdefault(r["list_id"], {})[r["_pos"]] = (
                int(r["_s"]),
                int(r["_n"]),
            )
        centers = [
            (li, [round_div(s, n) for _p, (s, n) in sorted(d.items())])
            for li, d in sorted(bylist.items())
        ]
    vi.unpersist()
    out = [(li, [x / float(scale) for x in c]) for li, c in centers]
    return spark.createDataFrame(out, "list_id INT, center ARRAY<DOUBLE>")


def semdedup(
    vectors: DataFrame,
    nlist: int = 8,
    rounds: int = 3,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. '23): semantic deduplication by k-means
    clustering + within-cluster cosine pruning.  A vector is PRUNED when
    some lower-id vector in its cluster has cosine ≥ ``tau`` (the
    deterministic "keep earliest" representative rule — no iterative
    component walk, so the prune set is exactly replayable).

    Shape: lattice-Lloyd training (:func:`kmeans_centers_lattice`),
    one broadcast-assign pass, then a per-cluster self-join — the
    cluster IS the blocking key, exactly the paper's trick for never
    materializing corpus² pairs.  ``nlist`` is the scale knob: the
    paper runs k ≈ |corpus|/⟨cluster⟩ (50k clusters on LAION), keeping
    per-cluster pair mass bounded as the corpus grows.

    Returns (id, list_id, n_dup_smaller, keep) per vector.
    """
    centers = kmeans_centers_lattice(
        vectors, nlist=nlist, rounds=rounds, id_col=id_col, vec_col=vec_col
    )
    assigned = _ivf_assign(vectors, centers, id_col, vec_col, 1)
    vu = assigned.select(
        F.col(id_col),
        "list_id",
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
    ).persist()
    a = vu.select(
        "list_id",
        F.col(id_col).alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_na").alias("_nva"),
    )
    b = vu.select(
        "list_id",
        F.col(id_col).alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("_na").alias("_nvb"),
    )
    cos = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_nva") * F.col("_nvb")),
        6,
    )
    close = (
        a.join(b, on="list_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= F.lit(tau))
        .groupBy(F.col("_idb").alias(id_col))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_smaller"))
    )
    return vu.join(close, on=id_col, how="left").select(
        id_col,
        "list_id",
        F.coalesce(F.col("n_dup_smaller"), F.lit(0).cast("bigint")).alias(
            "n_dup_smaller"
        ),
        F.col("n_dup_smaller").isNull().alias("keep"),
    )


def _ivf_assign(
    df: DataFrame,
    centers_df: DataFrame,
    key_col: str,
    vec_col: str,
    n_nearest: int,
) -> DataFrame:
    """Nearest-``n_nearest`` list assignment against broadcast centroids
    (n=1 assigns index vectors; n=nprobe selects a query's probes)."""

    def dist2(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    return (
        df.crossJoin(F.broadcast(centers_df))
        .withColumn("_d2", dist2(F.col(vec_col), F.col("center")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col).orderBy("_d2", "list_id")
            ),
        )
        .filter(F.col("_rn") <= n_nearest)
        .drop("_d2", "_rn", "center")
    )


def _ivf_rank(
    v_assigned: DataFrame,
    q_probes: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    with_list_id: bool,
) -> DataFrame:
    """Per-list cosine scoring + global top-k per query (the probe set
    broadcasts; the list equi-join IS the pruning)."""
    vu = v_assigned.select(
        id_col,
        "list_id",
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    qu = q_probes.select(
        query_id_col,
        "list_id",
        F.col("_qvec").alias("_q"),
        _norm(F.col("_qvec")).alias("_nb"),
    )
    scored = vu.join(F.broadcast(qu), on="list_id").select(
        query_id_col,
        id_col,
        "list_id",
        F.round(
            _dot(F.col("_v"), F.col("_q")) / (F.col("_na") * F.col("_nb")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    out_cols = (
        [query_id_col, id_col, "list_id", "cosine", "rank"]
        if with_list_id
        else [query_id_col, id_col, "cosine", "rank"]
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )


def ivf_write_index(
    vectors: DataFrame,
    path: str,
    centers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a ``list_id``-partitioned parquet
    layout — the serving form of the "equi-join on list_id IS the
    pruning" claim: once the assignment is ON DISK as the partition
    key, a probe's list filter becomes ``PartitionFilters`` at the scan
    and only nprobe/nlist of the index is ever READ (plan-pinned in
    tests/test_plans.py).  Write once, serve many."""
    assigned = _ivf_assign(vectors, centers, id_col, vec_col, 1).select(
        id_col, vec_col, "list_id"
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    with_list_id: bool = False,
) -> DataFrame:
    """Serve IVF top-k from a :func:`ivf_write_index` layout.  The
    probed list ids (≤ queries·nprobe ints — metadata-scale) collect to
    a literal IN-filter on the partition column, so the index scan
    prunes to the probed lists before a single vector is read; scoring
    and ranking are identical to the in-memory path (same helpers), so
    indexed ≡ unindexed results by construction."""
    q_probes = _ivf_assign(
        queries, centers, query_id_col, vec_col, nprobe
    ).select(query_id_col, F.col(vec_col).alias("_qvec"), "list_id")
    probe_ids = sorted(
        r["list_id"] for r in q_probes.select("list_id").distinct().collect()
    )
    index = spark.read.parquet(path).filter(
        F.col("list_id").isin(probe_ids)
    )
    return _ivf_rank(
        index, q_probes, k, id_col, vec_col, query_id_col, with_list_id
    )


def _lloyd_kmeans(x, k: int, iters: int = 8, seed: int = 42):
    """Tiny deterministic Lloyd's k-means (numpy) for PQ codebook
    training on a bounded driver-side sample — the faiss practice:
    codebooks train on a sample, never the full table."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    sample_rows: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split ``dim`` into ``m``
    subspaces, k-means each on a BOUNDED sample (driver-side numpy —
    deterministic, sample_rows caps the collect)."""
    import numpy as np

    sub = dim // m
    # orderBy+limit = TakeOrdered: the sample is the same rows on every
    # run and cluster layout (a bare limit() is partition-order dependent,
    # which would make "deterministic codebooks" a lie on a real cluster)
    sample = np.array(
        [
            r[0]
            for r in vectors.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_rows)
            .select(vec_col)
            .collect()
        ],
        dtype=np.float64,
    )
    books = []
    for i in range(m):
        piece = sample[:, i * sub : (i + 1) * sub]
        books.append(_lloyd_kmeans(piece, ksub, seed=seed + i).tolist())
    return books


def fixed_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """FIXED (data-derived, training-free) PQ codebooks: centroid ``j``
    of subspace ``i`` is the ``i``-th slice of the vector with
    ``id_col == j`` — the PQ analog of ``ann_ivf_topk``'s first-8-vectors
    coarse quantizer.  Because the rule is relational ("slice the first
    ``ksub`` vectors"), a SQL oracle can derive the identical codebooks
    from the same table, making encode → ADC → rank value-checkable end
    to end.  The collect is ``ksub`` rows — metadata-scale."""
    sub = dim // m
    rows = (
        vectors.filter(F.col(id_col) < ksub)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(
            f"fixed_pq_codebooks needs ids 0..{ksub - 1}; got {len(rows)} rows"
        )
    return [
        [
            [float(x) for x in r[1][i * sub : (i + 1) * sub]]
            for r in rows
        ]
        for i in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` sub-codes (nearest sub-centroid per
    subspace) — 64 floats → m bytes, the classic PQ storage shrink.
    Pure Column expressions over codebook literals; no shuffle.

    PERF: the distance sums are UNROLLED into flat arithmetic
    (element_at + subtract + multiply, ``sub`` terms per centroid) —
    m/ksub/sub are plan-time constants, so nothing needs a runtime loop.
    The earlier ``aggregate(zip_with(...))`` form ran interpreted
    (higher-order functions sit outside whole-stage codegen) and
    measured ~20x slower on the same codebooks; the unrolled form
    compiles into codegen arithmetic.  The d2 arrays are materialized in
    their own projection so the argmin's double reference reads a column,
    not a re-evaluated expression tree."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # one SMALL column per (subspace, centroid) score: c·c - 2·x·c, which
    # ranks identically to the true squared distance (the ||x||² term is
    # constant across centroids).  Each column compiles into its own
    # generated method — a single array-of-1024-terms expression exceeds
    # the 64 KB codegen method limit and silently disables whole-stage
    # codegen for the ENTIRE stage (measured 10x slower, interpreted).
    staged = df.selectExpr(
        "*",
        *[
            f"{_neg2dot_sql(vec_col, i * sub, c)} AS _s_{i}_{j}"
            for i in range(m)
            for j, c in enumerate(codebooks[i])
        ],
    )
    # array_position is 1-based; code is 0-based centroid index
    code_terms = []
    for i in range(m):
        refs = ", ".join(f"_s_{i}_{j}" for j in range(len(codebooks[i])))
        code_terms.append(
            f"CAST(array_position(array({refs}), least({refs})) - 1 AS INT)"
        )
    # preserve carry-through columns (e.g. an IVF list assignment); drop
    # the raw vector — shedding the floats is the point of PQ storage
    carry = [c for c in df.columns if c != vec_col]
    return staged.selectExpr(
        *carry, f"array({', '.join(code_terms)}) AS pq_codes"
    )


def _neg2dot_sql(vec_col: str, offset: int, centroid: list[float]) -> str:
    """``c·c - 2·x·c`` over one subspace slice, as flat SQL arithmetic.

    Generated as TEXT and parsed with one ``F.expr`` — building these
    trees out of pyspark Column operators costs one py4j round trip PER
    NODE (measured 14 s of pure driver time for m=8/ksub=16); the text
    form is one parse.  Flat arithmetic (vs ``aggregate(zip_with(...))``)
    stays inside whole-stage codegen — the lambda form runs interpreted,
    ~20x slower per row."""
    c2 = sum(float(x) * float(x) for x in centroid)
    dots = " + ".join(
        f"CAST(element_at({vec_col}, {offset + t + 1}) AS DOUBLE) * ({float(c)!r})"
        for t, c in enumerate(centroid)
    )
    return f"({c2!r} - 2.0 * ({dots}))"


def _sub_norm_sql(vec_col: str, offset: int, sub: int) -> str:
    """``x·x`` over one subspace slice (to recover true squared distance
    from the ``c·c - 2·x·c`` score)."""
    terms = " + ".join(
        f"CAST(element_at({vec_col}, {offset + t + 1}) AS DOUBLE) * "
        f"CAST(element_at({vec_col}, {offset + t + 1}) AS DOUBLE)"
        for t in range(sub)
    )
    return f"({terms})"


def _adc_table_frame(
    queries: DataFrame,
    query_id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(query_id, _adc) — the per-query ADC distance table
    ``array<array<double>>`` (m × ksub): entry [i][j] = true squared
    distance between the query's i-th subspace slice and centroid j,
    assembled as ``x·x + (c·c - 2·x·c)``.  Codebooks are the ONLY
    literals — plan size is O(m·ksub·sub), constant in the number of
    query rows — and each scalar lands in its own staged column so every
    generated method stays under the codegen size limit."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    staged = queries.selectExpr(
        query_id_col,
        *[
            f"{_sub_norm_sql(vec_col, i * sub, sub)} AS _xn_{i}"
            for i in range(m)
        ],
        *[
            f"{_neg2dot_sql(vec_col, i * sub, c)} AS _t_{i}_{j}"
            for i in range(m)
            for j, c in enumerate(codebooks[i])
        ],
    )
    rows = ", ".join(
        "array("
        + ", ".join(
            f"(_xn_{i} + _t_{i}_{j})" for j in range(len(codebooks[i]))
        )
        + ")"
        for i in range(m)
    )
    return staged.selectExpr(query_id_col, f"array({rows}) AS _adc")


def _adc_score(adc: F.Column, m: int) -> F.Column:
    """Asymmetric distance of one encoded vector: m table lookups by
    stored code — the scan never touches floats.  Unrolled over the
    plan-time-constant m (a zip_with lambda here runs interpreted)."""
    total = None
    for i in range(m):
        term = F.element_at(
            F.element_at(adc, i + 1),
            F.element_at(F.col("pq_codes"), i + 1) + 1,
        )
        total = term if total is None else total + term
    return F.round(total, 6)


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): each query's
    (m × ksub) distance table is computed AS A COLUMN of the query
    DataFrame and broadcast-joined against the encoded vectors — one plan
    regardless of query count (a per-query literal/union design blows up
    plan size and driver memory at realistic 10⁴+ query batches).
    Per-vector distance is m table lookups by stored code, which is the
    entire point of PQ at 100 TB (codes are ~dim/sub bytes and the scan
    never touches floats).  Returns (query_id, vec_id, approx_d2, rank),
    ascending distance; zero queries yield a typed empty frame.
    """
    encoded = pq_encode(vectors, codebooks, id_col=id_col, vec_col=vec_col)
    q_tab = _adc_table_frame(queries, query_id_col, vec_col, codebooks)
    scored = encoded.crossJoin(F.broadcast(q_tab)).select(
        F.col(query_id_col),
        F.col(id_col),
        _adc_score(F.col("_adc"), len(codebooks)).alias("approx_d2"),
    )
    w = Window.partitionBy(query_id_col).orderBy("approx_d2", F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_d2", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: code_i = round(x_i/scale)
    with scale = max|x|/127 (the standard faiss/SQ8-style storage
    shrink, 4x smaller than f32).

    Output: id, scale, codes (array<int> in [-127,127]), and
    ``max_abs_err`` — the per-vector dequantization error bound actually
    achieved.  Pure Column expressions: a narrow projection, embarrassingly
    parallel, no shuffle.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # epsilon floor: a zero vector must not divide by zero
    scale = (F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)).cast("double")
    codes = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    dequant = F.zip_with(
        v, codes, lambda x, c: F.abs(x - c.cast("double") * scale)
    )
    return df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        codes.alias("codes"),
        F.round(F.array_max(dequant), 6).alias("max_abs_err"),
    )


def auto_lsh_bits(n_vectors: int, target_bucket: int = 64) -> int:
    """Bits per LSH table so expected bucket load stays ~``target_bucket``
    regardless of collection size: ``max(4, ceil(log2(n / target)))``.

    With FIXED bits, per-bucket load grows linearly in N and the
    candidate self-join quadratically — measured at the sf0.1→sf1 step:
    4 fixed bits = 141 s / 2.13× linear at 10× the vectors, auto (≈8-9
    bits) = ~21 s / 0.43× linear.  Raising bits trades recall at LOW
    cosine thresholds; buy it back linearly with more tables
    (OR-amplification), never by letting buckets grow."""
    import math

    return max(4, math.ceil(math.log2(max(n_vectors, 2) / target_bucket)))


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_tables: int = 6,
    bits_per_table: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table LSH self-join.

    ``bits_per_table=None`` (default) sizes the tables from the data
    via :func:`auto_lsh_bits` — one count() action, and bucket load
    stays bounded at any scale.  Pass an explicit value to pin the
    parameterization (the oracle-checked query does, so its semantics
    are reproducible engine-to-engine).

    OR-amplified LSH: ``n_tables`` independent hash tables of
    ``bits_per_table`` sign-projections each; a pair is a candidate if it
    collides in ANY table (recall grows with tables, candidate volume
    shrinks with bits — the two standard knobs).  Candidates are verified
    with the exact cosine; ``id_a < id_b``; cosine rounded 6 dp.

    Scale shape: the self-join key is (table, bucket) on NARROW rows
    (id + 2 ints — vectors never ride the candidate shuffle); pairs are
    de-duplicated across tables BEFORE the vectors are re-attached, so
    each surviving pair computes exactly one cosine.  At 100 TB, raise
    ``bits_per_table`` so per-bucket candidate sets stay bounded, and
    persist/bucket the (table, bucket, id) index by its join key.
    """
    n_vec = None
    if bits_per_table is None:
        n_vec = vectors.count()
        bits_per_table = auto_lsh_bits(n_vec)
    planes = hyperplanes(dim, n_tables * bits_per_table, seed)
    ids = vectors.select(F.col(id_col), F.col(vec_col))
    # The bucket build is the CPU-heavy stage (n_tables × bits × dim
    # interpreted HOF terms per row); a small-file scan must not serialize
    # it.  Profiled at sf1: the single-file scan ran the build on ONE task
    # (14.5 s of a 38 s query) — repartitioning to cluster parallelism
    # cut the stage to <1 s.  Guarded so a table that already has healthy
    # parallelism (the 100 TB case: thousands of parquet splits) pays no
    # extra exchange.
    spark = vectors.sparkSession
    target = spark.sparkContext.defaultParallelism
    if ids.rdd.getNumPartitions() < target:
        ids = ids.repartition(target)
    # the bucket build stays in HOF form: n_tables × bits_per_table × dim
    # flat terms (1536 here) exceed what janino can compile in the one
    # unsplittable method a WSCG projection over an ArrayData local gets
    # (the ≤8-plane lsh_topk paths are under the limit and use flat SQL).
    # Re-measured r6 at sf0.1: HOF build 0.41 s vs staged flat-SQL
    # per-plane columns 4.47 s (11x) — the 24 × 64-term staged columns
    # fall out of codegen exactly as the r5 rule-of-thumb predicts, and
    # the build is ~0.4 s of the query's 3.6 s anyway (the rest is the
    # candidate join + cosine verify, both already narrow/flat).
    # Interpreted cost is acceptable — this is the one-time index pass;
    # the per-candidate-pair cosine verify below IS flat SQL.
    buckets = F.array(
        *[
            lsh_bucket(
                F.col(vec_col),
                planes[t * bits_per_table : (t + 1) * bits_per_table],
            )
            for t in range(n_tables)
        ]
    )
    narrow = ids.select(
        F.col(id_col).alias("_id"),
        F.posexplode(buckets).alias("_table", "_bucket"),
    )
    # Materialize the (id, table, bucket) index ONCE: both sides of the
    # self-join read it, their aliases differ, so Catalyst cannot reuse
    # the exchange and would run the expensive bucket build twice
    # (profiled at sf1: 2× ~7 s of a 29 s query).  The index is 3 narrow
    # ints per (vector, table) — linear in N, spills cleanly under
    # MEMORY_AND_DISK; at warehouse scale this is the same index
    # ``build_lsh_index`` says to persist bucketed on disk.
    # localCheckpoint, NOT persist(): a bare persist stays registered in
    # the CacheManager until someone unpersists, so repeated calls in a
    # long-lived session accumulate cached blocks; checkpoint blocks are
    # reclaimed by the ContextCleaner when the plan is GC'd, while
    # compute-once reuse across the two join branches is identical.
    # (Caveat shared with every localCheckpoint: blocks don't survive
    # executor loss — on a cluster serving this continuously, write the
    # index to disk via build_lsh_index instead.)
    narrow = narrow.localCheckpoint(eager=False)
    a = narrow.select(
        "_table", "_bucket", F.col("_id").alias("id_a")
    )
    b = narrow.select(
        "_table", "_bucket", F.col("_id").alias("id_b")
    )
    pairs = (
        a.join(b, on=["_table", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Scale-guarded verify parallelism (guide §2.5): on a SMALL corpus
    # AQE's byte-based coalescing collapses the pair list to 1-2
    # partitions (profiled r14: the cosine-verify stage of
    # embedding_dedup_clusters ran 1.66 s on 2 tasks of local[32] —
    # ~3 MB of shuffle bytes but 64 interpreted HOF terms per pair),
    # and the vector re-attach joins broadcast, so the verify inherits
    # that serial layout.  Hash-repartition the narrow (id_a, id_b)
    # pairs to cluster parallelism — explicit repartitions are exempt
    # from AQE coalescing.  Guarded on the corpus size the auto-bits
    # count already paid for: never fires at warehouse scale (the pair
    # list is then far above AQE's min partition size and parallelism
    # is already healthy), so no extra exchange is added there.
    if n_vec is not None and n_vec <= 1_000_000:
        pairs = pairs.repartition(
            vectors.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
    u = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    ua = u.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    ub = u.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        pairs.join(ua, on="id_a")
        .join(ub, on="id_b")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centers: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer + PQ/ADC scoring — the billion-scale ANN
    layout (IVFPQ, Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011): the k-means list assignment prunes the
    scan to ~nprobe/nlist of the table, and PQ codes make each surviving
    candidate cost ``m`` byte-indexed table lookups instead of a
    dim-float distance.

    Pass ``centers`` (``list_id INT, center ARRAY<DOUBLE>``) to supply a
    fixed coarse quantizer instead of training k-means — same contract
    as :func:`ivf_topk`, and what makes the composed plan
    oracle-checkable.

    Scale shape: centroids broadcast (nlist rows); the encoded table is
    (id, list_id, m bytes) — at 100 TB it would be WRITTEN partitioned by
    list_id so a probe is a partition-pruned scan, never a full pass.
    Probe selection and the per-query ADC tables are computed Spark-side
    on the query DataFrame and broadcast-joined on ``list_id`` — one plan
    regardless of query count.  Returns (query_id, vec_id, approx_d2,
    rank).
    """
    if centers is not None:
        centers_df = centers
    else:
        import numpy as np
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = vectors.select(
            array_to_vector(F.col(vec_col)).alias("features")
        )
        km = KMeans(k=nlist, seed=seed, maxIter=10).fit(train)
        fitted = np.array(km.clusterCenters(), dtype=np.float64)
        centers_df = vectors.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(fitted)],
            "list_id INT, center ARRAY<DOUBLE>",
        )

    def dist2(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    v_assigned = (
        vectors.crossJoin(F.broadcast(centers_df))
        .withColumn("_d2", dist2(F.col(vec_col), F.col("center")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("_d2", "list_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "list_id")
    )
    encoded = pq_encode(v_assigned, codebooks, id_col=id_col, vec_col=vec_col)

    # probe selection: each query keeps its nprobe nearest coarse
    # centroids — a broadcast crossJoin against nlist rows, ranked per
    # query; ties broken by list_id (matches a stable argsort)
    q_probe = (
        queries.select(query_id_col, vec_col)
        .crossJoin(F.broadcast(centers_df))
        .withColumn("_d2", dist2(F.col(vec_col), F.col("center")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy("_d2", "list_id")
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "list_id")
    )
    q_tab = _adc_table_frame(queries, query_id_col, vec_col, codebooks)
    # (query, probed list, ADC table): n_queries × nprobe narrow rows;
    # the equi-join on list_id IS the IVF pruning — only vectors in a
    # probed list are ever scored (written partitioned by list_id, this
    # is a partition-pruned scan at scale)
    probes = q_probe.join(q_tab, on=query_id_col)
    scored = encoded.join(F.broadcast(probes), on="list_id").select(
        F.col(query_id_col),
        F.col(id_col),
        _adc_score(F.col("_adc"), len(codebooks)).alias("approx_d2"),
    )
    w = Window.partitionBy(query_id_col).orderBy("approx_d2", F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_d2", "rank")
    )


def center_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    out_col: str = "centered",
) -> DataFrame:
    """Mean-center an embedding column — the standard preprocessing
    ahead of SemDeDup/ANN indexing (hubness drops when the corpus mean
    is removed; quantizers train better on centered residuals).

    The mean vector is ONE pass of ``dim`` avg aggregates collapsed to
    a one-row array that broadcast-joins back (never a plan literal);
    the subtraction is a map-side ``zip_with``.  Output adds
    ``out_col`` as array<double> — downstream unit-normalization is
    `with_unit_vectors` on the centered column.
    """
    mean_row = df.agg(
        F.array(
            *[
                F.avg(F.element_at(F.col(vec_col), i + 1))
                for i in range(dim)
            ]
        ).alias("_mu")
    )
    return (
        df.crossJoin(F.broadcast(mean_row))
        .withColumn(
            out_col,
            F.zip_with(
                F.col(vec_col),
                F.col("_mu"),
                lambda v, m: v.cast("double") - m,
            ),
        )
        .drop("_mu")
    )


# -- embedding evaluation: label-aware neighbor ops -----------------------


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``k`` most-similar vectors whose label DIFFERS from the
    anchor's — the highest-loss negatives a triplet/InfoNCE batch can
    use.

    Plan shape: broadcast the (small) anchor set, one pass over the
    vector table, label-mismatch filter BEFORE the window so same-label
    rows never rank, per-anchor top-k window.  Cosine rounds 6 dp
    before ranking so the order (ties by id) is engine-stable.
    Returns (anchor_id, anchor_label, negative_id, negative_label,
    cosine, rank).
    """
    v = vectors.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    scored = (
        v.crossJoin(F.broadcast(a))
        .filter(F.col("negative_label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.round(
                _dot(F.col("_v"), F.col("_q"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), "negative_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def knn_label_vote(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label prediction — the standard embedding-quality probe
    (does geometric neighborhood recover the label?).

    For each query: exact top-``k`` cosine neighbors EXCLUDING itself,
    majority label vote (ties broken toward the smaller label — both
    engines agree on a total order).  Returns (query_id, true_label,
    predicted_label, votes).  Broadcast queries, one scan, two windows
    — no iterative fitting, nothing driver-side.
    """
    v = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(label_col).alias("n_label"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("true_label"),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "n_id",
            "n_label",
            F.round(
                _dot(F.col("_v"), F.col("_q"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cosine"),
        )
    )
    wn = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "n_id")
    nn = scored.withColumn("_r", F.row_number().over(wn)).filter(
        F.col("_r") <= k
    )
    votes = nn.groupBy("query_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), "n_label"
    )
    return (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("n_label").alias("predicted_label"),
            "votes",
        )
    )


def subvectors(vec_col, n_sub: int, sub_dim: int) -> F.Column:
    """Split a flat embedding into ``n_sub`` contiguous ``sub_dim``-d
    token vectors (array<array<double>>) — the multi-vector view a
    late-interaction scorer consumes."""
    return F.array(
        *[
            F.transform(
                F.slice(vec_col, i * sub_dim + 1, sub_dim),
                lambda x: x.cast("double"),
            )
            for i in range(n_sub)
        ]
    )


def maxsim_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim): score =
    Σ_i max_j cos(q_i, d_j) over the two sides' token vectors — finer
    than single-vector cosine because each query token matches its own
    best document token.

    Here the token vectors are contiguous ``dim/n_sub``-d slices of the
    stored embedding (the multi-vector plumbing; swap the slicer for
    real per-token vectors without touching the scorer).  Plan shape:
    subvector split and per-side norms are map-side projections,
    queries broadcast, the n_sub × n_sub interaction runs as nested
    HOFs over fixed-size arrays (constant work per pair), per-query
    top-k window.  Score rounds 6 dp, ties break by id.
    """
    sub_dim = dim // n_sub
    v = _maxsim_side(vectors, [id_col], vec_col, n_sub, sub_dim, "d")
    q = _maxsim_side(queries, [query_id_col], vec_col, n_sub, sub_dim, "q")
    scored = v.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(_maxsim_score(), 6).alias("maxsim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("maxsim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _maxsim_side(
    df: DataFrame,
    keep_cols: list[str],
    vec_col: str,
    n_sub: int,
    sub_dim: int,
    side: str,
) -> DataFrame:
    """Map-side multi-vector projection for one side of the MaxSim
    interaction: token subvectors + their norms (``side`` = 'q'/'d'
    picks the column names the scorer expects)."""
    return df.select(
        *keep_cols,
        subvectors(F.col(vec_col), n_sub, sub_dim).alias(f"_{side}subs"),
    ).select(
        *keep_cols,
        f"_{side}subs",
        F.transform(
            F.col(f"_{side}subs"), lambda s: F.sqrt(_dot(s, s))
        ).alias(f"_{side}norms"),
    )


def _maxsim_score() -> F.Column:
    """Σ over query tokens of the best document-token cosine, over the
    ``_qsubs/_qnorms/_dsubs/_dnorms`` columns :func:`_maxsim_side`
    projects.  Indexed lambdas pull the matching norms; zip_with pairs
    (subvector, norm)."""
    return F.aggregate(
        F.zip_with(
            F.col("_qsubs"),
            F.col("_qnorms"),
            lambda qs, qn: F.array_max(
                F.zip_with(
                    F.col("_dsubs"),
                    F.col("_dnorms"),
                    lambda ds, dn: _dot(qs, ds) / (qn * dn),
                )
            ),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def maxsim_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    dim: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage late-interaction serving — the standard ColBERT shape
    (ColBERTv2/PLAID: ANN candidates, exact MaxSim re-rank): an IVF
    coarse quantizer over the SINGLE-vector embedding prunes the corpus
    to the queries' ``nprobe`` lists, and the n_sub × n_sub MaxSim
    interaction runs only on the survivors.

    :func:`maxsim_topk` re-scans the full corpus per query batch —
    fine as the recall oracle, wrong as the serving path at 100 TB;
    here the list equi-join IS the pruning (~nprobe/nlist of the corpus
    scored), and :func:`maxsim_ann_indexed` composes the same re-rank
    with the on-disk ``list_id``-partitioned index so the probe filter
    becomes partition pruning at the scan.

    Candidate semantics: a document is scored for a query iff its
    (single) list assignment is among the query's ``nprobe`` nearest
    lists; survivors get the EXACT MaxSim score (identical scorer to
    :func:`maxsim_topk`), per-query top-k, 6 dp round, ties by id.
    With frozen ``centers`` every stage is engine-portable and
    value-checkable.
    """
    v_assigned = _ivf_assign(vectors, centers, id_col, vec_col, 1).select(
        id_col, vec_col, "list_id"
    )
    q_probes = _ivf_assign(
        queries, centers, query_id_col, vec_col, nprobe
    ).select(query_id_col, vec_col, "list_id")
    return _maxsim_rerank(
        v_assigned, q_probes, k, n_sub, dim, id_col, vec_col, query_id_col
    )


def _maxsim_rerank(
    v_assigned: DataFrame,
    q_probes: DataFrame,
    k: int,
    n_sub: int,
    dim: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """MaxSim re-rank of IVF candidates: broadcast the (tiny) probe set,
    equi-join on ``list_id`` (a doc holds ONE list, a query probes
    nprobe distinct lists — each pair meets at most once), score the
    survivors with the exact interaction."""
    sub_dim = dim // n_sub
    v = _maxsim_side(
        v_assigned, [id_col, "list_id"], vec_col, n_sub, sub_dim, "d"
    )
    q = _maxsim_side(
        q_probes, [query_id_col, "list_id"], vec_col, n_sub, sub_dim, "q"
    )
    scored = v.join(F.broadcast(q), on="list_id").select(
        query_id_col,
        id_col,
        F.round(_maxsim_score(), 6).alias("maxsim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("maxsim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def maxsim_ann_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centers: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    dim: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve two-stage MaxSim from an :func:`ivf_write_index` layout:
    the probed list ids collect to a literal IN-filter on the partition
    column, so the index scan prunes to the probed lists before a
    single vector is read (same discipline as :func:`ivf_topk_indexed`;
    plan-pinned in tests/test_plans.py), then the exact MaxSim re-rank
    scores only what was read.  Indexed ≡ in-memory results by
    construction (same helpers)."""
    q_probes = _ivf_assign(
        queries, centers, query_id_col, vec_col, nprobe
    ).select(query_id_col, vec_col, "list_id")
    probe_ids = sorted(
        r["list_id"] for r in q_probes.select("list_id").distinct().collect()
    )
    index = spark.read.parquet(path).filter(
        F.col("list_id").isin(probe_ids)
    )
    return _maxsim_rerank(
        index, q_probes, k, n_sub, dim, id_col, vec_col, query_id_col
    )


def binary_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Sign-quantize a float vector into packed bit words — binary
    embeddings, the 32×-memory-cut retrieval trick: bit *i* is set iff
    ``vec[i] > 0``, packed 32 bits per bigint word (``_w0, _w1, ...``;
    32 not 64 keeps every word clear of the sign bit, so shifts, XORs
    and engine-portable replays never touch two's-complement edge
    cases).  Pure expression, map-side, no shuffle.

    Hamming distance between signatures ≈ angular distance between the
    original vectors (Charikar '02 — the same hyperplane-LSH fact the
    SimHash family uses); at serving time a 64-dim float vector is two
    bigints and a distance is two XOR+popcounts.
    """
    if dim % 32 != 0:
        raise ValueError("dim must be a multiple of 32")
    words = [
        F.expr(
            f"aggregate(sequence({w * 32 + 1}, {w * 32 + 32}), 0L, "
            f"(acc, i) -> acc + IF(element_at({vec_col}, i) > 0.0, "
            f"shiftleft(1L, i - 1 - {w * 32}), 0L))"
        ).alias(f"_w{w}")
        for w in range(dim // 32)
    ]
    return df.select("*", *words)


def hamming_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by Hamming distance over sign-quantized signatures.

    Both sides quantize via :func:`binary_signatures`; the scan scores
    ``Σ_w bit_count(word ⊕ query_word)`` — integer arithmetic end to
    end, so results are bit-reproducible on any engine (no float
    summation order anywhere).  Queries broadcast (the
    :func:`cosine_topk` shape); per-query top-k is a partitioned
    window over (query, distance, id).

    This is the coarse stage of a binary-then-rerank stack: Hamming
    candidates at 2 bigints/vector, exact float re-rank on the k
    survivors (compose with :func:`cosine_topk` on the output ids).
    """
    n_words = dim // 32
    v = binary_signatures(
        vectors.select(F.col(id_col), F.col(vec_col)), vec_col, dim
    ).drop(vec_col)
    q = binary_signatures(
        queries.select(F.col(query_id_col), F.col(vec_col)), vec_col, dim
    ).drop(vec_col)
    q = q.select(
        query_id_col, *[F.col(f"_w{w}").alias(f"_q{w}") for w in range(n_words)]
    )
    dist = None
    for w in range(n_words):
        d = F.expr(f"bit_count(_w{w} ^ _q{w})")
        dist = d if dist is None else dist + d
    scored = v.join(F.broadcast(q)).select(
        query_id_col, id_col, dist.cast("int").alias("hamming")
    )
    win = Window.partitionBy(query_id_col).orderBy(
        "hamming", F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "hamming", "rank")
    )


def kcenter_greedy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    scale: int = 1000,
) -> list[tuple[int, int, int]]:
    """Greedy k-center (farthest-point traversal, Gonzalez '85) — the
    2-approximation coreset every diversity-sampling / cluster-seeding
    pipeline starts from: seed at the smallest id, then repeatedly add
    the point FARTHEST from the chosen set.

    Coordinates are quantized to the integer lattice
    (``round(x·scale)``) so every squared distance is exact and the
    whole traversal is engine-replayable.  Each round is ONE map-side
    scan: the running ``min_d`` column is updated incrementally
    against only the NEWEST center (a broadcast literal array — never
    a join, never k× recompute), the argmax is a distributed
    TakeOrdered(1) with (dist DESC, id ASC) tie-break, and
    ``localCheckpoint`` cuts lineage per round.  Driver traffic is one
    (id, dist, vector) row per round — k·dim integers total.

    Returns [(rank, center_id, radius2)] — radius2 is the exact max
    min-squared-distance AFTER adding that center (coverage radius²).
    """
    vint = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale, 0).cast("bigint"),
    )
    pts = df.select(F.col(id_col).alias("_id"), vint.alias("_v"))
    pts = pts.localCheckpoint(eager=False)

    def dist2_to(center: list[int]) -> F.Column:
        lit = F.array(*[F.lit(int(c)) for c in center])
        return F.aggregate(
            F.zip_with(
                F.col("_v"), lit, lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    seed = (
        pts.orderBy(F.asc("_id")).limit(1).collect()[0]
    )
    centers: list[tuple[int, int, int]] = []
    cur = pts.select(
        "_id", "_v", dist2_to(seed["_v"]).alias("_min_d")
    ).localCheckpoint(eager=False)
    cid = int(seed["_id"])
    for rank in range(1, k + 1):
        # ONE TakeOrdered(1) per round: its top row IS the argmax, and
        # that row's _min_d IS max(_min_d) — the coverage radius² — so
        # the previous separate max() collect was a second driver
        # round-trip (plan build + job) for a value the argmax row
        # already carries.  Profiled r13: this query's wall was ~half
        # DRIVER gap across 27 tiny jobs; folding halves the per-round
        # actions at any scale (guide §1.2 step 1 / §5 driver).
        nxt = (
            cur.orderBy(F.desc("_min_d"), F.asc("_id"))
            .limit(1)
            .collect()[0]
        )
        centers.append((rank, cid, int(nxt["_min_d"])))
        if rank == k:
            break
        cid = int(nxt["_id"])
        cur = cur.select(
            "_id",
            "_v",
            F.least(
                F.col("_min_d"), dist2_to(nxt["_v"])
            ).alias("_min_d"),
        ).localCheckpoint(eager=False)
    return centers
