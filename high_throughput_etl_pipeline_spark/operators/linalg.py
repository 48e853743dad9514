"""Distributed linear algebra on the exact integer lattice: scatter
matrix + power iteration for the top principal component.

The 100 TB shape: computing a d×d scatter (covariance·n) matrix over an
embedding column is one map-side pass — each row contributes its d(d+1)/2
upper-triangle products, partial aggregation collapses them per
partition, and the only shuffle carries |cells| = d(d+1)/2 rows per
partition (d = 64 → 2080).  The matrix itself is metadata-scale, so the
power iteration runs driver-side over exact Python integers — the same
bounded-collect pattern as the ANN codebooks (similarity.py) — and the
result re-enters the plan as a literal frame.

Everything rides the integer lattice end to end (components quantized to
1e-3, means/normalizations via integer round-half-away division, no
float anywhere in the iteration), so a SQL oracle replaying the identical
integer recurrence — DuckDB's recursive CTE — reproduces the eigenvector
bit-for-bit.  See ``embedding_pca_power`` in queries.py.

Reference parity: the reference has no linear algebra (its Spark program
is the Glue ingest job — environments/prod/glue_batch_job.py); this is
extension surface for the LLM-data-pipeline tier (embedding diagnostics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def round_div(num: int, den: int) -> int:
    """Round-half-away-from-zero integer division — the engine-portable
    rounding rule (Spark/DuckDB ``round``) expressed exactly in integer
    arithmetic, so both sides of an oracle can replay it without ever
    constructing a float."""
    if den < 0:
        num, den = -num, -den
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((-2 * num + den) // (2 * den))


def scatter_cells(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> tuple[list[tuple[int, int, int]], int, list[int]]:
    """Upper-triangle scatter-matrix cells of the (quantized, centered)
    embedding column, plus the row count and the integer mean vector.

    Returns ``([(i, j, cell), ...], n_rows, means)`` with ``i <= j`` and
    ``cell = Σ_rows (x_i − m_i)(x_j − m_j)`` over components quantized
    to ``round(x·scale)`` and integer means ``m_i = round(Σx_i / n)``.
    Two passes: a 1-column agg for the means (``dim`` rows collected —
    metadata), then ONE map-side pass emitting d(d+1)/2 products per
    row with partial aggregation; cells accumulate in decimal(38,0).
    """
    xs = F.transform(
        F.col(col),
        lambda x: F.round(x.cast("double") * scale, 0).cast("bigint"),
    )
    t = df.select(xs.alias("_xs"))
    # guarded hash-repartition (the dedup._md5_sig_bands idiom): the
    # d(d+1)/2-products-per-row pass below must not serialize onto the
    # single scan split a small parquet file produces; hash on the
    # quantized array (deterministic), never round-robin (its
    # sort-before-repartition costs more than it buys — r13 A/B).
    # No-op at healthy parallelism (the 100 TB case).
    target = df.sparkSession.sparkContext.defaultParallelism
    if t.rdd.getNumPartitions() < target:
        t = t.repartition(target, F.col("_xs"))
    ex = t.select(F.posexplode("_xs").alias("i", "x"))
    sums = (
        ex.groupBy("i")
        .agg(
            F.sum("x").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()
    )
    if not sums:
        return [], 0, []
    n = int(sums[0]["n"])
    means = {int(r["i"]): round_div(int(r["s"]), n) for r in sums}
    mean_arr = F.array(*[F.lit(means[i]) for i in range(dim)])
    devs = t.select(
        F.transform(
            F.col("_xs"), lambda x, i: x - F.element_at(mean_arr, i + 1)
        ).alias("_d")
    )
    # materialize _d in its own projection BEFORE the nested pair
    # lambdas (HOF lambdas re-evaluate captured trees per element)
    pairs = devs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(dim - 1)),
                        lambda j: F.struct(
                            (i * dim + j).alias("ij"),
                            (
                                F.element_at(F.col("_d"), i + 1)
                                * F.element_at(F.col("_d"), j + 1)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("pr")
    )
    cells = (
        pairs.groupBy(F.col("pr.ij").alias("ij"))
        .agg(F.sum(F.col("pr.p").cast("decimal(38,0)")).alias("c"))
        .collect()
    )
    out = []
    for r in cells:
        ij = int(r["ij"])
        out.append((ij // dim, ij % dim, int(r["c"])))
    return out, n, [means[i] for i in range(dim)]


def power_top_eigvec(
    cells: list[tuple[int, int, int]],
    dim: int,
    iters: int = 12,
) -> tuple[list[int], int, int, int]:
    """Top eigenvector of the symmetric matrix given by upper-triangle
    ``cells``, by power iteration on the exact integer lattice.

    Each round: w = M·v (exact ints), then renormalize to
    ``v_i = round(w_i·1e6 / max|w|)`` via :func:`round_div` — no float
    ever enters the recurrence, so any engine replaying it (DuckDB's
    recursive CTE in the oracle) agrees bit-for-bit.  The final sign is
    fixed so the lowest-index maximal-|v| component is positive.

    Returns ``(v_micro, vMv, vv, trace)`` — the 1e6-lattice eigenvector
    and the exact integers behind the Rayleigh quotient.
    """
    m = [[0] * dim for _ in range(dim)]
    for i, j, c in cells:
        m[i][j] = c
        if i != j:
            m[j][i] = c
    v = [MICRO] * dim
    for _ in range(iters):
        w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        maxw = max(abs(x) for x in w)
        if maxw == 0:
            break
        v = [round_div(x * MICRO, maxw) for x in w]
    ma = max(abs(x) for x in v)
    lead = next(x for x in v if abs(x) == ma)
    if lead < 0:
        v = [-x for x in v]
    vmv = sum(
        m[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)
    )
    vv = sum(x * x for x in v)
    trace = sum(m[i][i] for i in range(dim))
    return v, vmv, vv, trace


def normal_equation_fit(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    group_cols: list[str],
    y_per_unit: int = 100,
) -> DataFrame:
    """Per-group TWO-feature least squares (intercept + x1 + x2) solved
    by exact normal equations — the multiple-regression extension of
    ``plans/metrics.py:grouped_trend``.

    ``x1_col``/``x2_col``/``y_col`` must already be integer columns
    (the caller quantizes to a lattice).  ONE grouped pass accumulates
    the nine sufficient statistics (n, Σx1, Σx2, Σx1², Σx2², Σx1x2,
    Σy, Σx1y, Σx2y, Σy²) as decimal(38,0) — X'X never materializes per
    row, and fitting a million per-key planes costs exactly one rollup,
    which is the 100 TB shape: no driver-side solve, no collect, the
    3×3 Cramer determinants are six decimal expressions evaluated
    per GROUP.  Exact-integer determinants mean an engine replaying the
    same cofactor expansion (DuckDB HUGEINT) agrees bit-for-bit; cast
    to double only at the three final divisions.  Singular groups
    (det = 0: constant or collinear features) emit NULL coefficients.

    R² comes from SSE = Σy² − (b0·Σy + b1·Σx1y + b2·Σx2y) — the OLS
    identity SSE = y'y − b'X'y — evaluated in doubles with a fixed
    operation order both engines share.

    Output: (*group_cols, n, b0, b1, b2, r2) with b's rescaled by
    ``y_per_unit`` (cents → currency).
    """
    dec = "decimal(38,0)"
    x1 = F.col(x1_col).cast(dec)
    x2 = F.col(x2_col).cast(dec)
    y = F.col(y_col).cast(dec)
    # NO pre-aggregation repartition here (r14 revert of an r13 change):
    # the ten decimal(38,0) partial aggregates run map-side in the scan
    # stage, so a guarded repartition inserts a FULL-INPUT exchange below
    # the partial HashAggregate — measured 0.48 s → 1.12 s (2.3×) on
    # lineitem_price_model in the r13 driver run, and the shuffle only
    # carries |groups| rows without it.  The §2.5 single-task-map idiom
    # applies to explode/CPU-heavy map stages, not to map-side rollups.
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(x1).alias("_s1"),
        F.sum(x2).alias("_s2"),
        F.sum(x1 * F.col(x1_col)).alias("_s11"),
        F.sum(x2 * F.col(x2_col)).alias("_s22"),
        F.sum(x1 * F.col(x2_col)).alias("_s12"),
        F.sum(y).alias("_sy"),
        F.sum(x1 * F.col(y_col)).alias("_s1y"),
        F.sum(x2 * F.col(y_col)).alias("_s2y"),
        F.sum(y * F.col(y_col)).alias("_syy"),
    )
    n, s1, s2 = F.col("_n"), F.col("_s1"), F.col("_s2")
    s11, s22, s12 = F.col("_s11"), F.col("_s22"), F.col("_s12")
    sy, s1y, s2y, syy = (
        F.col("_sy"), F.col("_s1y"), F.col("_s2y"), F.col("_syy"),
    )
    # cofactor expansion along the first column of the symmetric
    # 3x3 system A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    g = g.select(
        *group_cols,
        n.cast("bigint").alias("n"),
        det.cast("double").alias("_det"),
        det0.cast("double").alias("_det0"),
        det1.cast("double").alias("_det1"),
        det2.cast("double").alias("_det2"),
        sy.cast("double").alias("_syd"),
        s1y.cast("double").alias("_s1yd"),
        s2y.cast("double").alias("_s2yd"),
        syy.cast("double").alias("_syyd"),
        n.cast("double").alias("_nd"),
    )
    b0 = F.col("_det0") / F.col("_det")
    b1 = F.col("_det1") / F.col("_det")
    b2 = F.col("_det2") / F.col("_det")
    sse = F.col("_syyd") - (
        b0 * F.col("_syd") + b1 * F.col("_s1yd") + b2 * F.col("_s2yd")
    )
    sst = F.col("_syyd") - F.col("_syd") * F.col("_syd") / F.col("_nd")
    ok = F.col("_det") != 0
    u = float(y_per_unit)
    return g.select(
        *group_cols,
        "n",
        F.when(ok, F.round(b0 / u, 6)).alias("b0"),
        F.when(ok, F.round(b1 / u, 6)).alias("b1"),
        F.when(ok, F.round(b2 / u, 6)).alias("b2"),
        F.when(ok & (sst > 0), F.round(F.lit(1.0) - sse / sst, 6)).alias(
            "r2"
        ),
    )


def quantized_coords(
    df: DataFrame, id_col: str, vec_col: str, scale: int = 1000
) -> DataFrame:
    """Explode a float-vector column to (id, pos, x) on the integer
    lattice: each coordinate becomes ``round(x·scale)`` as bigint, so
    every downstream dot product / distance is EXACT and any engine
    replaying the same quantization agrees bit-for-bit."""
    vint = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale, 0).cast("bigint"),
    )
    return df.select(
        F.col(id_col), F.posexplode(vint).alias("pos", "x")
    )


def jl_projections_int(
    coords: DataFrame,
    id_col: str,
    k: int = 16,
    dim: int = 64,
    salt: str = "jl-v1",
) -> DataFrame:
    """Johnson-Lindenstrauss sign projections over quantized
    coordinates (``quantized_coords`` output): ``k`` Achlioptas ±1
    hyperplanes whose signs come from the portable md5 PRF over
    (salt, r, pos) — derived IN-ENGINE, so no literal matrix ships in
    the plan and any engine re-derives the identical projections.
    Projections of integer coordinates are exact integers.

    Shape: the k×dim sign table is a BROADCAST (a few KB at any data
    size); projecting N vectors is one keyed join + one (id, r)
    rollup — the map-side-dominated 100 TB sketching pass.

    Output: (id_col, r, p) — projection r of each vector.
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    spark = coords.sparkSession
    signs = (
        spark.range(k)
        .select(F.col("id").alias("r"))
        .select(
            "r",
            F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias(
                "pos"
            ),
        )
        .select(
            "r",
            "pos",
            F.when(
                F.pmod(
                    md5_64(
                        F.concat(
                            F.lit(salt + ":"),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("pos").cast("string"),
                        )
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    return (
        coords.join(F.broadcast(signs), "pos")
        .groupBy(id_col, "r")
        .agg(F.sum(F.col("s") * F.col("x")).cast("bigint").alias("p"))
    )
