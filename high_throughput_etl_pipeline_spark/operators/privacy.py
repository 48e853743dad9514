"""Privacy audits: k-anonymity and l-diversity over quasi-identifiers.

Complements the PII-redaction pass (``operators/text.py``): redaction
scrubs direct identifiers out of TEXT; these audits measure whether the
STRUCTURED columns of a release still isolate individuals.  A
quasi-identifier (QI) combination that matches fewer than ``k`` rows
re-identifies; a group whose sensitive attribute takes fewer than ``l``
distinct values leaks it even at k-anonymity (Sweeney'02; Machanavajjhala
et al. '07).

Scale shape: both audits are ONE grouped aggregation over the QI
columns — the same shuffle any rollup pays, no self-joins, no windows.
``count_distinct`` of the sensitive column rides the same groupBy
(exact; swap in a HLL sketch from ``operators/sketches.py`` when the
sensitive domain is huge).  Everything stays in whole-stage codegen,
and the at-risk filter prunes output to the violating groups — at
warehouse scale the report is small even when the table is not.

Reference parity: no reference analog (closest is the quarantine
validation split, reference ``src/validation.rs``-equivalent surface;
see SURVEY.md §2.1 S8) — extension surface for release gating of
training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-QI-group audit: (``*qi_cols``, n_rows, at_risk[, n_sensitive]).

    ``at_risk`` is true when the group has fewer than ``k`` rows.  With
    ``sensitive_col``, ``n_sensitive`` = exact distinct count of the
    sensitive attribute within the group (the l-diversity statistic).
    """
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) < k).alias("at_risk"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("n_sensitive")
        )
    return df.groupBy(*qi_cols).agg(*aggs)


def anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One-row release-gate summary over the QI partition:

    (n_groups, n_rows, k_min, groups_below_k, rows_below_k
    [, groups_below_l]) — ``k_min`` is the anonymity of the WHOLE
    release (the smallest group), ``rows_below_k`` how many individuals
    the at-risk groups expose.
    """
    groups = k_anonymity_audit(df, qi_cols, k, sensitive_col)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("n_rows").cast("bigint").alias("k_min"),
        F.sum(F.col("at_risk").cast("int")).cast("bigint").alias(
            "groups_below_k"
        ),
        F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.sum((F.col("n_sensitive") < l).cast("int"))
            .cast("bigint")
            .alias("groups_below_l")
        )
    return groups.agg(*aggs)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    seed: str = "dp-v1",
    release_id: str = "release-0",
) -> DataFrame:
    """ε-differentially-private histogram release: per-group counts with
    Laplace(sensitivity/ε) noise — the mechanism behind every "publish
    aggregate stats about a sensitive corpus" step (Dwork et al. '06).

    Noise is drawn by a keyed PRF instead of driver RNG: each group's
    uniform comes from portable md5 arithmetic over (seed, group key),
    inverse-CDF'd to Laplace — ``-b·sign(u)·ln(1-2|u|)`` for
    ``u ∈ (-0.5, 0.5)``.  That is how production DP pipelines make a
    release REPRODUCIBLE (re-running the job re-derives the identical
    release; auditable, idempotent under retries — the seed is the
    secret: an adversary who learns it can denoise, so at release time
    it lives in a KMS, and at test scale it is pinned so an independent
    engine re-derives the same draws and the whole release is
    value-checkable).

    ``release_id`` is mixed into the PRF key: RETRIES of the same
    release (same id) stay idempotent, but a NEW release over evolved
    data must carry a fresh id, or the per-group noise would repeat and
    differencing two published releases would reveal exact count deltas
    with no seed knowledge at all.  Each distinct release_id spends a
    fresh ``epsilon`` — composition across releases is the caller's
    budget to account (k releases at ε each ⇒ kε total against a row
    present in all of them).

    One grouped aggregation + map-side noise — the release costs what a
    rollup costs at any scale.  Emits ``noisy_count`` (6 dp) ONLY — the
    exact count never leaves the operator, that is the point.
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    b = float(sensitivity) / float(epsilon)
    key = F.concat_ws(
        "|",
        F.lit(seed),
        F.lit(release_id),
        *[F.col(c).cast("string") for c in group_cols],
    )
    # u strictly inside (-0.5, 0.5): (h + 0.5) / 2^60 - 0.5 over the
    # 60-bit hash h — never hits the ln(0) endpoint
    u = (md5_64(key) + F.lit(0.5)) / F.lit(float(1 << 60)) - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return df.groupBy(*group_cols).agg(
        F.round(F.count(F.lit(1)) + noise, 6).alias("noisy_count")
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian '07): for every
    quasi-identifier group, the VARIATIONAL DISTANCE between the
    group's sensitive-attribute distribution and the global one —
    0.5*sum|p_s - q_s| — with a violation flag against threshold ``t``.
    The k-anonymity/l-diversity ladder's final rung: a group can be
    large and diverse yet still leak by skew.

    Shape: three rollups (global per-sensitive, per-group, per-cell),
    the full group x sensitive grid from a BROADCAST of the tiny global
    distribution (|sensitive alphabet| rows), and per-cell scaled
    rounding — each |p-q| lands on the 1e-9 integer lattice BEFORE the
    cross-cell sum, so engines never disagree on float-sum order.  At
    100 TB: scans and keyed rollups only; the grid is |groups| x |S|.

    Output: (*qi_cols, n_rows, t_value, violates).
    """
    glob = df.groupBy(F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt_s")
    )
    tot = df.select(F.count(F.lit(1)).cast("bigint").alias("_n"))
    groups = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    cells = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("_s")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    grid = (
        groups.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, [*qi_cols, "_s"], "left")
    )
    dd = F.round(
        (
            F.coalesce(F.col("_cnt"), F.lit(0)).cast("double")
            / F.col("n_rows")
            - F.col("_cnt_s").cast("double") / F.col("_n")
        )
        * F.lit(1e9),
        0,
    ).cast("bigint")
    per = grid.select(*qi_cols, "n_rows", dd.alias("_dd")).groupBy(
        *qi_cols, "n_rows"
    ).agg(
        F.round(
            F.sum(F.abs(F.col("_dd"))).cast("double") / F.lit(2e9), 6
        ).alias("t_value")
    )
    return per.select(
        *qi_cols,
        "n_rows",
        "t_value",
        (F.col("t_value") > F.lit(t)).alias("violates"),
    )


__all__ = ["k_anonymity_audit", "anonymity_report", "dp_noisy_counts", "t_closeness_audit"]
