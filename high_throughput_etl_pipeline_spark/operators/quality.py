"""Declarative data-quality checks (Deequ-style) over tables.

A production pipeline gates every publish on a check suite: keys are
unique and non-null, measures sit in their domains, enumerations hold,
children reference existing parents.  This module runs a whole suite of
single-table checks in ONE aggregation pass (each check contributes an
aggregate expression; the table is scanned once however many checks run
— the Deequ batch-metric trick), then unpivots the single metrics row
into one verdict row per check.  Referential integrity is the one check
that genuinely needs a second table: a left-anti join on the key
(broadcast when the parent's keys are dimension-sized).

Verdict rows are plain counts — engine-portable, so an entire suite is
hash-checkable against an independent SQL engine.

Reference parity: the reference validates per-FILE (extension/size →
quarantine, `operators/validation.py` covers that surface); these are
per-ROW/table content checks with no reference analog — extension
surface for release gating (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named check: ``violations`` is an aggregate Column counting
    offending rows (0 = pass).  ``details`` carries the human-readable
    rule text."""

    name: str
    violations: Column = field(compare=False)
    rule: str = ""


def not_null(col: str) -> Check:
    return Check(
        f"not_null({col})",
        F.sum(F.col(col).isNull().cast("long")),
        f"{col} IS NOT NULL",
    )


def unique(col: str) -> Check:
    # duplicates = rows - distinct values; NULLs are counted by neither
    # count(col) nor count_distinct, so they never mask duplicates
    return Check(
        f"unique({col})",
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
        f"{col} has no duplicate values",
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo!r},{hi!r})",
        F.sum(((c < lo) | (c > hi)).cast("long")),
        f"{lo!r} <= {col} <= {hi!r}",
    )


def accepted_values(col: str, values: list[str]) -> Check:
    return Check(
        f"accepted_values({col})",
        F.sum((~F.col(col).isin(values)).cast("long")),
        f"{col} IN {values!r}",
    )


def positive(col: str) -> Check:
    return Check(
        f"positive({col})",
        F.sum((F.col(col) <= 0).cast("long")),
        f"{col} > 0",
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation pass over ``df``.

    Returns (check, n_rows, n_violations, passed) — one row per check.
    NULL aggregates (empty table) coalesce to 0 violations: an empty
    table vacuously passes content checks; gate emptiness itself with
    an explicit row-count check if needed.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    row = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[
            F.coalesce(c.violations.cast("bigint"), F.lit(0)).alias(f"_v{i}")
            for i, c in enumerate(checks)
        ],
    )
    per_check = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"_v{i}").alias("n_violations"),
                )
                for i, c in enumerate(checks)
            ]
        )
    )
    return row.select(F.col("_n").alias("n_rows"), per_check.alias("_c")).select(
        F.col("_c.check").alias("check"),
        "n_rows",
        F.col("_c.n_violations").alias("n_violations"),
        (F.col("_c.n_violations") == 0).alias("passed"),
    )


def check_ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    name: str | None = None,
) -> DataFrame:
    """Orphaned-foreign-key check: child rows (non-null fk) whose key has
    no parent.  NULL fks are not orphans (gate them with ``not_null``
    if required).

    Lazy like every other check — composes into ``run_checks`` output
    without triggering jobs at construction — and ONE scan of the child:
    a left join against the distinct parent key set (broadcast by
    Catalyst when the parent is dimension-sized; deliberately NOT
    hinted, so a fact-sized parent degrades to a shuffle join instead
    of OOMing the driver) flags orphans, and a single aggregation reads
    off both the row count and the violation count."""
    label = name or f"ref_integrity({fk}->{pk})"
    flagged = child.select(F.col(fk).alias("_fk")).join(
        parent.select(F.col(pk).alias("_fk"))
        .distinct()
        .withColumn("_has_parent", F.lit(True)),
        on="_fk",
        how="left",
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.col("_fk").isNotNull() & F.col("_has_parent").isNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit(label).alias("check"),
        "n_rows",
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
    )


__all__ = [
    "Check",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "positive",
    "run_checks",
    "check_ref_integrity",
]
