"""Entity resolution: blocked fuzzy matching on string keys.

Record linkage for dimension hygiene — find rows that are *probably the
same entity* despite typos/variant spellings (customer names, supplier
names, file paths).  Complements the document near-dup family
(``operators/dedup.py``): those compare token SETS at corpus scale,
this compares short STRINGS at dimension scale with edit distance.

Scale shape: edit distance is quadratic per comparison and must never
run all-pairs.  ``fuzzy_matches`` is blocked — candidates come from an
equi-join on caller-supplied block keys (exact attributes like nation /
first character / length band), and ``levenshtein`` runs once per
in-block pair, JVM-side, inside codegen.  The block join is the same
bounded-pair discipline as ``jaccard_pairs``; skewed blocks can reuse
its salting pattern.  Edit distance is engine-portable (DuckDB
``levenshtein`` computes the same classic Wagner-Fischer distance), so
match queries are fully oracle-checkable.

Reference parity: no reference analog (its joins are all exact-key;
see SURVEY.md §2.3) — extension surface for training-data curation,
where merging duplicate entities dedups the label space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_matches(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    name_col: str,
    max_edit: int = 2,
    length_band: int | None = None,
) -> DataFrame:
    """Within-block pairs whose ``name_col`` values are within
    ``max_edit`` Levenshtein distance.

    ``length_band`` adds a derived block key ``len(name) // band`` —
    cheap prefiltering, since edit distance >= length difference (names
    whose lengths differ by more than ``max_edit`` can never match, so
    banding by length only risks splitting near-boundary pairs when
    ``band < max_edit``; pass ``band >= max_edit + 1`` to keep recall
    for same-band pairs exact).

    Returns (id_a, id_b, name_a, name_b, edit_distance), id_a < id_b.
    """
    keys = [F.col(c) for c in block_cols]
    if length_band is not None:
        keys = keys + [
            (F.length(F.col(name_col)) / F.lit(length_band))
            .cast("int")
            .alias("_lenband")
        ]
    base = df.select(
        *keys, F.col(id_col).alias("_id"), F.col(name_col).alias("_name")
    )
    join_keys = [c for c in block_cols] + (
        ["_lenband"] if length_band is not None else []
    )
    a = base.select(
        *join_keys, F.col("_id").alias("id_a"), F.col("_name").alias("name_a")
    )
    b = base.select(
        *join_keys, F.col("_id").alias("id_b"), F.col("_name").alias("name_b")
    )
    return (
        a.join(b, on=join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "edit_distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("edit_distance") <= max_edit)
        .select("id_a", "id_b", "name_a", "name_b", "edit_distance")
    )


def canonicalize_matches(matches: DataFrame) -> DataFrame:
    """Pick a canonical id per matched pair-set WITHOUT transitive
    closure: each id maps to min(its own id, all matched partners).

    One-hop canonical mapping — cheap (one groupBy), deterministic, and
    the right granularity for review queues.  For full transitive
    merging feed ``matches`` to ``operators.graph.connected_components``.
    Returns (entity_id, canonical_id) for every id that appears in any
    match (identity rows for unmatched ids are the caller's join).
    """
    edges = matches.select(
        F.col("id_a").alias("entity_id"), F.col("id_b").alias("partner")
    ).unionByName(
        matches.select(
            F.col("id_b").alias("entity_id"), F.col("id_a").alias("partner")
        )
    )
    return edges.groupBy("entity_id").agg(
        F.least(F.min("partner"), F.first("entity_id")).alias("canonical_id")
    )


__all__ = ["fuzzy_matches", "canonicalize_matches"]
