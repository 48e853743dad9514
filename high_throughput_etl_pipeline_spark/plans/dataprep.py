"""Training-data preparation pipeline: the composed flagship.

The standard LLM-corpus prep flow over a documents table, as one
declarative plan:

    quality filter → exact dedup (keep-first) → near-dup removal
    (MinHash LSH, drop the higher doc_id of each pair) → survivors

Each stage is an operator from `operators/`; the composition shows they
chain without materialization barriers (one job, Catalyst plans the
whole DAG).  At 100 TB: quality filter prunes early (predicate on cheap
features), the dedups shuffle only 16-byte fingerprints / banded
signatures, and the final anti-joins are key-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import dedup_exact
from high_throughput_etl_pipeline_spark.operators.text import quality_features


def prepare_corpus(
    documents: DataFrame,
    min_quality: float = 0.3,
    near_dup_pairs: DataFrame | None = None,
) -> DataFrame:
    """Survivor set of the prep pipeline.

    ``near_dup_pairs``: optional (id_a, id_b) candidate pairs (e.g. from
    minhash_near_duplicates); the higher id of each pair is dropped —
    keep-first semantics matching the exact-dedup stage.
    """
    scored = quality_features(documents)
    kept = scored.filter(F.col("quality_score") >= min_quality)
    kept = dedup_exact(kept)
    if near_dup_pairs is not None:
        losers = near_dup_pairs.select(F.col("id_b").alias("doc_id")).distinct()
        kept = kept.join(losers, on="doc_id", how="left_anti")
    return kept
