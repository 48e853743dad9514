"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2 + training-data extensions) for the duckdb correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from high_throughput_etl_pipeline_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — zero
    exemptions as of r11.  The historically hard cases and how each
    earned its oracle: xxhash64 fast paths have value-checked md5
    portable twins (dedup_minhash_md5/dedup_simhash_md5 pin the LSH
    algebra); ann_ivf_topk/ann_pq_topk/ann_ivfpq_topk pin IVF pruning
    AND the PQ encode→ADC→rank pipeline with fixed data-derived
    quantizers; the BPE ENCODER is hash-checked via a frozen merge
    list + recursive-CTE replay (r8), and the BPE TRAINER — the last
    rows-only row — is hash-checked as of r11 via the fully unrolled
    12-round pair-count→argmax→greedy-merge SQL replay
    (queries._bpe_train_oracle).  The HLL/KLL/theta sketch queries are
    hash-checked via tolerance binding (r7): the output carries
    engine-portable exact values plus booleans asserting the estimate
    sits within its error contract, so the oracle computes the exact
    side and a drifting estimate flips the hash."""
    return dict(ORACLES)
