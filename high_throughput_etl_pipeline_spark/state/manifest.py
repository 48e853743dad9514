"""Manifest construction (SURVEY.md §3.1 step 4).

The reference writes manifest JSON docs
``{"fileLocations": [{"URIPrefixes": [...]}]}`` at
``manifests/{date}/batch-{idx:04d}-{stamp}.json``
(lambda_manifest_builder.py:1073-1115).  Here a manifest is just the
grouped output of :func:`assign_batches` — we keep the document shape for
interop but the engine passes the grouped DataFrame straight to the
processor (no JSON round-trip needed in-process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_manifest_docs(
    batched_files: DataFrame,
    manifest_prefix: str = "manifests",
    run_stamp: str = "run",
) -> DataFrame:
    """Batches → one row per manifest: (date_prefix, batch_id,
    manifest_path, file_paths array, file_count).

    The grouping is a map-side-combinable collect_list per (date, batch) —
    batch cardinality is file_count/batch_size, tiny relative to data.
    """
    return (
        batched_files.groupBy("date_prefix", "batch_id")
        .agg(
            F.sort_array(F.collect_list("file_path")).alias("file_paths"),
            F.count("*").alias("file_count"),
        )
        .withColumn(
            "manifest_path",
            F.format_string(
                f"{manifest_prefix}/%s/batch-%04d-{run_stamp}.json",
                F.col("date_prefix"),
                F.col("batch_id"),
            ),
        )
    )


def manifest_doc(file_paths: list[str]) -> dict:
    """The reference-compatible JSON document for one manifest."""
    return {"fileLocations": [{"URIPrefixes": list(file_paths)}]}
