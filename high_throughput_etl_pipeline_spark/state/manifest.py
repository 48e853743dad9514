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


MANIFEST_SCHEMA = (
    "date_prefix STRING, batch_id BIGINT, manifest_path STRING, "
    "file_paths ARRAY<STRING>, file_count BIGINT, status STRING, "
    "created_at TIMESTAMP, updated_at TIMESTAMP, error_message STRING"
)


class ManifestStore:
    """Queryable manifest meta-record table (SURVEY.md §1.1 'separate
    manifests state DataFrame'; the reference keeps ``MANIFEST#`` meta rows
    beside the file rows, DEVELOPER_GUIDE.md:154-163,
    lambda_manifest_builder.py:1218-1229).

    Same single-driver parquet conventions as FileStateTracker: date-
    partitioned, dynamic partition overwrite, idempotent insert keyed by
    ``manifest_path``."""

    def __init__(self, spark, path: str):
        import os as _os

        self.spark = spark
        self.path = path
        self._os = _os
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def _exists(self) -> bool:
        return self._os.path.isdir(self.path) and any(
            not n.startswith((".", "_")) for n in self._os.listdir(self.path)
        )

    def manifests(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def record(self, docs: DataFrame, status: str = "created") -> int:
        """Idempotent insert of manifest docs (from build_manifest_docs)."""
        incoming = (
            docs.select(
                "date_prefix",
                F.col("batch_id").cast("bigint"),
                "manifest_path",
                "file_paths",
                F.col("file_count").cast("bigint"),
            )
            .withColumn("status", F.lit(status))
            .withColumn("created_at", F.current_timestamp())
            .withColumn("updated_at", F.current_timestamp())
            .withColumn("error_message", F.lit(None).cast("string"))
        )
        fresh = incoming.join(
            self.manifests().select("manifest_path"),
            on="manifest_path",
            how="left_anti",
        ).select(*[f.split(" ")[0] for f in MANIFEST_SCHEMA.split(", ")])
        fresh = fresh.localCheckpoint(eager=True)
        n = fresh.count()
        if n:
            (
                fresh.repartition("date_prefix")
                .write.mode("append")
                .partitionBy("date_prefix")
                .parquet(self.path)
            )
        return n

    def update_status(
        self, manifest_path: str, status: str, error_message: str | None = None
    ) -> None:
        m = self.manifests().filter(F.col("manifest_path") == manifest_path)
        dates = [r[0] for r in m.select("date_prefix").distinct().collect()]
        if not dates:
            return
        updated = (
            self.manifests()
            .filter(F.col("date_prefix").isin(dates))
            .withColumn(
                "status",
                F.when(
                    F.col("manifest_path") == manifest_path, F.lit(status)
                ).otherwise(F.col("status")),
            )
            .withColumn(
                "updated_at",
                F.when(
                    F.col("manifest_path") == manifest_path,
                    F.current_timestamp(),
                ).otherwise(F.col("updated_at")),
            )
            .withColumn(
                "error_message",
                F.when(
                    (F.col("manifest_path") == manifest_path)
                    & F.lit(error_message is not None),
                    F.lit(error_message),
                ).otherwise(F.col("error_message")),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        (
            updated.repartition("date_prefix")
            .write.mode("overwrite")
            .partitionBy("date_prefix")
            .parquet(self.path)
        )
