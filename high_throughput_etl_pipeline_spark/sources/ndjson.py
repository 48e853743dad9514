"""NDJSON sources (SURVEY.md §2.1 S1/S2).

The reference's Glue job reads a manifest's file list with schema inference
(glue_batch_job.py:113-159).  Same semantics here, Spark-first:

- ``spark.read.json(paths, multiLine=False)`` — a multi-path read IS the
  union operator (U1); Spark parallelizes the scan across executors.
- schema inference costs an extra pass; callers that know the shape can
  pass an explicit schema — at 100 TB always pass a schema or sample-infer
  on a bounded subset (``samplingRatio``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def resolve_manifest(manifest: dict | str) -> list[str]:
    """S2 — manifest JSON → flat list of input URIs.

    Accepts the parsed dict or a JSON string of the reference's manifest
    shape ``{"fileLocations": [{"URIPrefixes": [uri, ...]}]}``
    (lambda_manifest_builder.py:1086-1092, consumed glue_batch_job.py:113-127).
    """
    doc = json.loads(manifest) if isinstance(manifest, str) else manifest
    paths: list[str] = []
    for loc in doc.get("fileLocations", []):
        paths.extend(loc.get("URIPrefixes", []))
    return paths


CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    paths: list[str] | str,
    schema=None,
    sampling_ratio: float | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """S1 — N NDJSON files → one DataFrame (glue_batch_job.py:147-159).

    multiLine=False: one JSON object per line, splittable, parallel parse.
    ``keep_corrupt=True`` (requires an explicit schema) adds a
    ``_corrupt_record`` column holding unparseable lines — the row-level
    analog of the reference's file-level quarantine: callers filter it
    into a quarantine sink instead of failing the batch.
    """
    if keep_corrupt and schema is None:
        raise ValueError(
            "keep_corrupt=True requires an explicit schema — Spark only "
            "routes malformed rows to the corrupt column when parsing "
            "against a declared shape; silently ignoring the flag would "
            "let bad rows pass as all-null data"
        )
    reader = spark.read
    if schema is not None:
        if keep_corrupt:
            if isinstance(schema, str):
                schema = f"{schema}, {CORRUPT_COL} STRING"
            else:
                # copy — StructType.add would mutate the caller's schema,
                # breaking a second read that reuses the same object
                from pyspark.sql import types as T

                schema = T.StructType(
                    list(schema.fields)
                    + [T.StructField(CORRUPT_COL, T.StringType())]
                )
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    return reader.json(paths, multiLine=False)


def split_corrupt(df: DataFrame):
    """(good_rows, corrupt_rows) from a keep_corrupt read.

    Caches the parsed frame: Spark refuses a query that reads ONLY the
    corrupt column from a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and both branches scan once this way anyway.
    """
    from pyspark.sql import functions as F

    # input_file_name() must be captured before the cache boundary —
    # cached rows have no file context
    df = df.withColumn("_source_file", F.input_file_name()).cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(
        CORRUPT_COL, "_source_file"
    )
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        CORRUPT_COL, "_source_file"
    )
    return good, bad
