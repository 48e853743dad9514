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


def read_ndjson(
    spark: SparkSession,
    paths: list[str] | str,
    schema=None,
    sampling_ratio: float | None = None,
) -> DataFrame:
    """S1 — N NDJSON files → one DataFrame (glue_batch_job.py:147-159).

    multiLine=False: one JSON object per line, splittable, parallel parse.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    return reader.json(paths, multiLine=False)
