"""Delimited-text sources (CSV/TSV) — S1/S2 semantics over the second
most common drop-zone format after NDJSON.

Same discipline as ``sources/ndjson.py``: a multi-path read IS the
union operator, schemas are explicit at scale (inference costs a pass),
and malformed rows take the ROW-level quarantine path instead of
failing the batch — PERMISSIVE parse with a ``_corrupt_record``
column, split downstream by ``ndjson.split_corrupt`` (shared: the
corrupt-column contract is format-independent).

CSV-specific hazards handled here rather than by every caller:
``multiLine=False`` keeps files splittable (a quoted embedded newline
needs multiLine=True, which makes the whole file one split — document
the trade, default to splittable); ``enforceSchema`` stays off so a
header/schema mismatch surfaces as corrupt rows, not silent
misalignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from high_throughput_etl_pipeline_spark.sources.ndjson import CORRUPT_COL


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    schema=None,
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt: bool = False,
    sampling_ratio: float | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """N delimited files → one DataFrame (mirror of
    ``ndjson.read_ndjson``; same quarantine contract).

    ``keep_corrupt=True`` (requires an explicit schema) adds
    ``_corrupt_record`` holding each unparseable line; filter it with
    ``ndjson.split_corrupt``.
    """
    if keep_corrupt and schema is None:
        raise ValueError(
            "keep_corrupt=True requires an explicit schema — Spark only "
            "routes malformed rows to the corrupt column when parsing "
            "against a declared shape; silently ignoring the flag would "
            "let bad rows pass as all-null data"
        )
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("multiLine", str(multi_line).lower())
        .option("mode", "PERMISSIVE")
        .option("enforceSchema", "false")
    )
    if schema is not None:
        if keep_corrupt:
            if isinstance(schema, str):
                schema = f"{schema}, {CORRUPT_COL} STRING"
            else:
                from pyspark.sql import types as T

                schema = T.StructType(
                    list(schema.fields)
                    + [T.StructField(CORRUPT_COL, T.StringType())]
                )
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio)).option(
            "inferSchema", "true"
        )
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


__all__ = ["read_csv"]
