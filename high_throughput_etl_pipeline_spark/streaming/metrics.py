"""Streaming progress metrics — per-micro-batch throughput, latency, and
backpressure signals as a queryable DataFrame (SURVEY §2.6 ST7 ops side).

The reference emits per-run CloudWatch metrics and alarms on queue depth
(its SQS backlog is the backpressure signal; `lambda_manifest_builder.py`
publishes batch counts/durations).  The Spark analog is the
StreamingQuery progress feed: every micro-batch reports input rows,
processing rate, and per-phase durations.  This module turns that feed
into rows so the same alerting queries run on it:

- ``inputRowsPerSecond > processedRowsPerSecond`` sustained ⇒ the source
  outruns the sink — backpressure building (the SQS-depth-alarm analog).
  Under ``maxFilesPerTrigger`` rate limiting the file source holds a
  listing backlog, so the signal shows up as rising ``trigger_lag_sec``
  rather than unbounded memory.
- ``batch_duration_ms`` trending toward the trigger interval ⇒ raise the
  rate limit or scale executors.

Driver-side scale note: progress objects are one small dict per
micro-batch held in a bounded ring buffer (last ~100), so collecting
them on the driver is metadata-scale by construction — this never
touches the data path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("processed_rows_per_sec", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("add_batch_ms", T.LongType()),
        T.StructField("get_batch_ms", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("sink", T.StringType()),
    ]
)


def progress_records(query: StreamingQuery) -> list[dict]:
    """The query's retained progress feed as plain dicts (newest last)."""
    out = []
    for p in query.recentProgress:
        # pyspark exposes progress as json strings or dict-likes depending
        # on version; normalize through json
        d = p if isinstance(p, dict) else json.loads(str(p))
        dur = d.get("durationMs") or {}
        sources = d.get("sources") or [{}]
        out.append(
            {
                "batch_id": int(d.get("batchId", -1)),
                "ts": d.get("timestamp"),
                "num_input_rows": int(d.get("numInputRows", 0)),
                "input_rows_per_sec": float(d.get("inputRowsPerSecond") or 0.0),
                "processed_rows_per_sec": float(
                    d.get("processedRowsPerSecond") or 0.0
                ),
                "batch_duration_ms": int(dur.get("triggerExecution", 0)),
                "add_batch_ms": int(dur.get("addBatch", 0)),
                "get_batch_ms": int(dur.get("getBatch", 0)),
                "source": str((sources[0] or {}).get("description", "")),
                "sink": str((d.get("sink") or {}).get("description", "")),
            }
        )
    return out


def progress_dataframe(spark: SparkSession, query: StreamingQuery) -> DataFrame:
    """recentProgress as a typed DataFrame (one row per micro-batch)."""
    return spark.createDataFrame(progress_records(query), PROGRESS_SCHEMA)


def throughput_summary(progress: DataFrame) -> DataFrame:
    """One-row ops rollup: totals, rates, and the backpressure flag.

    ``backpressured`` is true when the mean input rate exceeds the mean
    processing rate over the retained window — the condition under which
    a rate-unlimited source would grow an unbounded backlog."""
    return progress.filter(F.col("num_input_rows") > 0).agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("num_input_rows").alias("total_rows"),
        F.round(F.avg("processed_rows_per_sec"), 2).alias("avg_rows_per_sec"),
        F.max("batch_duration_ms").alias("max_batch_ms"),
        F.round(F.avg("batch_duration_ms"), 1).alias("avg_batch_ms"),
        (
            F.avg("input_rows_per_sec") > F.avg("processed_rows_per_sec")
        ).alias("backpressured"),
    )
