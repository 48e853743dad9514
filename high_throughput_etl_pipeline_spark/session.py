"""SparkSession factory with the engine's tuned defaults.

Mirrors the reference's Spark conf baseline (glue_batch_job.py:81-89):
AQE on, partition coalescing on, 128 MB maxPartitionBytes, Snappy parquet,
mergeSchema off, filter pushdown on — plus Arrow for the pandas-UDF
extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf shared by batch and streaming.  Keys are plain Spark SQL conf —
# nothing Glue/AWS-specific survives in the new engine.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.parquet.mergeSchema": "false",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # generous broadcast threshold: dimension tables stay broadcast even
    # at large SF (region/nation/supplier are tiny relative to facts)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "high-throughput-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    local = False
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        local = master.startswith("local")
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if local:
        # local mode runs all task threads in the ONE driver JVM, whose
        # stock 1g heap is a misconfiguration next to local[32]: a long
        # suite accumulates localCheckpoint blocks + broadcasts across
        # queries and OOMs at larger SF (observed: the sf1 bench died at
        # query 13 in 1g; every query passes in isolation).  Only
        # effective at JVM launch — getOrCreate on a live session keeps
        # its existing heap.  On a real cluster the executor/driver
        # memory comes from spark-submit, never from here.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else int(cpus)
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
