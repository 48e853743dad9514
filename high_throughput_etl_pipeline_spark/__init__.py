"""high_throughput_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark re-expression of the capabilities of
``mygithub23/high-throughput-etl-pipeline`` (a serverless AWS NDJSON→Parquet
pipeline: S3→SQS→Lambda manifest builder→DynamoDB state→Glue Spark job→
Athena SQL).  Here the whole dataflow is one engine:

- batch + Structured Streaming ingest of NDJSON into date-partitioned,
  Snappy-compressed, all-string Parquet (the reference's core transform,
  ``environments/dev/glue/glue_batch_job.py``),
- a queryable file-state table replacing DynamoDB tracking,
- manifest batching / claim semantics as DataFrame operations,
- the Athena analytics layer as Spark SQL views + queries,
- large-scale training-data operators the reference lacks: dedup
  (exact/minhash-LSH/simhash/jaccard), similarity search, text analysis,
  multimodal column plumbing.

Design rules (100 TB): declarative DataFrame plans only, no Python UDFs on
hot paths, broadcast small dims, no driver-side loops over data.
"""

__version__ = "0.1.0"

from high_throughput_etl_pipeline_spark.session import get_spark  # noqa: F401
