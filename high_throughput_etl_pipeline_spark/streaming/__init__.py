from high_throughput_etl_pipeline_spark.streaming.ingest_stream import (  # noqa: F401
    start_ingest_stream,
)
