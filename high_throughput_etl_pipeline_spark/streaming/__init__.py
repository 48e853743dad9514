from high_throughput_etl_pipeline_spark.streaming.ingest_stream import (  # noqa: F401
    start_ingest_stream,
)
from high_throughput_etl_pipeline_spark.streaming.metrics import (  # noqa: F401
    progress_dataframe,
    progress_records,
    throughput_summary,
)
