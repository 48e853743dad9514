from high_throughput_etl_pipeline_spark.sources.ndjson import (  # noqa: F401
    read_ndjson,
    resolve_manifest,
)
from high_throughput_etl_pipeline_spark.sources.parquet_sink import (  # noqa: F401
    write_date_partitioned_parquet,
)
from high_throughput_etl_pipeline_spark.sources.reports import (  # noqa: F401
    GLUE_REPORT_SCHEMA,
    LAMBDA_REPORT_SCHEMA,
    register_report_views,
)
