from high_throughput_etl_pipeline_spark.plans import analytics, metrics  # noqa: F401
