from high_throughput_etl_pipeline_spark.operators.validation import (  # noqa: F401
    validate_files,
)
from high_throughput_etl_pipeline_spark.operators.batching import (  # noqa: F401
    assign_batches,
)
