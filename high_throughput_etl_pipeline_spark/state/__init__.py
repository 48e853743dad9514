from high_throughput_etl_pipeline_spark.state.tracker import (  # noqa: F401
    FileStateTracker,
)
from high_throughput_etl_pipeline_spark.state.manifest import (  # noqa: F401
    build_manifest_docs,
)
