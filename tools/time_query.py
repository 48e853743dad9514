"""Isolated single-query timing: fresh Spark session, one untimed warm
run at sf0.001, then best-of-N timed runs at the target SF dir.

    python tools/time_query.py <query_name> [sf_dir] [n_runs]

Prints one JSON line {"query": ..., "sf_dir": ..., "best": ..., "runs":
[...]}.  Used for A/B adjudication of bench outliers (run the same
command from a worktree of the comparison commit — identical harness,
identical machine state, no 260-query suite around it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_throughput_etl_pipeline_spark.queries import QUERIES
from high_throughput_etl_pipeline_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    try:
        fn(spark, "/root/testdata/sf0.001").count()  # warm codegen
    except Exception:
        pass
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        runs.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "best": min(runs),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
