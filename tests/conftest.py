from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from high_throughput_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture()
def ndjson_dir(tmp_path):
    """Synthesize a small NDJSON input dir: 2 dates, nested structs."""
    d = tmp_path / "input"
    d.mkdir()
    paths = []
    for i in range(6):
        date = "2026-08-12" if i < 4 else "2026-08-10"
        p = d / f"{date}-file{i:03d}.ndjson"
        with open(p, "w") as f:
            for j in range(20):
                f.write(
                    json.dumps(
                        {
                            "id": f"evt_{i}_{j}",
                            "v": j,
                            "flag": j % 2 == 0,
                            "nested": {"a": j % 3, "tags": ["x", "y"]},
                        }
                    )
                    + "\n"
                )
        paths.append(str(p))
    return str(d), paths
