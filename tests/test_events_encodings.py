"""_read_events must survive testdata regeneration: the driver has shipped
events.ts as parquet TIMESTAMP(NANOS), naive TIMESTAMP(MICROS), and could
ship UTC-adjusted micros or a raw int64.  All four must decode to the same
UTC instants (nanos truncated to micros, exactly like DuckDB)."""

from __future__ import annotations

import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from high_throughput_etl_pipeline_spark.queries import _read_events

_INSTANTS_US = [1704067200_000000, 1704070800_123456, 1706745599_999999]
_EXPECTED = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 1, 0, 0, 123456),
    datetime.datetime(2024, 1, 31, 23, 59, 59, 999999),
]


def _write(tmp_path, arrow_type, values):
    table = pa.table(
        {
            "event_id": pa.array(range(len(values)), pa.int64()),
            "ts": pa.array(values, arrow_type),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)
    return path


@pytest.mark.parametrize(
    "arrow_type,values",
    [
        ("ns", [pd.Timestamp(us * 1000, unit="ns") for us in _INSTANTS_US]),
        ("us-naive", [pd.Timestamp(us, unit="us") for us in _INSTANTS_US]),
        ("us-utc", [pd.Timestamp(us, unit="us", tz="UTC") for us in _INSTANTS_US]),
        ("int64", list(_INSTANTS_US)),
    ],
    ids=["nanos", "micros_naive", "micros_utc", "raw_long_micros"],
)
def test_read_events_all_encodings(spark, tmp_path, arrow_type, values):
    if arrow_type == "ns":
        at = pa.timestamp("ns")
    elif arrow_type == "us-naive":
        at = pa.timestamp("us")
    elif arrow_type == "us-utc":
        at = pa.timestamp("us", tz="UTC")
    else:
        at = pa.int64()
    path = _write(tmp_path, at, values)
    df = _read_events(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    if arrow_type == "int64":
        # raw long is interpreted as NANOS since epoch (the only encoding the
        # driver has shipped as long); truncation drops sub-microsecond bits
        expected = [
            datetime.datetime.utcfromtimestamp(us // 1_000_000_000).replace(
                microsecond=(us // 1000) % 1_000_000
            )
            for us in _INSTANTS_US
        ]
        assert got == expected
    else:
        assert got == _EXPECTED
