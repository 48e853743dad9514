"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names, and order-insensitive values
(columns sorted by name, floats compared exactly after the queries' own
rounding).  Usage:  python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def main(only: list[str]) -> int:
    from high_throughput_etl_pipeline_spark.queries import ORACLES, QUERIES
    from high_throughput_etl_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection()
    failures = 0
    names = only or list(QUERIES)
    for name in names:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(drows)}")
            failures += 1
            continue
        sn = normalize(srows, scols)
        dn = normalize(drows, dcols)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows hash-match")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
