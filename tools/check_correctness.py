"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names, BOUND OUTPUT TYPES, and
order-insensitive values (columns sorted by name, floats compared exactly
after the queries' own rounding).  Usage:
python tools/check_correctness.py [name ...]

The type check exists because the driver's hash is type/serialization-
sensitive: a DuckDB oracle whose SUM(BIGINT) widens to HUGEINT serializes
as Arrow decimal128 and hash-mismatches a value-identical Spark bigint
column (the r8-r11 survival-family reds — VERDICT r11).  ``fetchall()``
value comparison alone is type-blind (Decimal(86) == 86 stringified), so
this gate now (a) rejects any oracle output column binding HUGEINT/
UHUGEINT/DECIMAL, and (b) rejects cross-family (int vs float vs string vs
date vs bool) disagreements between the oracle's bound type and Spark's
schema for the same column name.
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


# Widened / arbitrary-precision DuckDB output types that serialize as
# Arrow decimal128 and therefore hash-mismatch a value-identical Spark
# int64/float64 column on the driver.  Never allowed in an oracle output.
BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
               "USMALLINT", "UINTEGER", "UBIGINT"}


def duck_type_family(t: str) -> str:
    """Collapse a DuckDB type string to a comparison family."""
    base = t.split("(")[0].upper()
    if base in _INT_FAMILY:
        return "int"
    if base in {"DOUBLE", "FLOAT", "REAL"}:
        return "float"
    if base in {"VARCHAR", "TEXT", "STRING"}:
        return "string"
    if base == "BOOLEAN":
        return "bool"
    if base in {"DATE"}:
        return "date"
    if base.startswith("TIMESTAMP"):
        return "timestamp"
    return base.lower()


def spark_type_family(t: str) -> str:
    """Collapse a Spark simpleString dtype to the same families."""
    base = t.lower()
    if base in {"tinyint", "smallint", "int", "integer", "bigint", "long"}:
        return "int"
    if base in {"double", "float"}:
        return "float"
    if base == "string":
        return "string"
    if base == "boolean":
        return "bool"
    if base == "date":
        return "date"
    if base.startswith("timestamp"):
        return "timestamp"
    return base


def oracle_type_issues(con, sql, spark_dtypes=None):
    """Bind ``sql`` (no execution) and return a list of type defects:
    banned widened output types, plus cross-family disagreements vs the
    Spark schema (``spark_dtypes``: list of (name, dtype) pairs)."""
    rel = con.sql(sql)
    issues = []
    sfam = (
        {n: spark_type_family(t) for n, t in spark_dtypes}
        if spark_dtypes is not None
        else None
    )
    for c, t in zip(rel.columns, rel.types):
        ts = str(t)
        if ts.upper().startswith(BANNED_DUCK_TYPES):
            issues.append(f"oracle col {c!r} binds {ts} (widened type)")
            continue
        if sfam is not None and c in sfam:
            dfam = duck_type_family(ts)
            if dfam != sfam[c]:
                issues.append(
                    f"col {c!r}: oracle {ts} ({dfam}) vs spark {sfam[c]}"
                )
    return issues


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
            tissues = oracle_type_issues(con, ORACLES[name], sdf.dtypes)
        except Exception as e:
            print(f"FAIL  {name}: oracle bind error: {str(e)[:300]}")
            failures += 1
            continue
        if tissues:
            print(f"FAIL  {name}: type mismatch: {'; '.join(tissues)}")
            failures += 1
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
