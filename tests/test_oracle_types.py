"""Registry-wide oracle output-type lint.

The driver's correctness hash is type/serialization-sensitive: a DuckDB
oracle output column that binds HUGEINT (e.g. any uncast ``SUM(BIGINT)``,
which DuckDB widens to int128) or DECIMAL (e.g. arithmetic over bare
decimal literals) serializes as Arrow ``decimal128`` and hash-mismatches
a value-identical Spark ``bigint``/``double`` column.  This is exactly
what kept the survival family driver-red for four rounds (r8-r11) while
the value-comparing local gate stayed green — see VERDICT.md r11.

This lint BINDS every registered oracle against the sf0.01 views (no
execution — DuckDB resolves output types at bind time, so the whole
registry checks in seconds) and asserts every output column lands in the
closed set of portable types.  Any new oracle that sneaks in a widened
type fails here immediately instead of four rounds later on the driver.
"""

from __future__ import annotations

ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
           "VARCHAR", "DATE", "BOOLEAN"}


def test_every_oracle_binds_portable_output_types():
    from tools.check_correctness import duck_connection
    from high_throughput_etl_pipeline_spark.queries import ORACLES

    con = duck_connection()
    offenders = []
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # bind failure is its own defect
            offenders.append((name, "<bind-error>", str(e)[:200]))
            continue
        for col, typ in zip(rel.columns, rel.types):
            base = str(typ).split("(")[0].upper()
            if base not in ALLOWED:
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "oracle output columns bind non-portable DuckDB types "
        "(HUGEINT/DECIMAL serialize as Arrow decimal128 and flip the "
        f"driver hash): {offenders}"
    )
