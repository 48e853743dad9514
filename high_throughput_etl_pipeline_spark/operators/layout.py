"""Z-order (Morton) data layout — multi-dimensional clustering for
file-skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-column min/max, and engines (Spark, Trino,
DuckDB) skip files/row-groups whose stats exclude the predicate.  A sort
on one column gives perfect skipping on THAT column and none on others;
interleaving the bits of several columns (the Morton/Z curve) gives good
skipping on ALL of them simultaneously — the layout behind
Delta/Iceberg's `OPTIMIZE ZORDER BY`.

Everything here is pure Column arithmetic (shifts, masks, adds) — JVM
whole-stage codegen, no UDFs — and the layout pass is a single
`repartitionByRange` shuffle followed by a within-partition sort, exactly
the cost of writing the data once.

Reference parity: the reference stores raw NDJSON→parquet with date-only
partitioning (glue_batch_job.py's `_date` partitioning); this operator is
the additive layout layer a 100 TB deployment needs for multi-predicate
scans (date × user × size, etc.).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column linearly onto ``[0, 2^bits)`` given its min/max.

    Degenerate range (min == max) maps to 0.  ``floor`` (not ``round``)
    keeps the bucketing portable: floor semantics are identical across
    engines, while round-half ties differ (Spark HALF_UP vs banker's).
    The max value is clamped into the top bucket.  NULL inputs map to
    bucket 0, explicitly: without the guard, a NULL propagates through
    ``floor(frac * top)`` and ``least()`` SKIPS nulls, silently clustering
    null keys with the MAXIMUM values (and diverging from engines whose
    least() propagates NULL).
    """
    top = 1 << bits
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.when(col.isNull(), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor(frac * F.lit(float(top))).cast("bigint"),
            F.lit(top - 1).cast("bigint"),
        )
    )


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit ``b`` of column ``i`` lands at position
    ``b * n_cols + i`` of the z-value.  ``n_cols * bits`` must fit in a
    signed 64-bit long (≤ 62 to stay clear of the sign bit)."""
    n = len(cols)
    assert n * bits <= 62, "z-value would overflow a signed long"
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("bigint")
    return out


def zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "_z",
) -> DataFrame:
    """Attach the Morton z-value of ``cols`` (numeric) as ``out_col``.

    Column ranges are taken from ONE metadata-scale aggregate (2×n
    scalars collected) so normalization is a pure per-row expression —
    the range pass is a map-side-combined global agg, not a sort.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    ranges = df.agg(*aggs).first()
    comps = [
        normalize_to_bits(
            F.col(c),
            F.lit(ranges[f"_min_{c}"]),
            F.lit(ranges[f"_max_{c}"]),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(out_col, interleave_bits(comps, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-ordered on ``cols``: range-partition by z-value into
    ``n_files`` output partitions, sort within each, drop the helper
    column.  Each parquet file then covers a compact hyper-rectangle of
    the key space, so min/max footer stats prune multi-predicate scans.

    Cost: one shuffle (the repartitionByRange) + an in-partition sort —
    identical asymptotics to any partitioned write.  At 100 TB run it
    per date-partition (layout inside the partition), never globally.
    """
    z = zvalue(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def rendezvous_shard(
    key: Column, n_shards: int, salt: str = "hrw"
) -> Column:
    """Rendezvous (highest-random-weight) shard id for ``key``:
    argmax over shards of ``md5(salt:key:shard)``.

    The HRW property this buys at scale: growing ``n_shards`` by one
    moves ONLY the keys whose new-shard hash wins — every surviving
    key keeps its old shard, so a resize relocates ~1/(n+1) of state
    instead of rehashing everything (classic mod-N moves ~n/(n+1)).
    Pure map-side Column arithmetic — an inline struct array argmax,
    no explode, no shuffle; ties are broken toward the larger shard id
    by the struct comparison, and are vanishingly rare under the
    60-bit hash."""
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    return F.array_max(
        F.array(
            *[
                F.struct(
                    md5_64(
                        F.concat(
                            F.lit(f"{salt}:"),
                            key.cast("string"),
                            F.lit(f":{s}"),
                        )
                    ).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n_shards)
            ]
        )
    )["s"]
