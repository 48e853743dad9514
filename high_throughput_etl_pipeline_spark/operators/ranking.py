"""Exact global ranking without a single-task global window.

``Window.orderBy(...)`` with an empty partition spec funnels every row
through ONE task — the classic scale-killer for rank/ntile/percent_rank
over a whole table.  ``global_rank`` gets the same exact 1-based ranks
with an all-parallel plan:

1. ``repartitionByRange`` on the sort key — partition *p*'s rows all sort
   before partition *p+1*'s (Spark's range exchange, same machinery as a
   distributed ORDER BY);
2. ``row_number`` within each range partition (window partitioned by
   ``spark_partition_id`` — parallel);
3. add each partition's exclusive prefix count.  The per-partition counts
   are metadata-sized (one row per shuffle partition), so they are
   collected to the driver and re-broadcast — the same bounded-collect
   pattern as the ANN codebook/query-set sites.

The caller must supply a TOTAL ordering (include a unique tie-break
column); with ties across a partition boundary, range partitioning could
otherwise split equal keys and make ranks run-dependent.

Distribution functions then come free in closed form from (rank, n):
``percent_rank = (rank-1)/(n-1)``, ``cume_dist = rank/n`` (exact for a
total ordering), and ``ntile(k)`` via the first-``n%k``-tiles-are-bigger
rule — see ``customer_value_ntiles`` in queries.py.

Reference parity: the reference has no distributed ranking (its Athena
reports lean on engine-side ORDER BY; e.g. report queries in
environments/prod/glue — see SURVEY.md §2.5); this is the Spark-first
form that survives a 15M-customer rank at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def take_top_k(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global top-``k`` under ``order_cols`` with 1-based
    ``rank_col``, all-parallel.

    ``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` —
    every partition keeps a bounded k-row heap and the driver merges
    ``k × partitions`` candidates — so no row outside the top-k ever
    crosses an exchange, and there is NO SinglePartition sort of the
    scored corpus.  The rank is then assigned by a window over the
    k-row survivor set only (k rows, one task, by construction tiny) —
    the same rank-after-reduction shape as ``key_skew_profile``.

    ``order_cols`` must be a total ordering (include a unique
    tie-break) or ranks at the k boundary are run-dependent.
    """
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_col, F.row_number().over(w).cast("int"))


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
) -> tuple[DataFrame, int]:
    """Attach an exact global 1-based ``rank_col`` under ``order_cols``.

    Returns ``(ranked_df, total_rows)`` — the total is already known
    driver-side from the offset computation, so callers get it without
    another action.  The range-partitioned input is pinned with an eager
    ``localCheckpoint`` (NOT ``persist``): both passes (count + rank) must
    see identical partition ids, and a recompute after cache eviction could
    re-sample different range bounds.  The checkpoint bypasses the
    CacheManager — no session-lifetime cache entry; its blocks are
    reclaimed by the ContextCleaner once the ranked result is dropped.
    """
    parts = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["_cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid INT, _off BIGINT"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        parts.join(F.broadcast(off_df), on="_pid")
        .withColumn(
            rank_col, (F.row_number().over(w) + F.col("_off")).cast("long")
        )
        .drop("_pid", "_off")
    )
    return ranked, acc


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cum_col: str = "cum",
):
    """Exact running total under a GLOBAL ordering without a global
    window: range-partition on the order columns, per-partition ordered
    prefix sums, then add each partition's broadcast offset (the sum of
    all earlier partitions) — the :func:`global_rank` two-pass trick
    applied to SUM.  An empty-partition-spec ``sum() over (order by …)``
    funnels every row through one task; this shape never does.

    Returns ``(df_with_cum, grand_total)`` — the total falls out of the
    offset pass for free.  Sums accumulate in decimal(38,0), so integer
    value columns cannot overflow mid-prefix.  The range-partitioned
    input is pinned with an eager localCheckpoint for the same
    two-pass-consistency reason as global_rank.
    """
    dec = "decimal(38,0)"
    parts = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=True)
    sums = {
        r["_pid"]: r["_s"]
        for r in parts.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast(dec)).alias("_s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, str(acc)))
        acc += int(sums[pid] or 0)
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, "0")], "_pid INT, _off STRING"
    ).select("_pid", F.col("_off").cast(dec).alias("_off"))
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        parts.join(F.broadcast(off_df), on="_pid")
        .withColumn(
            cum_col,
            F.sum(F.col(value_col).cast(dec)).over(w) + F.col("_off"),
        )
        .drop("_pid", "_off")
    )
    return out, acc
