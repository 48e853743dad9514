"""2-D skyline (Pareto frontier) without a global sort.

A row is on the skyline of (minimize ``low_col``, maximize ``high_col``)
iff no other row is at least as good on both axes and strictly better
on one.  The classic sequential algorithm sorts by ``low_col`` and keeps
a running max of ``high_col`` — an empty-partition-spec window, the
single-task shape this repo bans (`operators/ranking.py:3`).

The distributed formulation decomposes into:

1. ONE grouped agg to the *level frame* — one row per distinct
   ``low_col`` value carrying ``max(high_col)`` at that level.  All
   dominance information lives here: a row is dominated by a
   strictly-lower level iff that level's max beats it, and by its own
   level iff its level max beats it.
2. An exact exclusive prefix-max over levels via the two-pass
   range-partition trick (per-partition ``rowsBetween`` window + a
   driver-merged per-partition offset — the :func:`ranking.global_cumsum`
   shape applied to MAX).  Level rows are distinct by construction, so
   a ROWS frame is safe (no peer ambiguity).
3. A broadcast join of the (tiny) annotated level frame back over the
   base scan — map-side filter, no second shuffle of the data.

Scale: the base table is scanned twice (agg + filter) and shuffled only
by ``low_col`` into the level agg; the level frame is |distinct lows|
rows — KBs even at 1e12-row inputs with cents-granular prices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_levels(
    df: DataFrame, low_col: str, high_col: str
) -> DataFrame:
    """Annotated level frame: one row per distinct ``low_col`` with
    ``lvl_max`` (max ``high_col`` at the level) and ``prefix_max``
    (max ``high_col`` over all strictly lower levels; NULL at the
    frontier's cheap end)."""
    lvl = df.groupBy(F.col(low_col).alias("_low")).agg(
        F.max(high_col).alias("lvl_max")
    )
    parts = lvl.repartitionByRange("_low").withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=True)
    pmax = {
        r["_pid"]: r["_m"]
        for r in parts.groupBy("_pid").agg(F.max("lvl_max").alias("_m")).collect()
    }
    offsets, running = [], None
    for pid in sorted(pmax):
        offsets.append((pid, running))
        running = pmax[pid] if running is None else max(running, pmax[pid])
    spark = df.sparkSession
    # the offset column must carry lvl_max's own type — a hardcoded
    # BIGINT would make createDataFrame's schema verification raise for
    # double/decimal metrics (the offsets are collected lvl_max values)
    off_type = dict(parts.dtypes)["lvl_max"]
    off_df = spark.createDataFrame(
        offsets or [(0, None)], f"_pid INT, _off {off_type}"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_low")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parts.join(F.broadcast(off_df), on="_pid")
        .withColumn(
            "prefix_max", F.greatest(F.max("lvl_max").over(w), F.col("_off"))
        )
        .drop("_pid", "_off")
    )


def skyline_2d(
    df: DataFrame,
    low_col: str,
    high_col: str,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier of (min ``low_col``,
    max ``high_col``).  Ties — multiple rows at an undominated
    (low, high) point — are all kept (none strictly dominates another).
    """
    lvl = skyline_levels(df, low_col, high_col)
    cond = F.col("prefix_max").isNull() | (
        F.col("prefix_max") < F.col(high_col)
    )
    return (
        df.join(
            F.broadcast(lvl),
            df[low_col] == lvl["_low"],
        )
        .filter(cond & (F.col(high_col) == F.col("lvl_max")))
        .drop("_low", "lvl_max", "prefix_max")
    )
