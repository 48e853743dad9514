"""Binned range join — non-equi time-window joins that scale.

A naive `l.ts BETWEEN r.ts - w AND r.ts + w` join plans as
BroadcastNestedLoopJoin (or a cartesian per key): |L|×|R| comparisons.
The binned form maps each row to fixed-width time bins — right rows to
their bin, left rows to every bin their window overlaps — so the join is
an EQUI-join on (key, bin) followed by the exact predicate.  Complexity
drops to |pairs within window| + bin overhead; Catalyst plans a normal
shuffled/broadcast hash join.

This is the general pattern for "events within Δt of each other",
point-in-interval, and interval-overlap joins at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_within_window(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    window_seconds: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bin_seconds: float | None = None,
) -> DataFrame:
    """Pairs (left row, right row) sharing ``on`` keys with
    ``|left_ts - right_ts| <= window_seconds``.

    Right rows land in one bin; left rows replicate to the 2-3 bins their
    window can overlap (bin width defaults to the window size, bounding
    replication at 3x).  Returns left.* plus right's timestamp as
    ``r_ts`` — callers project/aggregate from there.
    """
    bin_s = float(bin_seconds or window_seconds)
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))

    lo_bin = F.floor((l_epoch - window_seconds) / bin_s).cast("bigint")
    hi_bin = F.floor((l_epoch + window_seconds) / bin_s).cast("bigint")
    l_binned = left.withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    r_binned = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_r_ts"),
        F.floor(r_epoch / bin_s).cast("bigint").alias("_bin"),
    )
    joined = l_binned.join(r_binned, on=[*on, "_bin"])
    exact = (
        F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp("_r_ts"))
        <= window_seconds
    )
    return joined.filter(exact).drop("_bin").withColumnRenamed("_r_ts", "r_ts")
