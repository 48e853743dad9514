"""Change-data-capture application: fold an ordered I/U/D change log
into a base snapshot (latest-op-wins).

The batch half of the CDC story the merge family starts
(``operators/merge.py``: SCD2 history, partition-scoped upserts,
snapshot diff): a Debezium/DMS-style change log arrives as rows
``(key..., seq, op, attrs...)`` where ``op`` ∈ {I, U, D} and ``seq``
is a per-key monotonically increasing ordering (LSN / binlog position /
commit timestamp).  Applying it to the previous snapshot is two keyed
passes:

1. **Collapse the log**: one window per key keeps only the
   highest-``seq`` change — intermediate flip-flops (I→U→U→D) never
   touch the base table.
2. **Apply**: base rows with no surviving change pass through
   (left-anti join); the surviving change REPLACES the row (op I/U) or
   tombstones it (op D).

Scale shape: both passes shuffle on the merge key and nothing else —
a window and a join, no iteration, no driver state.  At warehouse
scale the apply step feeds ``merge.merge_upsert``'s partition-scoped
rewrite (only partitions holding changed keys rewrite); on a lakehouse
this whole module is ``MERGE INTO`` with ``QUALIFY row_number() = 1``
pushed into the source — the semantics here are exactly that statement,
value-checkable against an independent engine.

Reference parity: the reference's state tracker applies per-file status
transitions conditionally (SURVEY.md §2.3 J5, ``state/tracker.py``);
this generalizes conditional-update application to arbitrary keyed
tables with delete semantics — extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change log to the latest change per key.

    ``seq`` must order changes within a key (ties broken by ``op``
    descending — U over I over D would be ambiguous upstream data, but
    the tie-break keeps the result deterministic rather than
    partition-dependent).  One window, no other shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D change log to ``base``; returns the new snapshot
    with ``base``'s schema.

    ``changes`` must carry every ``base`` column plus ``seq_col`` and
    ``op_col`` (for op D the non-key attributes are ignored).  A key's
    latest op decides its fate: D removes it, I/U replaces (or inserts)
    the full row.  Unkeyed columns come wholly from the change row —
    partial-column updates should be joined to current values upstream.
    """
    latest = cdc_latest(changes, key_cols, seq_col, op_col)
    keys = latest.select(*key_cols)
    survivors = base.join(keys, on=key_cols, how="left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return survivors.unionByName(upserts)


__all__ = ["cdc_latest", "apply_cdc"]
