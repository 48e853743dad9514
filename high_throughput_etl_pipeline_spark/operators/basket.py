"""Market-basket analysis: pairwise association rules.

support / confidence / lift over co-occurring items — the classic
affinity mining (Agrawal et al. '93) restricted to the pairwise case,
which is the part that survives at scale: per-basket pair expansion is
bounded by basket size squared (baskets are small by nature), never by
corpus size, and everything after is grouped counting.

Engine-parity discipline: all counts are exact bigints; support and
confidence are single double divisions of two bigints; lift's cross
products run in decimal(38,0) (HUGEINT in a SQL oracle) before ONE
double division — no float accumulation anywhere, so rules rank
identically in any engine (rounded lift, then item names, is a total
order).

Reference parity: the reference has no affinity operator (analytics
surface is the six Athena rollups, reference/Athena.sql:114-177);
extension surface in the analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
) -> DataFrame:
    """Directed pairwise rules antecedent→consequent with exact counts
    and (support, confidence, lift), unranked — callers top-k on
    (lift, antecedent, consequent) with a distributed TakeOrdered.

    Scale shape: one distinct (basket, item) projection, a per-basket
    self-equi-join on the basket key (bounded by basket width), one
    pair groupBy, two small joins to the item-count table, and a
    one-row broadcast of the basket total.  The basket self-join
    shuffles once on the basket key; nothing is quadratic in baskets
    or items.
    """
    items = (
        baskets.select(
            F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_baskets = items.agg(
        F.countDistinct("_o").cast("bigint").alias("_nb")
    )
    ic = items.groupBy(F.col("_i")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_ni")
    )
    a = items.select(F.col("_o"), F.col("_i").alias("_ia"))
    b = items.select(F.col("_o"), F.col("_i").alias("_ib"))
    pc = (
        a.join(b, on=["_o"])
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nab"))
        .filter(F.col("_nab") >= min_support_count)
    )
    rules = pc.select(
        F.col("_ia").alias("antecedent"),
        F.col("_ib").alias("consequent"),
        F.col("_nab").alias("n_both"),
    ).unionAll(
        pc.select(
            F.col("_ib").alias("antecedent"),
            F.col("_ia").alias("consequent"),
            F.col("_nab").alias("n_both"),
        )
    )
    out = (
        rules.join(
            # not forced-broadcast: the item-count table is one row per
            # distinct item and can be dimension- OR fact-sized; AQE
            # picks broadcast when it fits
            ic.select(F.col("_i").alias("antecedent"),
                      F.col("_ni").alias("n_ant")),
            on="antecedent",
        )
        .join(
            ic.select(F.col("_i").alias("consequent"),
                      F.col("_ni").alias("n_cons")),
            on="consequent",
        )
        .join(F.broadcast(n_baskets))
    )
    lift = (
        (F.col("n_both").cast(_DEC) * F.col("_nb")).cast("double")
        / (F.col("n_ant").cast(_DEC) * F.col("n_cons")).cast("double")
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_ant",
        "n_cons",
        F.col("_nb").alias("n_baskets"),
        F.round(F.col("n_both") / F.col("_nb"), 6).alias("support"),
        F.round(F.col("n_both") / F.col("n_ant"), 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )
