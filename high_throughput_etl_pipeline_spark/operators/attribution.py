"""Multi-touch marketing attribution over an event log.

Given a stream of user events, a *conversion* (e.g. a purchase) is
credited back to the *touches* (non-conversion events — views, clicks,
campaign hits) the same user produced inside a lookback window.  Four
standard models are computed side by side:

- **first-touch** — the earliest touch gets full credit;
- **last-touch** — the latest touch gets full credit;
- **linear** — every touch gets an equal share;
- **position-based (U-shaped, 40/20/40)** — first and last get 40 %
  each, the middle touches share the remaining 20 % (with the usual
  degenerate conventions: a single touch gets 100 %, exactly two
  touches split 50/50).

Engine-parity discipline: fractional credit is integer micro-credit
(``scale`` = 1e6 per conversion) computed with integer division, so
every per-touch credit and every channel rollup is exact bigint
arithmetic — no order-dependent double sums anywhere.  The residue a
``div`` drops (e.g. 1e6/3 → 3×333333 = 999999) is deterministic and
identical in any engine.

Scale shape: the conversion↔touch pairing is an equi-join on the user
key plus a time-range predicate — both sides shuffle once on
``user_col``, and the per-conversion windows partition by the
conversion id, so no global window and no cross product ever appears.
A user's event history bounds the per-task work exactly like any
sessionization.

Reference parity: the reference has no attribution operator (its
analytics surface is the six Athena rollups,
reference/Athena.sql:114-177); extension surface in the
funnel/attribution family next to operators/sequence.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multi_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-touch credit rows for every (conversion, touch) pair.

    Output: ``(conv_id, user, channel, touch_pos, n_touches,
    first_touch, last_touch, linear_micros, position_micros)`` — one
    row per touch that lands inside ``[conv_ts - lookback, conv_ts)``
    of a conversion by the same user.  Conversions with zero touches
    simply produce no rows (credit models have nothing to assign).

    ``touch_pos`` orders touches by (ts, id) — the id tie-break makes
    first/last assignment total even when timestamps collide.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.filter(F.col(type_col) != conversion_type).select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("channel"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
    )
    j = conv.join(
        touch,
        on=[
            conv.user == touch.user,
            touch.touch_ts < conv.conv_ts,
            touch.touch_ts
            >= conv.conv_ts - F.expr(f"INTERVAL {lookback_days} DAYS"),
        ],
        how="inner",
    ).select(
        "conv_id", conv.user.alias("user"), "channel", "touch_id", "touch_ts"
    )
    w = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    wn = Window.partitionBy("conv_id")
    pos = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    p = j.select(
        "conv_id",
        "user",
        "channel",
        pos.alias("touch_pos"),
        n.alias("n_touches"),
    )
    is_first = F.col("touch_pos") == 1
    is_last = F.col("touch_pos") == F.col("n_touches")
    nt = F.col("n_touches")
    # position-based 40/20/40 in integer micro-credits: endpoints take
    # 2*scale div 5; with exactly two touches each endpoint takes half;
    # middles share scale div 5 by integer division (residue dropped
    # deterministically — identical in any engine)
    endpoint = F.when(nt == 2, F.lit(scale // 2)).otherwise(
        F.expr(f"(2 * {scale}) div 5")
    )
    position = (
        F.when(nt == 1, F.lit(scale))
        .when(is_first | is_last, endpoint)
        .otherwise(F.expr(f"({scale} div 5) div (n_touches - 2)"))
    )
    return p.select(
        "conv_id",
        "user",
        "channel",
        "touch_pos",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        is_first.cast("int").alias("first_touch"),
        is_last.cast("int").alias("last_touch"),
        F.expr(f"{scale} div n_touches").cast("bigint").alias(
            "linear_micros"
        ),
        position.cast("bigint").alias("position_micros"),
    )


def channel_credit_report(touches: DataFrame) -> DataFrame:
    """Roll per-touch credit up to the channel level: one row per
    channel with conversion reach and total credit under each model.
    All sums are bigint-exact; a consumer divides by ``scale`` once
    for display."""
    return (
        touches.groupBy("channel")
        .agg(
            F.countDistinct("conv_id").cast("bigint").alias(
                "conversions_touched"
            ),
            F.sum("first_touch").cast("bigint").alias("first_touch_wins"),
            F.sum("last_touch").cast("bigint").alias("last_touch_wins"),
            F.sum("linear_micros").cast("bigint").alias("linear_micros"),
            F.sum("position_micros").cast("bigint").alias(
                "position_micros"
            ),
        )
        .orderBy("channel")
    )
