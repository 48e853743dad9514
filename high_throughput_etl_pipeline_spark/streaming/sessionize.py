"""Custom stateful streaming operator: event sessionization.

The reference's only stateful construct is the per-file status machine
(DynamoDB CAS rows).  This module shows the engine's general-purpose
stateful primitive — ``applyInPandasWithState`` — with the classic
training-data/eventstream example: grouping a user's events into sessions
closed by an inactivity gap.

Two modes, one semantics:
- ``sessionize_batch``: gap-based sessions via window functions (lag +
  cumulative sum) — pure Catalyst, used for backfills and as the oracle
  for the streaming path.
- ``sessionize_stream``: the same sessions over an unbounded stream with
  per-user state and processing-time timeouts (GroupStateTimeout), emitting
  a session row when the gap closes it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, total_value DOUBLE"
)
_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT, total DOUBLE"


def sessionize_batch(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions, batch mode: session boundary where the gap to
    the previous event exceeds ``gap_minutes``; session id = cumulative
    count of boundaries (two window passes over the same partitioning —
    ONE shuffle on user_id, the second window reuses it)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap)
    ).cast("int")
    with_ids = events.withColumn("_new", new_session).withColumn(
        "_session_id", F.sum("_new").over(w)
    )
    return (
        with_ids.groupBy(user_col, "_session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .drop("_session_id")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessions with explicit per-user state.

    State = (start, last, n, total) epoch-seconds tuple; a batch's events
    extend the open session or close it (emitting the finished session)
    when the gap exceeds ``gap_minutes``.  Timeout closes idle sessions
    even with no new events for that user.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60.0

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                rows.append((user, start, last, n, total))
                state.remove()
        else:
            pdf = pd.concat(list(pdfs))
            ts = (
                pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000_000
            ).to_numpy()
            order = ts.argsort(kind="stable")
            ts = ts[order]
            vals = pdf[value_col].to_numpy()[order]
            if state.exists:
                start, last, n, total = state.get
            else:
                start = last = int(ts[0])
                n, total = 0, 0.0
            for t, v in zip(ts, vals):
                t = int(t)
                if n > 0 and (t - last) > gap_s:
                    rows.append((user, start, last, n, total))
                    start, n, total = t, 0, 0.0
                n += 1
                total += float(v)
                last = max(last, t)
            state.update((start, last, n, total))
            state.setTimeoutDuration(int(gap_s * 1000))
        out = pd.DataFrame(
            rows,
            columns=["user_id", "_start", "_end", "n_events", "total_value"],
        )
        out["session_start"] = pd.to_datetime(out["_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["_end"], unit="s")
        out["total_value"] = out["total_value"].round(4)
        yield out[
            ["user_id", "session_start", "session_end", "n_events", "total_value"]
        ]

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
