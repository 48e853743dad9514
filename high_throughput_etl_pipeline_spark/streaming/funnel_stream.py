"""Streaming chained-funnel detection (CEP on an unbounded stream).

The streaming twin of ``operators/sequence.py:funnel_walk``: per-key
state holds the bound step timestamps (epoch seconds, one slot per
funnel stage) and every micro-batch advances the walk — slot *i* binds
to the first event of its type strictly after slot *i-1*'s bound
timestamp, identical to the batch semantics.  A conversion row is
emitted ONCE, in the micro-batch whose event binds the final slot
within the window; users mid-funnel just carry state.

Ordering contract (the same one every low-latency CEP engine makes):
slots never REBIND — an event older than an already-bound slot cannot
retroactively change the chain.  Feed the operator time-ordered input
(file streams of chronological logs, or a watermark-sorted upstream)
and the emitted set equals the batch walk exactly (pinned in
tests/test_streaming.py); under unbounded disorder the batch backfill
is the reconciliation path, which is why both share one semantics.

State is ``n_steps + 1`` small integers per ACTIVE user — users are
dropped from the store the moment they convert, so state is bounded by
the mid-funnel population, not the user universe.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming funnel conversions; see module docstring.

    Output (append): one row per CONVERSION —
    (key, t_0..t_{n-1} as epoch seconds, seconds_to_convert).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(steps)
    if n < 2:
        raise ValueError("funnel needs at least 2 steps")
    slot_fields = ", ".join(f"s{i} BIGINT" for i in range(n))
    state_schema = f"{slot_fields}, done BOOLEAN"
    out_fields = ", ".join(f"t_{i} BIGINT" for i in range(n))
    out_schema = (
        f"{key_col} BIGINT, {out_fields}, seconds_to_convert BIGINT"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            yield pd.DataFrame(columns=[key_col, *[f"t_{i}" for i in range(n)], "seconds_to_convert"])
            return
        pdf = pd.concat(list(pdfs))
        if state.exists:
            *slots, done = state.get
            slots = list(slots)
        else:
            slots, done = [None] * n, False
        rows = []
        if not done:
            ts = (
                pd.to_datetime(pdf[ts_col]).astype("int64")
                // 1_000_000_000
            ).to_numpy()
            order = ts.argsort(kind="stable")
            types = pdf[type_col].to_numpy()[order]
            ts = ts[order]
            for t, et in zip(ts, types):
                t = int(t)
                for i, s in enumerate(steps):
                    if (
                        slots[i] is None
                        and et == s
                        and (i == 0 or (slots[i - 1] is not None and t > slots[i - 1]))
                    ):
                        slots[i] = t
                        break
                if slots[n - 1] is not None:
                    span = slots[n - 1] - slots[0]
                    if within_seconds is None or span <= within_seconds:
                        rows.append((user, *slots, span))
                    done = True
                    break
        if done:
            # converted (or window-failed at completion): this user's
            # walk is finished — free the state slot
            state.remove()
        else:
            state.update((*slots, done))
        yield pd.DataFrame(
            rows,
            columns=[key_col, *[f"t_{i}" for i in range(n)], "seconds_to_convert"],
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
