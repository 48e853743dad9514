"""Event-sequence pattern matching (CEP-lite) over keyed event streams.

Two complementary forms of "did this ordered thing happen, and when":

- :func:`funnel_walk` — the chained-first-occurrence funnel: step *i*
  binds to the EARLIEST event of its type strictly after step *i-1*'s
  timestamp (step 0 binds to its first occurrence overall).  This is
  the classic conversion-path semantics (each stage must follow the
  previously bound stage, not just any earlier stage), strictly
  stronger than first-touch funnels: first-touch says a click and a
  view both happened in order; the walk says THE click followed THE
  bound view.  Deterministic by construction — every bound value is a
  MIN over a set defined only by timestamps, so ties collapse.

- :func:`event_type_patterns` — regex CEP over the per-key event-type
  string: each event becomes one character (caller-supplied alphabet),
  the key's history becomes a chronologically ordered string, and any
  regular expression over that alphabet is a pattern query (runs,
  adjacency, alternation).  Both Spark (Java regex) and standard
  engines (RE2 etc.) agree on leftmost non-overlapping counting for
  the backtracking-free patterns this is meant for — keep patterns to
  character classes, literals, and greedy quantifiers.

Scale shape: both are ONE groupBy(key) shuffle.  funnel_walk folds the
sorted per-key event array once (array fold, JVM-side, no Python);
event_type_patterns aggregates the per-key string then evaluates each
regex map-side.  Per-key history must fit an array — the same bound as
any per-entity sessionization; for keys with unbounded history, window
the input first (the caller picks the horizon, e.g. 90 days).

Reference parity: the reference has no sequence/CEP operator (its
analytics are the six Athena rollups — reference/Athena.sql:114-177);
this is extension surface in the LLM-pipeline/product-analytics family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_walk(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Chained-first-occurrence funnel over ``steps``.

    Output: one row per key with ``t_0 .. t_{n-1}`` (bound step
    timestamps, NULL once the chain breaks), ``steps_completed``,
    ``converted`` and ``seconds_to_convert`` (NULL unless all steps
    bound; if ``within_seconds`` is given, a completed chain whose
    total span exceeds it does NOT count as converted — the span
    check applies to the chain the walk bound, by design: bounded-
    window restart semantics belong to a stateful CEP engine, this is
    the deterministic single-pass form).

    Single grouped pass: sort each key's (ts, type) pairs, fold once
    left-to-right filling step slots in order.  Processing events in
    ascending time order makes "first qualifying event fills the
    slot" exactly the chained-MIN semantics an independent engine
    reproduces with nested subqueries.
    """
    n = len(steps)
    if n < 2:
        raise ValueError("funnel needs at least 2 steps")
    ev = df.select(
        F.col(key_col).alias("_k"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
        ).alias("_e"),
    )
    # slots start NULL; fold the time-sorted event array once.  Slot i
    # fills with the first event of type steps[i] whose ts is strictly
    # after slot i-1 (slot 0: first occurrence overall).  A later
    # event can never displace a bound slot — MIN semantics.
    acc0 = F.array(
        *[F.lit(None).cast("timestamp") for _ in range(n)]
    )

    def step_fn(acc: Column, e: Column) -> Column:
        out = acc
        # build the updated slot array: at most one slot changes per
        # event, and slot i is only considered when i-1 is bound and
        # i is still NULL — evaluated as a nested when-chain so the
        # first applicable slot wins (slots bind in order anyway)
        cond = None
        new = None
        for i, s in enumerate(steps):
            prev_ok = (
                F.lit(True)
                if i == 0
                else F.element_at(acc, i).isNotNull()
                & (e["ts"] > F.element_at(acc, i))
            )
            c = (
                F.element_at(acc, i + 1).isNull()
                & (e["et"] == F.lit(s))
                & prev_ok
            )
            filled = F.concat(
                F.slice(acc, 1, i),
                F.array(e["ts"]),
                F.slice(acc, i + 2, n - i - 1),
            )
            if cond is None:
                cond, new = c, F.when(c, filled)
            else:
                new = new.when(c, filled)
        return new.otherwise(out)

    walked = (
        ev.groupBy("_k")
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
        .select(
            F.col("_k").alias(key_col),
            F.aggregate(F.col("_evs"), acc0, step_fn).alias("_slots"),
        )
    )
    slot_cols = [
        F.element_at(F.col("_slots"), i + 1).alias(f"t_{i}")
        for i in range(n)
    ]
    out = walked.select(F.col(key_col), *slot_cols)
    completed = F.size(
        F.filter(
            F.array(*[F.col(f"t_{i}") for i in range(n)]),
            lambda t: t.isNotNull(),
        )
    )
    span = (
        F.col(f"t_{n-1}").cast("long") - F.col("t_0").cast("long")
    )
    converted = F.col(f"t_{n-1}").isNotNull()
    if within_seconds is not None:
        converted = converted & (span <= F.lit(within_seconds))
    return out.select(
        key_col,
        *[f"t_{i}" for i in range(n)],
        completed.cast("int").alias("steps_completed"),
        converted.alias("converted"),
        F.when(converted, span).alias("seconds_to_convert"),
    )


def event_type_patterns(
    df: DataFrame,
    alphabet: dict[str, str],
    patterns: dict[str, str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str | None = None,
) -> DataFrame:
    """Regex CEP: per key, the chronologically ordered event-type
    string (one char per event via ``alphabet``) plus one
    leftmost-non-overlapping match COUNT per named pattern.

    ``tie_col`` breaks equal-timestamp ordering (REQUIRED for engine
    parity whenever two events of different types can share a
    timestamp — without it the string itself is run-dependent).
    Events whose type is missing from ``alphabet`` are dropped (the
    alphabet IS the filter).

    Output: (key, seq_len, n_<pattern-name>...).
    """
    code = None
    for t, ch in alphabet.items():
        if len(ch) != 1:
            raise ValueError(f"alphabet maps {t!r} to non-char {ch!r}")
        c = F.when(F.col(type_col) == F.lit(t), F.lit(ch))
        code = c if code is None else code.when(
            F.col(type_col) == F.lit(t), F.lit(ch)
        )
    order = [F.col(ts_col)] + (
        [F.col(tie_col)] if tie_col is not None else []
    )
    ev = df.select(
        F.col(key_col).alias("_k"),
        F.struct(*order, code.alias("ch")).alias("_e"),
    ).filter(F.col("_e.ch").isNotNull())
    seqs = (
        ev.groupBy("_k")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("_e")),
                    lambda e: e["ch"],
                ),
            ).alias("_seq")
        )
    )
    cols = [
        F.col("_k").alias(key_col),
        F.length("_seq").cast("int").alias("seq_len"),
    ]
    for name, pat in patterns.items():
        cols.append(
            F.regexp_count(F.col("_seq"), F.lit(pat))
            .cast("int")
            .alias(f"n_{name}")
        )
    return seqs.select(*cols)
