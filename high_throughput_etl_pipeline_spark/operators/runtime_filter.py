"""Explicit Bloom runtime filters: map-side pruning for huge⋈medium
joins.

Spark's optimizer injects bloom runtime filters for SOME shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only when
the build side materializes first and stats line up.  This module makes
the pattern explicit and deterministic: compress the build side's key
set into an ``m_bits`` Bloom filter (k Kirsch-Mitzenmacher double
hashes), ship it as ONE broadcast row (``m_bits/64`` longs — 64 KB at
the default), and drop non-colliding probe rows MAP-SIDE before the
confirming equi-join.  False positives cost only wasted join probes
(the confirming join removes them); there are no false negatives by
construction, so pruned results are bit-identical to the plain join.

When to use at 100 TB: a semi/inner join where the probe side is the
full corpus and the build side is too big to broadcast as a hash
relation but its KEY SET fits a Bloom budget — decontamination against
a benchmark suite, tombstone filtering, "seen-before" checks.  The only
probe-side shuffle left is proportional to the match volume, not the
corpus.

First extracted from ``corpus.bloom_contamination`` (which now builds
on this module); kept general: any key column, any bit budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 19
DEFAULT_K = 5

# signed-int64 single-bit masks, indexed by bit position (bit 63 is
# int64-min); shared by the build and probe sides
_MASKS = [(1 << b) - ((1 << 64) if b == 63 else 0) for b in range(64)]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k double-hash bit positions for ``key`` — xxhash64 seeded per
    lane by a literal column, so lanes are independent."""
    if m_bits % 64 != 0 or m_bits <= 0:
        # positions range over [0, m_bits) but the filter array covers
        # m_bits//64 words — a ragged tail would drop its bits on build
        # and NULL out the probe predicate: silent FALSE NEGATIVES,
        # the one failure mode a Bloom filter must never have
        raise ValueError(
            f"m_bits={m_bits} must be a positive multiple of 64"
        )
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _bit_of(pos: Column) -> Column:
    return F.element_at(
        F.lit(_MASKS), F.pmod(pos, F.lit(64)).cast("int") + 1
    )


def _word_of(pos: Column) -> Column:
    return (pos / 64).cast("int")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Compress ``keys[key_col]`` (distinct applied here) into a one-row
    ``_bloom array<bigint>`` DataFrame.

    The build aggregates (word, bit-mask) entries to ``m_bits/64`` rows
    and collects them — metadata-scale, independent of key count.  The
    filter rides as a broadcast COLUMN, never an ``F.lit`` array: a
    2^19-bit literal embeds 8192 constants into generated code and the
    projection falls out of codegen (measured 6.5 s vs 2.4 s at sf0.1
    for an identical probe); the one-row frame is also the form that
    generalizes to a real broadcast variable.
    """
    n_words = m_bits // 64
    key = F.col(key_col)
    entries = (
        keys.select(key.alias("_k"))
        .distinct()
        .select(
            F.explode(
                F.array(*_positions(F.col("_k"), m_bits, k))
            ).alias("_pos")
        )
        .select(
            _word_of(F.col("_pos")).alias("_w"),
            _bit_of(F.col("_pos")).alias("_m"),
        )
    )
    filled = {
        r["_w"]: r["_bits"]
        for r in entries.groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    }
    arr = [filled.get(w, 0) for w in range(n_words)]
    return keys.sparkSession.createDataFrame(
        [(arr,)], "_bloom array<bigint>"
    )


def might_contain(
    key: Column,
    bloom: Column = None,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """The probe predicate: true iff every lane's bit is set in the
    ``_bloom`` column (default ``F.col('_bloom')``) — evaluate after
    cross-joining the broadcast one-row filter frame in."""
    if bloom is None:
        bloom = F.col("_bloom")
    pred = None
    for pos in _positions(key, m_bits, k):
        hit = (
            F.element_at(bloom, _word_of(pos) + 1).bitwiseAND(_bit_of(pos))
            != 0
        )
        pred = hit if pred is None else (pred & hit)
    return pred


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``probe`` rows whose ``key_col`` exists in ``build`` — exact
    left-semi semantics (bloom prunes map-side; the confirming
    left-semi equi-join against the true distinct key set removes
    false positives).  Only rows surviving the Bloom ride the shuffle:
    cost tracks match volume, not probe size."""
    bloom_df = bloom_build(build, key_col, m_bits, k)
    keys = build.select(F.col(key_col)).distinct()
    pruned = (
        probe.crossJoin(F.broadcast(bloom_df))
        .filter(might_contain(F.col(key_col), m_bits=m_bits, k=k))
        .drop("_bloom")
    )
    # the confirm is a PLAIN keyed semi-join — the whole premise is
    # that the build key set is too big to broadcast as a hash
    # relation, and only bloom survivors reach this shuffle; Catalyst
    # still broadcasts it when stats say it fits
    return pruned.join(keys, on=key_col, how="left_semi")


__all__ = [
    "bloom_build",
    "might_contain",
    "bloom_semi_join",
    "DEFAULT_M_BITS",
    "DEFAULT_K",
]
