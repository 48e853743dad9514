"""Byte-pair-encoding vocabulary induction over a corpus.

The tokenizer-training step of a training-data pipeline (Sennrich et
al. 2016): repeatedly merge the most frequent adjacent symbol pair.
Spark-first shape — the corpus collapses to a WORD-TYPE table (distinct
word, frequency) after one groupBy, and every merge round is a small
explode → groupBy(pair) → argmax over that table.  Only the single
winning pair is collected per round (metadata-scale, the same
driver-decision pattern as operators/graph.py's convergence checks);
the merge itself is a map-side array fold.

At 100 TB: the word-type table is ~10⁸ rows regardless of corpus size
(token frequencies ride the initial groupBy), so rounds cost
explode(avg word length) over word TYPES, not corpus tokens.  Lineage
is cut per round with localCheckpoint — 10³ merge rounds would
otherwise stack 10³ HOF rewrites into one plan.

No SQL oracle: BPE is inherently iterative (each round's input is the
previous round's argmax) — the correctness gate is semantic parity
with a reference implementation in tests/test_operators.py, pinned on
the classic low/lower/newest/widest example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def _word_types(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens."""
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Each word becomes its character sequence plus an end-of-word
    marker (the marker keeps word-final merges distinct from word-
    internal ones, per the original algorithm)."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return words.select(
        "word",
        "freq",
        F.concat(chars, F.array(F.lit(END))).alias("syms"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(left, right, freq): adjacent-pair frequencies weighted by word
    frequency.  The token array materializes before the HOF (own
    projection) — see dedup.word_shingles for why."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("syms") - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("l"),
            F.element_at(F.col("syms"), i + 1).alias("r"),
        ),
    )
    return (
        symbols.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _merge_pair(syms, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — an array fold, pure Column expression.  'aaa' under pair
    (a,a) merges the FIRST two ('aa', 'a'), matching the reference
    algorithm's left-to-right scan."""
    merged = left + right

    def step(acc, s):
        # sentinel-prefixed last-element read: in-bounds even on the
        # empty accumulator (ANSI element_at throws on out-of-bounds,
        # and AND is not guaranteed to short-circuit in codegen)
        prev = F.element_at(F.concat(F.array(F.lit("\x00")), acc), -1)
        do_merge = (prev == F.lit(left)) & (s == F.lit(right))
        return F.when(
            do_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        syms, F.array().cast("array<string>"), step
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_freq: int = 2,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns the merge table as a list of dicts (rank, left, right,
    merged, freq) — driver-side by design: the merge list IS the
    trained artifact (a tokenizer ships it as a file), it is bounded by
    ``n_merges``, and each entry was already collected as that round's
    argmax.  Tie-break: highest pair frequency, then lexicographic
    (left, right) — deterministic on any engine or partitioning.

    Stops early when no pair reaches ``min_pair_freq``.
    """
    spark = df.sparkSession
    symbols = _initial_symbols(_word_types(df, text_col)).localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(symbols)
            .orderBy(
                F.col("pair_freq").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_freq"] < min_pair_freq:
            break
        b = best[0]
        merges.append(
            {
                "rank": rank,
                "left": b["left"],
                "right": b["right"],
                "merged": b["left"] + b["right"],
                "freq": int(b["pair_freq"]),
            }
        )
        symbols = symbols.select(
            "word",
            "freq",
            _merge_pair(F.col("syms"), b["left"], b["right"]).alias("syms"),
        ).localCheckpoint()  # lineage cut: one fold per plan, not `rank` folds
    return merges


def bpe_merges_df(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """The merge table as a DataFrame (rank-ordered)."""
    schema = "rank INT, left STRING, right STRING, merged STRING, freq BIGINT"
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["freq"]) for m in merges],
        schema,
    )


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained merge list: per word, apply
    every merge in rank order (the standard greedy encoder).  Map-side
    only — ``len(merges)`` folds over each word's symbol array, no
    shuffle, no Python.  Output: (id, n_words, n_tokens, tokens) with
    ``tokens`` the concatenated subword sequence.
    """
    from high_throughput_etl_pipeline_spark.operators.text import tokens

    words = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("_pos", "word"),
    )
    syms = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
        F.array(F.lit(END)),
    )
    sym_df = words.select(id_col, "_pos", syms.alias("syms"))
    for m in merges:
        sym_df = sym_df.select(
            id_col,
            "_pos",
            _merge_pair(F.col("syms"), m["left"], m["right"]).alias("syms"),
        )
    return (
        sym_df.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("syms")).alias("n_tokens"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("tokens"),
        )
    )
