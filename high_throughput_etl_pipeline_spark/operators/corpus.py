"""Corpus-management operators for training-data pipelines.

The release-engineering half of dataset work (beyond the reference's
surface, SURVEY.md §7.1 step 8): deterministic split assignment,
benchmark-contamination detection, and context-window packing.  All pure
DataFrame ops — the hash family is the portable md5-low-60-bits used
across the engine, so every operator is value-checkable against an
independent SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import md5_64
from high_throughput_etl_pipeline_spark.operators.text import token_count, tokens

_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by keyed hash.

    ``md5(salt:id) mod 10000`` buckets each row; cumulative weight ranges
    map buckets to split names.  Properties that matter at 100 TB:
    stateless (no sampling RNG, no shuffle), stable across runs and
    engines (re-ingesting a doc lands it in the same split forever), and
    changing one split's weight never reshuffles rows between the OTHER
    splits (ranges are cumulative).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = F.pmod(
        md5_64(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(_BUCKETS),
    )
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, w in weights.items():
        cum += w
        bounds.append((name, int(round(cum * _BUCKETS))))
    # build when-chain from the last range backwards so earlier ranges win
    for name, hi in reversed(bounds):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing word n-grams with a benchmark set.

    The standard decontamination primitive (n-gram overlap against held-out
    eval sets): benchmark docs explode to DISTINCT n-gram hashes (a tiny
    relation — benchmarks are thousands of docs, not billions — so the
    join side broadcasts); corpus docs explode likewise and the keyed join
    counts shared n-grams per corpus doc.  Output: (id, shared_ngrams)
    for contaminated docs only.  Linear in token count; the only shuffle
    is the per-doc count aggregate.
    """
    # two-step: materialize the token array before the n-gram HOF —
    # an inlined split re-evaluates per element (see dedup.word_shingles)
    grams_of = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_words"),
    ).select(
        "_id",
        F.explode(
            F.array_distinct(_word_ngrams_of(F.col("_words"), ngram_n))
        ).alias("_g"),
    ).select("_id", md5_64(F.col("_g")).alias("_gh"))
    bench_grams = grams_of(benchmark).select("_gh").distinct()
    corpus_grams = grams_of(corpus)
    return (
        corpus_grams.join(F.broadcast(bench_grams), on="_gh")
        .groupBy("_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .select(F.col("_id").alias(id_col), "shared_ngrams")
    )


def _word_ngrams_of(words, n: int) -> F.Column:
    """Word n-grams (with multiplicity) over a PRE-SPLIT words column —
    pass a materialized array reference, not an inline split (HOF
    lambdas re-evaluate captured expression trees per element)."""
    k = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def pack_token_budget(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to ~``budget``-token packs (context-window packing).

    Within each ``part_col`` partition, docs are ordered by id and packed
    by exclusive-prefix-sum bucket (``floor(cumsum_before / budget)``),
    then bucket ids are re-densified with ``dense_rank`` so pack ids are
    contiguous from 0 even when a single document exceeds the budget
    (an oversize doc advances the raw prefix-sum bucket by more than one,
    which would otherwise skip ids).  A pack may overflow by at most one
    document (the standard streaming-packing relaxation — exact greedy
    bin-closing is inherently sequential and not worth a single-task
    dependency chain).  Both windows partition by ``part_col`` and the
    bucket is monotone in id order, so the re-densify adds no extra
    shuffle — the numbering parallelizes like any grouped window; no
    global sort.
    """
    w = Window.partitionBy(part_col).orderBy(id_col)
    n_tok = token_count(F.col(text_col))
    out = df.withColumn("_tokens", n_tok).withColumn(
        "_cum_before",
        F.coalesce(
            F.sum("_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    wb = Window.partitionBy(part_col).orderBy("_bucket")
    return (
        out.withColumn(
            "_bucket", F.floor(F.col("_cum_before") / float(budget))
        )
        .withColumn(
            "pack_id", (F.dense_rank().over(wb) - F.lit(1)).cast("bigint")
        )
        .drop("_cum_before", "_bucket")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows (training chunks).

    The context-length prep step every LLM corpus needs: a document
    becomes ``1 + ceil(max(n - chunk_tokens, 0) / stride)`` chunks of at
    most ``chunk_tokens`` whitespace tokens, chunk *k* starting at token
    ``k*stride`` — ``stride < chunk_tokens`` gives overlap so no span is
    split across a boundary without also appearing whole in some chunk.
    The last chunk may be shorter; every token appears in ≥1 chunk;
    empty docs produce no chunks.

    Pure map-side: tokenize → per-row chunk-start sequence → explode →
    slice.  Linear in token count, no shuffle, no state — at 100 TB this
    pipelines with the scan.  Output: (id, chunk_id, chunk_text,
    n_tokens).
    """
    stride = stride or chunk_tokens
    assert 0 < stride <= chunk_tokens, "need 0 < stride <= chunk_tokens"
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / float(stride))
    ).cast("int")
    # filter BEFORE tokenizing: split('') is [''] (size 1), not empty —
    # an unguarded empty doc would emit one bogus single-token chunk
    out = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(
                F.sequence(F.lit(0), n_chunks - 1)
            ).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("_toks"),
                F.col("chunk_id") * stride + 1,
                F.lit(chunk_tokens),
            ).alias("_chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        F.size("_chunk").alias("n_tokens"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling by keyed hash (no RNG).

    The corpus-rebalancing move: cap over-represented strata (languages,
    sources, domains) at target rates.  ``md5(salt:id) mod 10000``
    buckets each row; a row survives when its bucket falls under its
    stratum's cutoff.  Unlike ``DataFrame.sampleBy`` (seeded RNG whose
    output shifts with partitioning and retries), this is stateless and
    engine-portable: a pure map-side filter — no shuffle, no seed, the
    same rows kept on every run, every engine, every cluster layout.
    Raising a stratum's rate strictly grows its kept set (cutoffs are
    nested), so samples are monotone under curriculum changes.
    """
    bucket = F.pmod(
        md5_64(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(_BUCKETS),
    )
    hi = F.lit(int(round(default_rate * _BUCKETS)))
    for name, rate in rates.items():
        hi = F.when(
            F.col(stratum_col) == name, F.lit(int(round(rate * _BUCKETS)))
        ).otherwise(hi)
    return df.filter(bucket < hi)
