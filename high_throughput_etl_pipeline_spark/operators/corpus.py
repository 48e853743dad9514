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
    bench_grams = _doc_grams(benchmark, id_col, text_col, ngram_n)
    bench_grams = bench_grams.select("_gh").distinct()
    corpus_grams = _doc_grams(corpus, id_col, text_col, ngram_n)
    return (
        corpus_grams.join(F.broadcast(bench_grams), on="_gh")
        .groupBy("_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .select(F.col("_id").alias(id_col), "shared_ngrams")
    )


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, ngram_n: int
) -> DataFrame:
    """(_id, _gh): distinct word-n-gram hashes per document.  Two-step:
    materialize the token array before the n-gram HOF — an inlined split
    re-evaluates per element (see dedup.word_shingles)."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            tokens(F.col(text_col)).alias("_words"),
        )
        .select(
            "_id",
            F.explode(
                F.array_distinct(_word_ngrams_of(F.col("_words"), ngram_n))
            ).alias("_g"),
        )
        .select("_id", md5_64(F.col("_g")).alias("_gh"))
    )


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 5,
    m_bits: int = 1 << 19,
    k: int = 5,
) -> DataFrame:
    """:func:`benchmark_contamination` with a Bloom pre-filter — same
    exact output, different scale envelope.

    The exact operator broadcasts the benchmark's distinct gram hashes;
    at frontier-eval scale (10⁸+ distinct grams, gigabytes) that side no
    longer broadcasts and every corpus gram rides a shuffle to meet it.
    This variant compresses the benchmark gram SET into an ``m_bits``
    Bloom filter (k Kirsch-Mitzenmacher double hashes over the gram
    hash), ships it as a plan literal (``m_bits/64`` longs — 64 KB at
    the default — the broadcast-variable shape on a real cluster), and
    drops non-colliding corpus grams MAP-SIDE before the confirming
    equi-join.  Bloom false positives cost only wasted join probes; the
    join against the true gram set removes them, so the output is
    bit-identical to the exact operator (no false negatives by
    construction) and shares its oracle.  The only full-corpus shuffle
    left is the per-doc count of true matches — proportional to actual
    contamination, not corpus size.

    Build/probe mechanics live in ``operators/runtime_filter.py`` (the
    general Bloom-pruned-join module this operator was extracted into);
    the filter build is metadata-scale — ``m_bits/64`` longs collected,
    independent of benchmark row count — and rides as a broadcast
    one-row column, never an ``F.lit`` array (a 2^19-bit literal embeds
    8192 constants into generated code and the projection falls out of
    codegen: measured 6.5 s vs 2.4 s at sf0.1).
    """
    from high_throughput_etl_pipeline_spark.operators.runtime_filter import (
        bloom_build,
        might_contain,
    )

    bench_grams = _doc_grams(benchmark, id_col, text_col, ngram_n)
    bench_set = bench_grams.select("_gh").distinct()
    bloom_df = bloom_build(bench_set, "_gh", m_bits, k)

    corpus_grams = _doc_grams(corpus, id_col, text_col, ngram_n)
    candidates = (
        corpus_grams.crossJoin(F.broadcast(bloom_df))
        .filter(might_contain(F.col("_gh"), m_bits=m_bits, k=k))
        .select("_id", "_gh")
    )
    return (
        candidates.join(bench_set, on="_gh")
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


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize :func:`pack_token_budget`'s assignment as the packed-
    sequence view a pretraining loader consumes: one row per pack with
    the member ids (pack order), total length, and the token-offset
    ``boundaries`` where each document starts — the attention-mask reset
    points that stop cross-document attention inside a packed context
    window.

    Output: (part, pack_id, n_docs, seq_len, doc_ids, boundaries) where
    ``boundaries[i]`` is the exclusive prefix sum of member lengths
    (``boundaries[0] = 0``; ``boundaries[i+1]-boundaries[i]`` = doc i's
    token count).

    Shape: the packing windows plus ONE grouped aggregate.  Per-pack
    arrays are budget-bounded (a pack holds at most
    ``budget/min_doc_tokens + 1`` docs), so the collect_list is
    constant-sized no matter the corpus — grouping by pack is the thing
    that makes materializing order-sensitive arrays scale-safe.
    """
    packed = pack_token_budget(df, budget, part_col, id_col, text_col)
    grouped = packed.groupBy(part_col, "pack_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col("_tokens").cast("bigint").alias("nt"),
                )
            )
        ).alias("_docs")
    )
    lens = F.transform(F.col("_docs"), lambda d: d["nt"])
    starts = F.aggregate(
        lens,
        F.struct(
            F.array().cast("array<bigint>").alias("arr"),
            F.lit(0).cast("bigint").alias("run"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["arr"], F.array(acc["run"])).alias("arr"),
            (acc["run"] + x).alias("run"),
        ),
        lambda acc: acc["arr"],
    )
    return grouped.select(
        F.col(part_col),
        F.col("pack_id"),
        F.size("_docs").alias("n_docs"),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("seq_len"),
        F.transform(F.col("_docs"), lambda d: d["id"]).alias("doc_ids"),
        starts.alias("boundaries"),
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


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    budget_frac: float = 0.5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix-v1",
) -> DataFrame:
    """Token-budget mixture sampling: downsample each source so the kept
    corpus approaches ``budget_frac`` of total tokens distributed per
    ``targets`` (shares summing to 1) — the data-mixing step that turns
    raw crawl proportions into a training mixture.

    Per-source keep rate = min(1, budget · share / source_tokens), then
    the usual deterministic keyed-hash filter (no RNG; same kept set on
    any engine/partitioning).  A source too small for its target share
    caps at rate 1 — under-supplied shares surface as a shortfall
    rather than silent re-weighting, which is what a curation pipeline
    wants to SEE.  The cutoff arithmetic (floor of one double
    expression) is written identically in the SQL oracle so boundary
    buckets agree bit-for-bit.

    Shape: one grouped aggregate builds the per-source token table
    (tiny — one row per source), which broadcast-joins back; the filter
    itself is map-side.  Two passes over the corpus, both scan-bound.
    """
    n_tok = token_count(F.col(text_col)).cast("bigint")
    toks = df.select(F.col(stratum_col).alias("_src"), n_tok.alias("_nt"))
    per_src = toks.groupBy("_src").agg(F.sum("_nt").alias("_src_tokens"))
    total = per_src.agg(
        F.floor(F.sum("_src_tokens") * F.lit(budget_frac))
        .cast("bigint")
        .alias("_budget")
    )
    share = F.lit(0.0)
    for name, s in targets.items():
        share = F.when(F.col("_src") == name, F.lit(s)).otherwise(share)
    rates = per_src.crossJoin(F.broadcast(total)).select(
        "_src",
        "_src_tokens",
        F.least(
            F.lit(_BUCKETS).cast("bigint"),
            F.floor(
                F.lit(float(_BUCKETS)) * F.col("_budget") * share
                / F.col("_src_tokens")
            ).cast("bigint"),
        ).alias("_cutoff"),
    )
    bucket = F.pmod(
        md5_64(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(_BUCKETS),
    )
    return (
        df.join(
            F.broadcast(rates),
            on=df[stratum_col] == rates["_src"],
        )
        .filter(bucket < F.col("_cutoff"))
        .drop("_src", "_src_tokens", "_cutoff")
    )


def shuffle_shards(
    df: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment for training
    export: every row gets a ``(shard, pos)`` placement that is a
    pseudo-random permutation of the corpus, re-drawn per ``epoch``.

    The shuffle key is ``md5(salt:e{epoch}:id)`` — stateless, so the
    same (corpus, epoch) produces the same global order on any engine,
    any partitioning, any retry (a real 100 TB hazard with
    ``orderBy(rand(seed))``: speculative re-execution of a sampled sort
    stage can re-draw).  ``shard = key mod n_shards`` spreads rows
    near-uniformly; ``pos`` is the row's rank within its shard (key
    order, id tie-break).

    Shape: one shuffle on ``shard`` + an in-partition sort — there is NO
    global sort.  Each shard is one window partition = one export file,
    so ``n_shards`` should be sized like output files (thousands at
    100 TB: shard ≈ a few GB), which also keeps every window partition
    executor-sized.  Writing ``partitionBy(shard)`` with pos-sorted rows
    reproduces the classic tfrecord/webdataset shard layout.
    """
    key = md5_64(
        F.concat(
            F.lit(f"{salt}:e{epoch}:"), F.col(id_col).cast("string")
        )
    )
    out = df.withColumn("_sk", key).withColumn(
        shard_col, F.pmod(F.col("_sk"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy("_sk", id_col)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_sk")


def percentile_filter(
    df: DataFrame,
    score_col: str,
    part_col: str = "source",
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of each ``part_col`` group by score —
    domain-balanced quality filtering (every source contributes its best
    half rather than rich sources flooding the kept set, the CCNet /
    quality-bucket curation move).

    Exact semantics: ``percent_rank`` within the group ordered by
    (score DESC, id) — the id tie-break makes the kept set deterministic
    and engine-portable; a row survives when its percent_rank <
    ``keep_frac`` (a group of one has percent_rank 0 and always
    survives).

    Scale: one grouped window (shuffle on ``part_col``, per-group sort).
    A pathologically hot group serializes into one task — for that
    regime compute an approximate per-group score CUTOFF with
    ``percentile_approx`` and filter map-side (approximate boundary, no
    sort), or route through ``operators/ranking.py:global_rank`` per
    group; this operator keeps the exact window because curation
    decisions should be replayable bit-for-bit.
    """
    w = Window.partitionBy(part_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") < keep_frac)
        .drop("_pr")
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


def weighted_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col,
    n: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, ``n`` per
    group: Efraimidis-Spirakis exponential sort keys.

    Each row draws a uniform ``u`` from its id hash (portable md5
    arithmetic, so any engine reproduces the draw) and gets key
    ``-ln(u) / w`` — the ``n`` SMALLEST keys per group are exactly a
    weight-proportional sample without replacement (E-S'06: u^(1/w)
    descending ≡ -ln(u)/w ascending).  This is how a curation pipeline
    samples quality-weighted documents reproducibly: no RNG state, no
    driver involvement, one window per group, re-runs and engines
    agree row-for-row.

    ``weight_col`` may be a name or a Column expression; weights must
    be > 0.  Returns the sampled rows with ``sample_rank`` (1 = most
    favored draw).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # u in (0, 1]: md5 low-60-bit integer + 1, over 2^60
    u = (md5_64(F.col(id_col).cast("string")) + F.lit(1)) / F.lit(
        float(1 << 60)
    )
    key = -F.log(u) / w.cast("double")
    win = Window.partitionBy(*group_cols).orderBy(
        key.asc(), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(win).cast("int"))
        .filter(F.col("sample_rank") <= n)
    )


def distribution_matched_sample(
    df: DataFrame,
    ref: DataFrame,
    bucket_col,
    id_col: str = "doc_id",
    salt: str = "match-v1",
) -> DataFrame:
    """Importance resampling: downsample ``df`` so its distribution over
    ``bucket_col`` matches ``ref``'s — the curation move that reshapes a
    crawl source to a target profile (match web docs to wiki's length
    histogram, a raw dump to a vetted corpus' quality-score shape)
    without touching the reference rows.

    Per-bucket keep rate = ``c · ref_frac_b / src_frac_b`` with
    ``c = min_b (src_frac_b / ref_frac_b)`` over buckets present in
    BOTH frames — the largest uniform scale-down for which every rate
    stays <= 1, so the kept set is the biggest subsample of ``df``
    whose bucket shares are exactly proportional to ``ref``'s (in
    expectation; realized by the deterministic keyed-hash filter, no
    RNG).  Buckets missing from ``ref`` drop entirely (rate 0); buckets
    missing from ``df`` simply cannot be represented and do not
    constrain ``c``.

    Shape: two grouped aggregates build the per-bucket frequency tables
    (one row per bucket — tiny), one broadcast of the rate table, and a
    map-side filter; the cutoff arithmetic (floor of one double
    expression over exact bigint counts) is written identically in the
    SQL oracle, so boundary buckets agree bit-for-bit.

    ``bucket_col`` may be a name or a Column expression (e.g. a length
    decile); it must be computable on both frames.
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    src = df.select(b.alias("_b"), F.col(id_col).alias("_id"))
    src_n = src.groupBy("_b").agg(F.count(F.lit(1)).alias("_sn"))
    ref_n = (
        ref.select(b.alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_rn"))
    )
    src_tot = src_n.agg(F.sum("_sn").alias("_st"))
    ref_tot = ref_n.agg(F.sum("_rn").alias("_rt"))
    # src_frac/ref_frac = (sn/st)/(rn/rt) = sn*rt / (rn*st): keep the
    # ratio in exact integer products as long as possible — c and the
    # cutoffs then depend on ONE floating division each, same term
    # order as the oracle
    joined = (
        src_n.join(ref_n, on="_b")
        .crossJoin(F.broadcast(src_tot))
        .crossJoin(F.broadcast(ref_tot))
    )
    c = joined.agg(
        F.min(
            (F.col("_sn") * F.col("_rt")).cast("double")
            / (F.col("_rn") * F.col("_st")).cast("double")
        ).alias("_c")
    )
    rates = joined.crossJoin(F.broadcast(c)).select(
        "_b",
        F.least(
            F.lit(_BUCKETS).cast("bigint"),
            F.floor(
                F.lit(float(_BUCKETS))
                * F.col("_c")
                * (F.col("_rn") * F.col("_st")).cast("double")
                / (F.col("_sn") * F.col("_rt")).cast("double")
            ).cast("bigint"),
        ).alias("_cutoff"),
    )
    hbucket = F.pmod(
        md5_64(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(_BUCKETS),
    )
    return (
        df.withColumn("_b", b)
        .join(F.broadcast(rates), on="_b")
        .filter(hbucket < F.col("_cutoff"))
        .drop("_b", "_cutoff")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test assignment that near-duplicate CLUSTERS inherit
    atomically — the split a training pipeline actually needs: a naive
    per-document hash split leaks near-duplicates across train and
    eval (the model "memorizes" the eval set through its training-side
    twins), silently inflating benchmark scores.

    ``pairs`` is any near-dup pair list (MinHash/SimHash/embedding —
    the dedup family's output); pairs close transitively to clusters
    (:func:`~..graph.dedup_clusters`), singletons are their own
    cluster, and the keyed-hash split is a function of the CLUSTER id,
    so by construction no cluster straddles splits — deterministic, no
    RNG, nested cutoffs (raising a ratio only grows that split).

    Returns (``id_col``, cluster_id, split).  Scale shape: the CC
    rounds dominate (O(diameter) keyed joins over the pair list);
    assignment itself is one left join + a map-side hash — the same
    cost as the unsafe split it replaces.
    """
    from high_throughput_etl_pipeline_spark.operators.graph import (
        dedup_clusters,
    )

    if splits is None:
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    cc = dedup_clusters(pairs)
    base = (
        docs.select(F.col(id_col))
        .join(cc, on=docs[id_col] == cc["node"], how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )
    bucket = F.pmod(
        md5_64(
            F.concat(
                F.lit(salt), F.lit(":"), F.col("cluster_id").cast("string")
            )
        ),
        F.lit(_BUCKETS),
    )
    expr = F.lit(None).cast("string")
    cum = 0.0
    # nested cutoffs, last split takes the remainder
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        expr = F.when(
            expr.isNull() & (bucket < int(round(cum * _BUCKETS))),
            F.lit(name),
        ).otherwise(expr)
    expr = F.coalesce(expr, F.lit(names[-1]))
    return base.select(id_col, "cluster_id", expr.alias("split"))


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "res-v1",
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    a keyed hash of their id and keep the first ``k`` — the
    reproducible replacement for per-group reservoir sampling (same
    marginal: every row equally likely under the random-oracle hash;
    plus the properties sampling-in-a-pipeline actually needs: stable
    under reruns, independent of partitioning, auditable by replay).

    One partitioned window; the ``pos <= k`` filter is pushed into the
    shuffle as a per-partition group-limit (Spark's WindowGroupLimit,
    3.5+), so each task keeps a k-row heap per group instead of
    sorting whole groups — the grouped sibling of TakeOrdered.

    Output: input columns + ``pos`` (1-based within group).
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    key = md5_64(
        F.concat_ws(
            "|", F.lit(seed), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("pos", F.row_number().over(w).cast("int"))
        .filter(F.col("pos") <= k)
    )


def quantile_calibrate(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups: map each row's
    within-group rank onto the GLOBAL distribution and read off the
    global value at the matched rank — after calibration every group
    has the same marginal distribution (up to rank granularity).  The
    cross-source score/length calibration step a mixed corpus needs
    before one threshold can be applied to all sources.

    Exactness: both orderings are total ((value, id) tie-break), the
    target rank is pure integer arithmetic
    ``((r−1)·(N−1)) div (n_g−1) + 1`` (floor), and the readback is an
    equi-join on that rank — no interpolation, no floats anywhere.

    Scale shape: the global ranking rides
    :func:`~high_throughput_etl_pipeline_spark.operators.ranking.global_rank`
    (range-partitioned, no single-task sort); the per-group rank is a
    partitioned window (bounded groups — sources — the event_type
    window convention); the readback is one keyed equi-join.

    Output: (id, group, value, src_rank, target_rank,
    calibrated_value).
    """
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    ranked, n_total = global_rank(
        df.select(
            F.col(id_col).alias("_gid"), F.col(value_col).alias("_gv")
        ),
        [F.col("_gv"), F.col("_gid")],
        rank_col="_grank",
    )
    wg = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col)
    )
    wn = Window.partitionBy(group_col)
    src = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(wg).cast("bigint").alias("src_rank"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("_n_g"),
    )
    target = F.when(F.col("_n_g") > 1,
        F.expr(f"((src_rank - 1) * ({n_total} - 1)) div (_n_g - 1) + 1")
    ).otherwise(F.lit((n_total + 1) // 2)).cast("bigint")
    lookup = ranked.select(
        F.col("_grank").alias("target_rank"),
        F.col("_gv").alias("calibrated_value"),
    )
    return (
        src.withColumn("target_rank", target)
        .join(lookup, on="target_rank")
        .select(
            id_col, group_col, value_col,
            "src_rank", "target_rank", "calibrated_value",
        )
    )
