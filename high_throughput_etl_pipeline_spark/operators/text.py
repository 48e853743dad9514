"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (SURVEY.md §7.1 step 8): language ID,
quality scoring, token counting, fingerprinting over a `documents` table
(doc_id, text, lang, source, n_chars).  All pure Column expressions —
JVM-side, codegen-friendly, zero Python on the hot path, so they scale to
100 TB of text exactly like any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Deliberately small: the operator's shape (N regex counts + argmax) is
# what matters; swap lists for real ones in production.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "la", "que", "de", "los", "es", "una"],
}

# Explicit ASCII class, not \s: Java regex (Spark) and RE2 (DuckDB oracle)
# disagree on Unicode whitespace membership for \s.  Matches Java's \s
# ASCII membership exactly ([ \t\n\x0B\f\r]) AND the oracle-side class
# used throughout queries.py — the three tokenizer surfaces (this,
# dedup._norm's \s+, the oracles) must agree on every byte or a \f/\x0b
# in one document silently diverges the hash gate.
_WORD_SPLIT = r"[ \t\n\r\f\x0b]+"
# BPE-ish token pieces: runs of word chars OR single non-space symbol —
# a cheap stand-in for subword tokenization with the same column shape.
# Explicit whitespace class for the same reason as _WORD_SPLIT (Java \s
# includes \x0B, RE2's does not — this constant is interpolated into
# the DuckDB oracles, so both engines read the identical pattern).
BPE_PIECE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]"


def tokens(col) -> F.Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), _WORD_SPLIT)


def token_count(col) -> F.Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_token_estimate(col) -> F.Column:
    """Count of BPE-ish pieces (regexp_count is JVM-side in Spark 3.5+)."""
    return F.regexp_count(col, F.lit(BPE_PIECE_RE))


def stopword_ratio(col, lang: str = "en") -> F.Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    words = LANG_STOPWORDS[lang]
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    hits = F.regexp_count(col, F.lit(pattern))
    return (hits / F.greatest(token_count(col), F.lit(1))).cast("double")


def detect_language(col) -> F.Column:
    """Argmax of per-language stopword-hit ratios; 'und' when no signal."""
    scores = [
        (lang, F.regexp_count(col, F.lit(r"(?i)\b(" + "|".join(w) + r")\b")))
        for lang, w in LANG_STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier languages win ties (deterministic argmax)
    for lang, s in reversed(list(scores)):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword features + a quality score.

    The score is a bounded weighted sum — the standard cheap-filter shape
    used ahead of expensive dedup/training stages.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    digits = F.regexp_count(c, F.lit(r"[0-9]"))
    out = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).cast("double"),
        )
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(n_chars, F.lit(1)), 4).cast("double"),
        )
        .withColumn(
            "digit_ratio",
            F.round(digits / F.greatest(n_chars, F.lit(1)), 4).cast("double"),
        )
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 4))
    )
    score = (
        F.lit(0.25) * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 5, F.lit(1.0)))
        + F.lit(0.25) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    )
    return out.withColumn("quality_score", F.round(score, 4).cast("double"))


def word_bigrams(words_col) -> F.Column:
    """Non-distinct word 2-grams over a PRE-SPLIT words column
    (repetition analysis needs multiplicity — word_shingles in dedup.py
    dedups, this keeps every occurrence).  Pass a materialized array
    reference, not an inline tokens() expression: HOF lambdas
    re-evaluate captured expression trees per element."""
    k = F.size(words_col) - F.lit(1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words_col, i, 2)),
    )
    empty = F.array().cast("array<string>")
    return F.when(k >= 1, grams).otherwise(empty)


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals, per document:

    - ``top_word_frac``   — occurrences of the most frequent word / words
    - ``dup_word_frac``   — word occurrences beyond each word's first
    - ``dup_bigram_frac`` — same for 2-grams

    High values mark boilerplate/spam for corpus filtering (the rule
    family from the Gopher/MassiveText quality heuristics).  Shape:
    explode → two-level aggregate — linear, shuffle key is (doc, term),
    no per-doc quadratic work, so it scales like any token count.
    """

    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_words"))

    def fracs(term_df, out_prefix: str):
        per_term = term_df.groupBy(id_col, "_term").agg(
            F.count("*").alias("_c")
        )
        return per_term.groupBy(id_col).agg(
            F.sum("_c").alias(f"{out_prefix}_total"),
            F.max("_c").alias(f"{out_prefix}_top"),
            F.sum(F.col("_c") - 1).alias(f"{out_prefix}_dups"),
        )

    words = fracs(
        base.select(F.col(id_col), F.explode("_words").alias("_term")), "w"
    )
    bigrams = fracs(
        base.select(
            F.col(id_col),
            F.explode(word_bigrams(F.col("_words"))).alias("_term"),
        ),
        "b",
    )
    out = words.join(bigrams, on=id_col, how="left")
    return out.select(
        F.col(id_col),
        F.round(F.col("w_top") / F.col("w_total"), 6).alias("top_word_frac"),
        F.round(F.col("w_dups") / F.col("w_total"), 6).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.col("b_dups") / F.col("b_total"), F.lit(0.0)), 6
        ).alias("dup_bigram_frac"),
    )


def tfidf_top_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per group by tf-idf (idf = ln(#groups / #groups with
    term)).  The corpus-vocabulary primitive: explode → (group, term)
    count → distinct-group count per term → window top-k.

    Scale shape: both aggregates shuffle on (group, term) / term — linear
    in token count; the window partitions by group.  No driver-side
    vocabulary."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    n_groups = df.select(group_col).distinct().count()
    gf = tf.groupBy("term").agg(
        F.countDistinct("grp").alias("group_freq")
    )
    scored = tf.join(gf, on="term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_groups)) / F.col("group_freq")),
            6,
        ),
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "term",
            "tf",
            "group_freq",
            "tfidf",
            "rank",
        )
    )


def fingerprint(col) -> F.Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text.

    The exact-dup key; near-dup fingerprints live in dedup.py.
    """
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


# PII redaction patterns, applied in order.  ASCII-explicit classes so
# Java regex (Spark) and RE2-family engines (DuckDB, Go) agree match-for-
# match; conservative shapes (phone requires the international +) favor
# precision — a corpus scrub must not shred ordinary numbers.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}([ -][0-9]{2,4})?", "<PHONE>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def redact_pii(col) -> F.Column:
    """Replace emails, international phone numbers, and IPv4 addresses
    with typed placeholders — the standard pre-training privacy scrub.
    Pure JVM-side regexp_replace chain: no UDF, codegen-friendly, and
    engine-portable (value-checked against an independent SQL engine)."""
    out = col
    for pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def _doc_bigrams(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(_id, _prev, _w) per token with a ``<s>`` start-of-document
    context for the first token.  Two-step: the token array materializes
    in its own projection before the bigram HOF (see word_bigrams)."""
    toks = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("_id"),
            tokens(F.lower(F.col(text_col))).alias("_t"),
        )
        .select(
            "_id",
            F.concat(F.array(F.lit("<s>")), F.col("_t")).alias("_t"),
        )
    )
    return toks.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("_t"), i).alias("p"),
                    F.element_at(F.col("_t"), i + 1).alias("w"),
                ),
            )
        ).alias("_pos", "_bg"),
    ).select("_id", F.col("_bg.p").alias("_prev"), F.col("_bg.w").alias("_w"))


def bigram_lm_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram-LM scoring of held-out documents — the
    CCNet-style perplexity filter, with an additive-smoothing bigram
    model standing in for KenLM (no native libs in this environment;
    the pipeline shape — train counts, broadcast-free keyed scoring
    join, per-doc aggregate — is exactly the production one).

    Model: p(w | prev) = (c(prev, w) + k) / (c(prev) + k·V), with
    c(·) counts from ``train`` (documents prefixed by a ``<s>``
    context token) and V = distinct train words + 1 (the +1 reserves
    mass for unseen words).  Unseen bigrams/contexts coalesce to count
    0, so every held-out token gets finite smoothed mass.

    Output: (id, n_tokens, avg_lp_nanos, perplexity).  Each per-token
    log-prob rounds to the 1e-9 integer lattice BEFORE the per-doc
    average (libm ln is build-dependent; summing raw ln outputs across
    rows is the class that flipped customer_survival_curve on the r8
    driver — integer sums cannot drift).  The average itself is an
    INTEGER — half-away-from-zero nanos via |sum| and integer division
    (round(sum/1e9/n, 6) was a mean-of-lattice decimal-tie surface,
    the r10 hazard defect class; Spark's ``div`` truncates while
    DuckDB's ``//`` floors, so the signed mean routes through ABS) —
    and ``perplexity`` is exp(-avg_lp_nanos/1e9): both engines feed
    the IDENTICAL double into exp, so only a 4-dp tie adjacent to a
    1-ulp exp difference could flip it.

    Scale shape: the model IS two DataFrames (bigram counts, context
    counts) — never collected; scoring joins are keyed on the bigram /
    context words (narrow string keys), V rides a broadcast cross join
    of one row.  Everything is linear in token count; skew on frequent
    contexts is ordinary AQE-handled join skew.
    """
    tb = _doc_bigrams(train, id_col, text_col)
    big_counts = tb.groupBy("_prev", "_w").agg(F.count("*").alias("_cbw"))
    ctx_counts = tb.groupBy("_prev").agg(F.count("*").alias("_cp"))
    vocab = tb.select(F.countDistinct("_w").alias("_v"))

    sb = _doc_bigrams(score, id_col, text_col)
    scored = (
        sb.join(big_counts, on=["_prev", "_w"], how="left")
        .join(ctx_counts, on="_prev", how="left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            F.round(
                F.log(
                    (F.coalesce(F.col("_cbw"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("_cp"), F.lit(0))
                        + F.lit(k) * (F.col("_v") + 1)
                    )
                )
                * F.lit(1e9),
                0,
            )
            .cast("bigint")
            .alias("_lp9"),
        )
    )
    avg_nanos = F.expr(
        "CAST(CASE WHEN SUM(_lp9) >= 0"
        " THEN (2 * SUM(_lp9) + COUNT(*)) div (2 * COUNT(*))"
        " ELSE -((2 * -SUM(_lp9) + COUNT(*)) div (2 * COUNT(*)))"
        " END AS BIGINT)"
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            avg_nanos.alias("avg_lp_nanos"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "avg_lp_nanos",
            F.round(
                F.exp(-F.col("avg_lp_nanos").cast("double") / F.lit(1e9)),
                4,
            ).alias("perplexity"),
        )
    )


def sentiment_score(
    col,
    positive: list[str] | None = None,
    negative: list[str] | None = None,
) -> F.Column:
    """Lexicon sentiment in [-1, 1]: (pos - neg) / (pos + neg + 1).

    The survey's §7.1.8 text-analysis slot, kept JVM-side: two regex
    counts and arithmetic — no UDF, engine-portable.  Lexicons are
    parameters; the defaults suit the synthetic corpus (swap in real
    lists in production — the operator shape is what scales)."""
    positive = positive or ["fast", "big"]
    negative = negative or ["slow", "small"]
    pos = F.regexp_count(
        F.lower(col), F.lit(r"\b(" + "|".join(positive) + r")\b")
    )
    neg = F.regexp_count(
        F.lower(col), F.lit(r"\b(" + "|".join(negative) + r")\b")
    )
    return F.round(
        (pos - neg) / (pos + neg + F.lit(1)).cast("double"), 4
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    n_features: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. '23, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how target-like its hashed unigram distribution is,
    log w(d) = Σ_tokens ln( p_target(bucket) / p_raw(bucket) ),
    with +1/+n_features Laplace smoothing on both distributions.  Rows
    where ``target`` is true define the target domain; the raw corpus
    is ``df`` itself.  Resample/filter on ``dsir_logw`` downstream.

    Hash-parity discipline: bucket counts and totals are exact
    bigints; each bucket takes ONE ln of a ratio of exact-bigint casts
    and is rounded to the 1e-6 lattice BEFORE the per-document sum
    (transcendentals are never accumulated raw — the
    customer_survival_curve lesson).

    Shape: one token explode, two grouped counts, a broadcast
    ``n_features``-row ratio table, one per-doc rollup — the classifier-
    scoring plan, so it scales exactly like linear_quality_score.
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    nonempty = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    feat = nonempty.select(
        F.col(id_col),
        target.cast("int").alias("_tgt"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    ).select(
        id_col,
        "_tgt",
        F.pmod(md5_64(F.col("_t")), F.lit(n_features)).alias("_fid"),
    )
    feat = feat.localCheckpoint(eager=False)
    cnt = feat.groupBy("_fid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cr"),
        F.sum("_tgt").cast("bigint").alias("_ct"),
    )
    tot = cnt.agg(
        F.sum("_cr").cast("bigint").alias("_tr"),
        F.sum("_ct").cast("bigint").alias("_tt"),
    )
    lr = cnt.join(F.broadcast(tot)).select(
        "_fid",
        F.round(
            F.log(
                ((F.col("_ct") + 1) * (F.col("_tr") + n_features)).cast(
                    "double"
                )
                / ((F.col("_cr") + 1) * (F.col("_tt") + n_features)).cast(
                    "double"
                )
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("_lr"),
    )
    return (
        feat.join(F.broadcast(lr), "_fid")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.max("_tgt").alias("_is_tgt"),
            F.sum("_lr").cast("bigint").alias("_sw"),
        )
        .select(
            id_col,
            (F.col("_is_tgt") == 1).alias("is_target"),
            "n_tokens",
            F.round(F.col("_sw").cast("double") / 1e6, 6).alias(
                "dsir_logw"
            ),
        )
    )


def hashed_feature_weights(
    spark, n_features: int = 4096, salt: str = "w"
) -> DataFrame:
    """Deterministic pseudo-weight table (feature_id, weight in
    [-1, 1]) standing in for a trained linear model's parameters — the
    md5 derivation makes the same table reproducible in any engine, so
    the scoring pipeline is value-checkable end-to-end.  Swap in real
    trained weights (same two columns) for production."""
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    return spark.range(n_features).select(
        F.col("id").cast("bigint").alias("feature_id"),
        (
            (
                F.pmod(
                    md5_64(
                        F.concat(
                            F.lit(f"{salt}:"), F.col("id").cast("string")
                        )
                    ),
                    F.lit(2001),
                )
                - 1000
            )
            / 1000.0
        )
        .cast("double")
        .alias("weight"),
    )


def linear_quality_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_features: int = 4096,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style hashed linear classifier scoring: each token maps
    to ``md5(token) mod n_features`` and the document score is the mean
    weight of its token features — the model-based quality-filter shape
    (a trained classifier's inference pass), kept entirely JVM-side.

    Shape: explode tokens → codegen md5 → broadcast hash-join the
    weight table → one (id) rollup → left-join scores back (so
    empty-text documents keep a NULL score).  This REPLACED the
    original one-row-weight-map + higher-order ``aggregate`` fold:
    HOF lambdas run interpreted, so the per-token md5 cost ~1 µs/elem
    — the measured A/B at sf0.1 is 9.4 s (fold) vs 1.2 s (explode,
    whole-stage codegen), an 8x win that every classifier-eval query
    inherits.  The token shuffle it buys is keyed on ``id_col`` and
    partially aggregated map-side; the weight table broadcasts at any
    corpus size (2M buckets ≈ 16 MB).  Value parity: per-document sums
    change summation ORDER vs the fold, but every consumer (and every
    oracle, which always summed grouped-side) rounds scores to 6 dp
    before use — the documented ulp discipline at queries.py's
    ``text_classifier_scores``.
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    nonempty = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    ex = nonempty.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    fid = ex.select(
        id_col,
        F.pmod(md5_64(F.col("_t")), F.lit(n_features)).alias(
            "feature_id"
        ),
    )
    w = weights.select(
        F.col("feature_id").cast("bigint").alias("feature_id"),
        F.col("weight").cast("double").alias("_w"),
    )
    # LEFT join + coalesce(weight, 0): an unmatched token contributes 0
    # to the numerator but still counts in the denominator, preserving
    # the documented "mean weight of its tokens" for SPARSE weight
    # tables too.  For the dense tables hashed_feature_weights builds
    # (every bucket present) this is value-identical to the old inner
    # join, so no oracle moves.
    s = (
        fid.join(F.broadcast(w), "feature_id", "left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.coalesce(F.col("_w"), F.lit(0.0)))
                / F.count(F.lit(1))
            ).alias(score_col)
        )
    )
    return df.join(s, id_col, "left")


def hashed_tfidf(
    docs,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_norm: bool = True,
):
    """Feature-hashed TF-IDF vectors (the HashingTF/IDF "hashing trick",
    Weinberger et al. '09) — the text→vector bridge that makes the
    whole similarity stack (brute-force/LSH/IVF top-k, near-dup
    clustering, hard negatives) applicable to raw text WITHOUT an
    embedding model: token → md5 bucket (portable arithmetic, no vocab
    to build or broadcast), tf·idf per bucket, dense ``array<double>``
    out.

    idf is the smoothed form ``ln((N+1)/(df+1)) + 1`` (sklearn's);
    ``with_norm`` adds an ``l2_norm`` column so callers score
    ``dot(a, b) / (norm_a · norm_b)`` — normalization happens at
    SCORING time as a plain column, deliberately NOT by rescaling the
    array: a ``transform(vec, x -> x / sqrt(aggregate(vec, ...)))``
    re-evaluates the captured norm expression PER ELEMENT (the HOF
    trap — measured O(dim²) per row, 20 s vs 2 s at sf0.1), and the
    separate-norm form is also what the IVF/MaxSim scorers already
    consume.  Documents with zero tokens have no features and drop
    from the output (a zero vector has no direction to compare).

    Scale shape: explode → two grouped counts (the (doc, bucket) tf
    table and the ≤dim-row df table) → broadcast df + the one-row doc
    count back → map_from_entries densification, all JVM-side.  The
    shuffle carries (doc, bucket) partials, never tokens.  Engine
    parity note: the dense ascending-index sums used downstream equal
    any sparse bucket-ordered sum BIT-FOR-BIT because adding exact 0.0
    terms is the identity — which is what lets an independent engine
    verify cosines over these vectors from its sparse form.
    """
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    ).filter(F.col("_t") != "")
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    tf = (
        tok.select("_id", F.pmod(md5_64(F.col("_t")), F.lit(dim)).alias("_b"))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    dfreq = tf.groupBy("_b").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    vals = (
        tf.join(F.broadcast(dfreq), on="_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_id",
            "_b",
            (
                F.col("_tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1.0))
                        / (F.col("_df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("_v"),
        )
    )
    dense = vals.groupBy("_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    ).select(
        "_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0.0)
            ),
        ).alias("tfidf"),
    )
    out = [F.col("_id").alias(id_col), F.col("tfidf")]
    if with_norm:
        out.append(
            F.sqrt(
                F.aggregate(
                    F.col("tfidf"), F.lit(0.0), lambda a, x: a + x * x
                )
            ).alias("l2_norm")
        )
    return dense.select(*out)


def nb_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """Multinomial Naive Bayes (train + resubstitution eval) over
    hashed bag-of-words, emitting the label confusion matrix
    ``(true_label, pred_label, n_docs)``.

    The whole classifier is exact integer arithmetic so an independent
    engine replays it bit-for-bit: Laplace-smoothed token log-likelihoods
    ``ln((c+1)/(total+dim))`` and class priors ``ln(n_class/n_docs)``
    are quantized to micro-nats (``round(ln(..)*scale)`` bigint) ONCE,
    then every document score is a bigint dot product ``Σ tf·lp + prior``
    — no float accumulation anywhere, so summation order is irrelevant.
    The argmax tie-breaks on the label string, making prediction total.

    Scale shape: the model is tiny by construction (|labels| × dim
    log-prob grid + one prior row per label) and broadcast to the
    scoring join; the corpus-side work is one tokenize/explode, two
    grouped counts, and a per-(doc,label) sum — one shuffle each, all
    JVM-side.  Training and inference fuse into one lineage; no
    iteration, no driver-side model state.

    Reference parity: the reference has no classifier surface; this is
    extension surface next to linear_quality_score (the hashed linear
    scorer), giving the corpus-quality stack a supervised eval loop.
    """
    from pyspark.sql import Window

    base = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_y"),
        F.col(text_col).alias("_text"),
    )
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    feat = base.select(
        "_id",
        "_y",
        F.explode(tokens(F.col("_text"))).alias("_t"),
    ).filter(F.col("_t") != "").select(
        "_id", "_y", F.pmod(md5_64(F.col("_t")), F.lit(dim)).alias("_fid")
    )
    # two grouped passes over the exploded tokens (per-doc tf and the
    # class count model) — pin the explode once
    feat = feat.localCheckpoint(eager=False)
    tfc = feat.groupBy("_id", "_y", "_fid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tf")
    )
    cc = feat.groupBy("_y", "_fid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    ct = feat.groupBy("_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("_total")
    )
    fids = feat.select("_fid").distinct()
    # (label × observed-fid) grid of Laplace micro-nat log-likelihoods;
    # |labels|·dim rows at most — model-scale, broadcast to scoring
    grid = (
        ct.crossJoin(fids)
        .join(cc, on=["_y", "_fid"], how="left")
        .select(
            "_y",
            "_fid",
            F.round(
                F.log(
                    (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(1.0))
                    / (F.col("_total") + F.lit(float(dim)))
                )
                * F.lit(scale),
                0,
            )
            .cast("bigint")
            .alias("_lp"),
        )
    )
    n_docs = base.agg(F.count(F.lit(1)).cast("bigint").alias("_nn"))
    pri = (
        base.groupBy("_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nd"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("_y").alias("_hyp_p"),
            F.round(
                F.log(F.col("_nd") / F.col("_nn")) * F.lit(scale), 0
            )
            .cast("bigint")
            .alias("_prior"),
        )
    )
    sc = (
        tfc.join(
            F.broadcast(grid.withColumnRenamed("_y", "_hyp")), on="_fid"
        )
        .groupBy("_id", "_y", "_hyp")
        .agg(F.sum(F.col("_tf") * F.col("_lp")).alias("_tok_lp"))
        .join(
            F.broadcast(pri), F.col("_hyp") == F.col("_hyp_p")
        )
        .select(
            "_id",
            "_y",
            "_hyp",
            (F.col("_tok_lp") + F.col("_prior")).alias("_score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_score"), F.col("_hyp"))
    pred = sc.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        pred.groupBy(
            F.col("_y").alias("true_label"),
            F.col("_hyp").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_label", "pred_label")
    )


def _lower_words(text_col) -> F.Column:
    """Lowercased whitespace tokens — the LM/collocation tokenizer
    (same split class as :data:`_WORD_SPLIT`, interpolated into the
    DuckDB oracles so both engines read one pattern)."""
    return F.split(F.trim(F.lower(text_col)), _WORD_SPLIT)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information over adjacent word pairs — the
    collocation detector ("new york" scores high because its joint
    count beats the unigram-independence prediction).

    PMI = ln(c_xy·N / (c_x·c_y)) with N the total bigram count; all
    four counts are exact bigints, the cross products run in
    decimal(38,0) (HUGEINT oracle-side), and ln/division happen once
    per surviving pair in a fixed term order — hash-exact.  The
    ``min_pair_count`` floor removes the low-count pairs where PMI is
    pure noise (and keeps the output bounded).

    Scale shape: one tokenize/explode, two grouped counts, a one-row
    broadcast total, two keyed joins of the pair table to the unigram
    table — the unigram join is NOT forced-broadcast (vocab can be
    huge); AQE decides.
    """
    words = docs.select(_lower_words(F.col(text_col)).alias("_w")).filter(
        F.size("_w") >= 2
    )
    grams = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("_w"), i).alias("w1"),
                    F.element_at(F.col("_w"), i + 1).alias("w2"),
                ),
            )
        ).alias("_g")
    ).select(F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2"))
    grams = grams.localCheckpoint(eager=False)
    pc = (
        grams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
        .filter(F.col("c_xy") >= min_pair_count)
    )
    ug = (
        grams.select(F.col("w1").alias("w"))
        .unionAll(grams.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_w"))
    )
    n = grams.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    j = (
        pc.join(ug.select(F.col("w").alias("w1"),
                          F.col("c_w").alias("c_x")), on="w1")
        .join(ug.select(F.col("w").alias("w2"),
                        F.col("c_w").alias("c_y")), on="w2")
        .join(F.broadcast(n))
    )
    dec = "decimal(38,0)"
    pmi = F.log(
        (F.col("c_xy").cast(dec) * F.col("_n")).cast("double")
        / (F.col("c_x").cast(dec) * F.col("c_y")).cast("double")
    )
    return j.select(
        "w1", "w2", "c_xy", "c_x", "c_y",
        F.round(pmi, 6).alias("pmi"),
    )


def zipf_fit(
    docs: DataFrame, text_col: str = "text", scale: int = 10**6
) -> DataFrame:
    """Zipf's-law fit of the corpus token frequency distribution: OLS
    slope of ln(freq) on ln(rank) (healthy natural-language corpora sit
    near −1; templated or synthetic text drifts off) plus the fit r².

    Exactness: rank comes from the distributed
    :func:`~high_throughput_etl_pipeline_spark.operators.ranking.global_rank`
    total ordering (freq DESC, token); ln(rank) and ln(freq) are
    quantized to micro-nat bigints BEFORE any summation, so all five
    OLS sums are exact 128-bit integers and the slope/r² are single
    double expressions over them — order-independent, hash-exact.

    Output: one row (vocab_size, total_tokens, zipf_slope, r2).
    """
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    tok = docs.select(
        F.explode(_lower_words(F.col(text_col))).alias("_t")
    ).filter(F.col("_t") != "")
    freq = tok.groupBy("_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_f")
    )
    ranked, n_vocab = global_rank(
        freq, [F.col("_f").desc(), F.col("_t")], rank_col="_r"
    )
    q = ranked.select(
        "_f",
        F.round(F.log(F.col("_r")) * scale, 0).cast("bigint").alias("_x"),
        F.round(F.log(F.col("_f")) * scale, 0).cast("bigint").alias("_y"),
    )
    dec = "decimal(38,0)"
    s = q.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("_f").cast("bigint").alias("total_tokens"),
        F.sum(F.col("_x").cast(dec)).alias("sx"),
        F.sum(F.col("_y").cast(dec)).alias("sy"),
        F.sum((F.col("_x").cast(dec) * F.col("_y").cast(dec))).alias("sxy"),
        F.sum((F.col("_x").cast(dec) * F.col("_x").cast(dec))).alias("sxx"),
        F.sum((F.col("_y").cast(dec) * F.col("_y").cast(dec))).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        "total_tokens",
        F.when(denx > 0, F.round(num / denx, 6)).alias("zipf_slope"),
        F.when(
            (denx > 0) & (deny > 0),
            F.round((num * num) / (denx * deny), 6),
        ).alias("r2"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram duplication exposure: of a document's
    DISTINCT word n-grams, how many also occur in at least one other
    document — the memorization-risk / boilerplate audit that catches
    shared passages exact-dedup misses (novelty 1.0 = fully original).

    Counts are exact; the single ratio is one double division.  Scale
    shape: one shingle explode + per-doc distinct, one grouped count
    over shingles, one join back, one per-doc agg — the shuffle
    carries (doc, shingle-hash)-grain rows, standard dedup-family
    cost.  The shingle join key is the md5_64 of the gram (long, not
    the string) to keep shuffle width down.
    """
    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64

    words = docs.select(
        F.col(id_col).alias("_id"),
        _lower_words(F.col(text_col)).alias("_w"),
    ).filter(F.size("_w") >= n)
    grams = (
        words.select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_w"), i, n)
                    ),
                )
            ).alias("_g"),
        )
        .select("_id", md5_64(F.col("_g")).alias("_h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    gc = grams.groupBy("_h").agg(
        F.count(F.lit(1)).cast("bigint").alias("_docs")
    )
    per_doc = (
        grams.join(gc, on="_h")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("_docs") >= 2, 1).otherwise(0)
            ).cast("bigint").alias("n_shared"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_shingles",
        "n_shared",
        F.round(
            1.0 - F.col("n_shared") / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. '10): candidate phrases are
    maximal stopword-free token runs; each word scores deg/freq (deg =
    Σ length of phrases containing it, freq = occurrences) and a
    phrase scores the sum of its word scores — co-occurring-in-long-
    phrases words rank up, ubiquitous glue words rank down.

    Engine parity: deg and freq are exact bigints, each word score is
    ONE double division, and every phrase-score sum folds the word
    scores IN PHRASE ORDER (HOF left fold here, ``list_sum(list(… ORDER
    BY pos))`` oracle-side — the proven ordered-float-fold trick), so
    identical doubles come out of both engines and the ranking is
    hash-exact.

    Scale shape: phrase segmentation is a per-doc window (doc-length
    bounded); word stats are two grouped counts; the score-back join
    is keyed on the word.  Everything shuffles at (doc, phrase) or
    word grain — linear in token count.

    Output: (phrase, phrase_len, n_occurrences, rake_score) —
    unranked; callers top-k with take_top_k.
    """
    from pyspark.sql import Window

    stops = stopwords if stopwords is not None else LANG_STOPWORDS["en"]
    toks = docs.select(
        F.col("doc_id").alias("_doc"),
        F.posexplode(_lower_words(F.col(text_col))).alias("_i", "_tok"),
    ).filter(F.col("_tok") != "")
    stop_arr = F.array(*[F.lit(s) for s in stops])
    toks = toks.withColumn(
        "_stop", F.array_contains(stop_arr, F.col("_tok"))
    )
    wdoc = Window.partitionBy("_doc").orderBy("_i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = toks.withColumn(
        "_pid", F.sum(F.col("_stop").cast("int")).over(wdoc)
    ).filter(~F.col("_stop"))
    occ = marked.groupBy("_doc", "_pid").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_i"), F.col("_tok")))
        ).alias("_arr")
    ).select(
        "_doc",
        "_pid",
        F.concat_ws(
            " ", F.transform(F.col("_arr"), lambda s: s["_tok"])
        ).alias("phrase"),
        F.size("_arr").cast("bigint").alias("phrase_len"),
        "_arr",
    ).localCheckpoint(eager=False)
    wstats = (
        occ.select(
            F.explode(F.col("_arr")).alias("_e"), F.col("phrase_len")
        )
        .select(F.col("_e._tok").alias("_tok"), "phrase_len")
        .groupBy("_tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_freq"),
            F.sum("phrase_len").cast("bigint").alias("_deg"),
        )
        .withColumn("_wscore", F.col("_deg") / F.col("_freq"))
    )
    per_occ = (
        occ.select(
            "_doc", "_pid", "phrase", "phrase_len",
            F.explode(F.col("_arr")).alias("_e"),
        )
        .select(
            "_doc", "_pid", "phrase", "phrase_len",
            F.col("_e._i").alias("_i"),
            F.col("_e._tok").alias("_tok"),
        )
        .join(wstats.select("_tok", "_wscore"), on="_tok")
        .groupBy("_doc", "_pid", "phrase", "phrase_len")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_i"), F.col("_wscore")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["_wscore"],
            ).alias("_score")
        )
    )
    return per_occ.groupBy("phrase", "phrase_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.round(F.max("_score"), 6).alias("rake_score"),
    )


def word_graph_edges(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
) -> DataFrame:
    """Undirected word co-occurrence graph from adjacent token pairs —
    the TextRank substrate (Mihalcea & Tarau '04): nodes are words,
    edges connect words that appear next to each other at least
    ``min_pair_count`` times (the same noise floor as
    :func:`pmi_collocations`), emitted in BOTH directions so every
    node has out-degree ≥ 1 (the sink-free form
    :func:`graph.pagerank_int` requires).

    One tokenize/explode + one grouped count + one distinct — the
    graph build is a corpus scan; the graph itself is vocabulary-
    sized.  Output: (src, dst) string columns.
    """
    words = docs.select(_lower_words(F.col(text_col)).alias("_w")).filter(
        F.size("_w") >= 2
    )
    grams = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("_w"), i).alias("w1"),
                    F.element_at(F.col("_w"), i + 1).alias("w2"),
                ),
            )
        ).alias("_g")
    ).select(F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2"))
    pc = (
        grams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .filter(
            (F.col("c") >= min_pair_count)
            & (F.col("w1") != F.col("w2"))
        )
    )
    return (
        pc.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .union(
            pc.select(
                F.col("w2").alias("src"), F.col("w1").alias("dst")
            )
        )
        .distinct()
    )
