"""Lexical and hybrid retrieval: Okapi BM25 scoring and reciprocal-rank
fusion (RRF) over the document corpus.

Extends the similarity-search family (``operators/similarity.py``) with
the LEXICAL half of a retrieval stack: ANN gives the dense ranking, BM25
the sparse one, and RRF fuses the two rank lists — the standard hybrid
recipe (Cormack et al., SIGIR'09) used by every retrieval-augmented
training-data pipeline to mine documents for a query set.

Scale shape (the part that matters at 100 TB):

- **No inverted index, no explode, no shuffle for scoring.**  For a
  bounded query-term set (the realistic retrieval case: a handful of
  terms), per-term ``tf`` is a map-side ``size(filter(words, =term))``
  over the pre-split token array — the score projection never leaves
  whole-stage codegen.
- **Corpus statistics are ONE single-row aggregate** (N, avgdl, per-term
  df) broadcast back over the scan — the same bounded-collect shape as
  the ANN codebook sites.  Two passes total, both full-parallel.
- **Top-k is TakeOrdered** (orderBy + limit), never a global window.

Reference parity: the reference has no text-retrieval surface (its
closest analog is Athena full-scan LIKE filters, reference
``athena/Athena.sql``); this module is part of the LLM-data-pipeline
extension surface the round brief asks for beyond reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import norm_words


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    Returns (``id_col``, ``dl``, ``score``) for documents matching at
    least one term, ``score`` rounded 6 dp.  idf is the standard
    non-negative form ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    The score expression is built term-by-term in ``query_terms`` order
    on both this and the oracle side, so the floating-point sum is
    bit-reproducible across engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    w = docs.select(
        F.col(id_col), norm_words(F.col(text_col)).alias("_words")
    )
    def _eq(term: str):
        # NOT `lambda x, t=term`: F.filter inspects the callable's arity,
        # and a second parameter (even defaulted) makes it pass the array
        # INDEX there, silently shadowing the captured term
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("_words", _eq(t))).alias(f"_tf{i}")
        for i, t in enumerate(query_terms)
    ]
    t = w.select(
        F.col(id_col), F.size("_words").alias("dl"), *tf_cols
    )
    stats = t.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int"))
            .cast("double")
            .alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    norm_len = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm_len)
    return (
        t.join(F.broadcast(stats))
        .withColumn("score", F.round(score, 6))
        .filter(
            sum(
                (F.col(f"_tf{i}") > 0).cast("int")
                for i in range(len(query_terms))
            )
            > 0
        )
        .select(id_col, "dl", "score")
    )


def bm25_sql(
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB CTE chain equivalent to :func:`bm25_scores` — shares the
    term order (and thus the float summation order) with the Spark plan.
    Exposes CTE ``bm25`` with columns (``id_col``, dl, score)."""

    def _q(t: str) -> str:
        return t.replace("'", "''")

    tf_exprs = ", ".join(
        f"len(list_filter(_words, x -> x = '{_q(t)}')) AS _tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_exprs = ", ".join(
        f"CAST(sum(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS _df{i}"
        for i in range(len(query_terms))
    )
    score_terms = " + ".join(
        f"ln(1.0 + (_n - _df{i} + 0.5) / (_df{i} + 0.5))"
        f" * (CAST(_tf{i} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(_tf{i} AS DOUBLE) + {k1!r}"
        f" * ({1.0 - b!r} + {b!r} * dl / _avgdl))"
        for i in range(len(query_terms))
    )
    any_match = " + ".join(
        f"(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(query_terms))
    )
    return f"""tok AS (
        SELECT {id_col},
               string_split_regex(trim(lower({text_col})),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS _words
        FROM {table}
    ), tf AS (
        SELECT {id_col}, len(_words) AS dl, {tf_exprs} FROM tok
    ), stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS _n, avg(dl) AS _avgdl,
               {df_exprs}
        FROM tf
    ), bm25 AS (
        SELECT {id_col}, dl, round({score_terms}, 6) AS score
        FROM tf CROSS JOIN stats
        WHERE {any_match} > 0
    )"""


N_TERM_BUCKETS = 256


def term_bucket(term_col) -> F.Column:
    """Stable partition key for posting lists: ``xxhash64(term) mod B``.
    Hash-bucketed (not partitioned BY term) so a 10⁷-term vocabulary
    yields a fixed 256-directory layout instead of 10⁷ directories."""
    return F.pmod(F.xxhash64(term_col), F.lit(N_TERM_BUCKETS)).cast("int")


def build_term_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One-time indexing pass → (postings, stats).

    ``postings``: (term, ``id_col``, tf, dl, _term_bucket) — the classic
    posting-list layout, one grouped pass over the exploded tokens.
    ``stats``: ONE row (_n docs, _avgdl) — the corpus constants BM25
    needs at serve time, so serving never rescans the corpus.
    """
    w = docs.select(
        F.col(id_col), norm_words(F.col(text_col)).alias("_words")
    )
    t = w.select(
        F.col(id_col),
        F.size("_words").alias("dl"),
        F.explode("_words").alias("term"),
    )
    postings = (
        t.groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("_term_bucket", term_bucket(F.col("term")))
    )
    stats = w.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size("_words")).alias("_avgdl"),
    )
    return postings, stats


def write_term_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index as a ``_term_bucket``-partitioned
    parquet layout plus a one-row ``_stats`` table — the serving form
    for REPEATED retrieval workloads.  Once postings are on disk keyed
    by the term's hash bucket, a query's term filter becomes
    ``PartitionFilters`` at the scan and only |query_terms| buckets of
    the index are ever read (plan-pinned in tests/test_plans.py) — the
    same write-once/serve-many shape as ``ivf_write_index``.
    """
    postings, stats = build_term_index(docs, id_col, text_col)
    postings.write.mode("overwrite").partitionBy("_term_bucket").parquet(
        f"{path}/postings"
    )
    stats.write.mode("overwrite").parquet(f"{path}/_stats")


def bm25_from_index(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve BM25 from a :func:`write_term_index` layout.

    The scan reads ONLY the query terms' hash-bucket partitions (then
    row-filters to the exact terms); scoring is :func:`score_postings`.
    Results match :func:`bm25_scores` on (id, dl, score) for any term
    set with distinct terms (pytest pins equality).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    buckets = query_term_buckets(spark, query_terms)
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("_term_bucket").isin(buckets)
    )
    stats = spark.read.parquet(f"{path}/_stats")
    return score_postings(postings, stats, query_terms, k1, b, id_col)


def query_term_buckets(spark, query_terms: list[str]) -> list[int]:
    """The hash buckets a term set's postings live in — the literal
    IN-filter a pruned index scan needs (metadata-scale collect:
    |query_terms| ints)."""
    return sorted(
        {
            r["_b"]
            for r in spark.createDataFrame(
                [(t,) for t in query_terms], "term STRING"
            )
            .select(term_bucket(F.col("term")).alias("_b"))
            .collect()
        }
    )


def score_postings(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over posting rows (term, id, tf, dl) plus a one-row stats
    frame (_n, _avgdl) — the scoring core shared by the static index
    (:func:`bm25_from_index`) and the streaming-maintained index
    (``streaming/index_stream.py``).  df comes from the probed postings
    themselves; per-(doc, term) partials sum with a groupBy, so serving
    cost scales with MATCHED postings, not the corpus."""
    postings = postings.filter(F.col("term").isin(query_terms))
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    norm_len = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    partial = idf * (tf * F.lit(k1 + 1.0)) / (tf + norm_len)
    return (
        postings.join(F.broadcast(df_t), on="term")
        .join(F.broadcast(stats))
        .withColumn("_partial", partial)
        .groupBy(id_col, "dl")
        .agg(F.round(F.sum("_partial"), 6).alias("score"))
        .select(id_col, "dl", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion: ``score(d) = Σ_lists 1/(k + rank_l(d))``.

    Each input frame is one ranked list (``id_col``, ``rank_col``,
    1-based).  Ids missing from a list simply contribute nothing — the
    union + groupBy form needs no outer-join ladder and fuses any number
    of lists in ONE shuffle.  Returns (``id_col``, rrf_score, n_lists),
    score rounded 6 dp.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = None
    for r in rankings:
        part = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
             ).alias("_contrib"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    return tagged.groupBy(id_col).agg(
        F.round(F.sum("_contrib"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )


def math_rrf(k: int, rank: int) -> float:
    """Reference scalar for tests: one list's RRF contribution."""
    return 1.0 / (k + rank)


__all__ = [
    "bm25_scores",
    "bm25_sql",
    "build_term_index",
    "write_term_index",
    "bm25_from_index",
    "score_postings",
    "query_term_buckets",
    "term_bucket",
    "rrf_fuse",
    "math_rrf",
]


def ql_dirichlet_scores(
    docs: DataFrame,
    query_terms: list[str],
    mu: float = 300.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty '01) — the language-model scorer next to BM25:
    score(q,d) = Σ_t ln((tf_t + μ·p(t|C)) / (dl + μ)) with the
    collection model p(t|C) = cf_t / |C|.  Same shape discipline as
    :func:`bm25_scores`: map-side tf per query term (no index, no
    explode), ONE single-row corpus-stats broadcast, score terms
    summed in ``query_terms`` order so the float chain is engine-
    reproducible.  Returns (id_col, dl, score) for docs matching at
    least one term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    w = docs.select(
        F.col(id_col), norm_words(F.col(text_col)).alias("_words")
    )

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("_words", _eq(t))).alias(f"_tf{i}")
        for i, t in enumerate(query_terms)
    ]
    t = w.select(
        F.col(id_col), F.size("_words").alias("dl"), *tf_cols
    )
    stats = t.agg(
        F.sum(F.col("dl").cast("bigint")).cast("double").alias("_tc"),
        *[
            F.sum(F.col(f"_tf{i}").cast("bigint"))
            .cast("double")
            .alias(f"_cf{i}")
            for i in range(len(query_terms))
        ],
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        score = score + F.log(
            (tf + F.lit(mu) * (F.col(f"_cf{i}") / F.col("_tc")))
            / (F.col("dl") + F.lit(mu))
        )
    return (
        t.join(F.broadcast(stats))
        .withColumn("score", F.round(score, 6))
        .filter(
            sum(
                (F.col(f"_tf{i}") > 0).cast("int")
                for i in range(len(query_terms))
            )
            > 0
        )
        .select(id_col, "dl", "score")
    )


def ql_dirichlet_sql(
    query_terms: list[str],
    mu: float = 300.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB CTE chain equivalent to :func:`ql_dirichlet_scores` —
    shared term order.  Exposes CTE ``ql`` with (id_col, dl, score)."""

    def _q(t: str) -> str:
        return t.replace("'", "''")

    tf_exprs = ", ".join(
        f"len(list_filter(_words, x -> x = '{_q(t)}')) AS _tf{i}"
        for i, t in enumerate(query_terms)
    )
    cf_exprs = ", ".join(
        f"CAST(sum(CAST(_tf{i} AS BIGINT)) AS DOUBLE) AS _cf{i}"
        for i in range(len(query_terms))
    )
    score_terms = " + ".join(
        f"ln((CAST(_tf{i} AS DOUBLE) + {mu!r} * (_cf{i} / _tc))"
        f" / (dl + {mu!r}))"
        for i in range(len(query_terms))
    )
    any_match = " + ".join(
        f"(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(query_terms))
    )
    return f"""tok AS (
        SELECT {id_col},
               string_split_regex(trim(lower({text_col})),
                                  '[ \\t\\n\\r\\f\\x0b]+') AS _words
        FROM {table}
    ), tf AS (
        SELECT {id_col}, len(_words) AS dl, {tf_exprs} FROM tok
    ), stats AS (
        SELECT CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) AS _tc,
               {cf_exprs}
        FROM tf
    ), ql AS (
        SELECT {id_col}, dl, round({score_terms}, 6) AS score
        FROM tf CROSS JOIN stats
        WHERE {any_match} > 0
    )"""
