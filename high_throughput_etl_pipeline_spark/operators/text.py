"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (SURVEY.md §7.1 step 8): language ID,
quality scoring, token counting, fingerprinting over a `documents` table
(doc_id, text, lang, source, n_chars).  All pure Column expressions —
JVM-side, codegen-friendly, zero Python on the hot path, so they scale to
100 TB of text exactly like any other projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
# disagree on Unicode whitespace membership for \s.
_WORD_SPLIT = r"[ \t\n\r]+"
# BPE-ish token pieces: runs of word chars OR single non-space symbol —
# a cheap stand-in for subword tokenization with the same column shape.
BPE_PIECE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


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


def fingerprint(col) -> F.Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text.

    The exact-dup key; near-dup fingerprints live in dedup.py.
    """
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)
