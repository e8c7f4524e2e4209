"""Document-level text analysis: language-ID, quality scoring, token stats.

The training-data-pipeline surface (BASELINE.json north star): operators a
100 TB text-corpus pipeline runs over a ``documents(doc_id, text, ...)``
table. Everything is built-in column expressions — no Python in the hot
path; plans stay one scan + one projection (+ one shuffle when aggregating).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pspcz_analyzer_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    normalize_text,
    token_count,
)

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small + deterministic: the point is the operator shape
# (scored column race), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with"),
    "de": ("der", "die", "und", "ist", "nicht", "das"),
    "fr": ("le", "la", "et", "est", "les", "des"),
    "es": ("el", "la", "que", "de", "los", "es"),
    "cs": ("a", "je", "se", "na", "to", "pro"),
}


def _marker_hits(tokens_col: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(F.array_distinct(tokens_col), arr))


def language_id(text_col: Column | str, languages: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Stopword-marker language guess: the language whose marker set has the
    most distinct hits in the document; 'und' (undetermined) when zero.

    Ties break toward the alphabetically-greatest language code (struct
    comparison in greatest()), which is deterministic and cheap.
    """
    languages = languages or LANG_MARKERS
    toks = F.split(normalize_text(text_col), " ")
    scored = [
        F.struct(
            _marker_hits(toks, markers).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(languages.items())
    ]
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document quality features (length, token stats, ratios).

    Mirrors what corpus-filtering pipelines (C4/Gopher-style rules) compute;
    every feature is a codegen'd expression over one scan.
    """
    c = F.col(text_col)
    toks = F.split(normalize_text(c), " ")
    n_tokens = token_count(c)
    return df.select(
        "*",
        F.length(c).alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("distinct_ratio"),
        F.round(
            (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))).cast("double")
            / F.greatest(F.length(c), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
            / F.greatest(F.length(c), F.lit(1)),
            6,
        ).alias("digit_ratio"),
        F.round(
            F.length(c).cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single [0,1] quality score from the features — a rule-based stand-in
    for a model scorer, shaped like one (per-doc scalar, filterable)."""
    feats = quality_features(df, text_col)
    score = (
        F.when(F.col("n_tokens") < 5, 0.0).otherwise(1.0) * 0.25
        + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 1.0).otherwise(0.0) * 0.25
        + F.when(F.col("distinct_ratio") >= 0.3, 1.0).otherwise(0.0) * 0.25
        + F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0) * 0.25
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5-of-normalized-text content fingerprint column."""
    return df.withColumn("fingerprint", fingerprint(text_col))
