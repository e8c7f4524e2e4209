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


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1 — the filter set reused by MassiveText /
    RefinedWeb / Dolma): named per-rule booleans plus the conjunction
    ``keep_gopher``, so pipelines can both filter and AUDIT which rule
    fired (the flags are the data card).

    Rules (document dropped when the flag is False):

    * ``ok_word_count``       50 <= words <= 100,000
    * ``ok_mean_word_len``    3 <= mean word length <= 10
    * ``ok_symbol_ratio``     (# + ...) per word <= 0.1
    * ``ok_bullet_lines``     < 90% of lines start with a bullet
    * ``ok_ellipsis_lines``   < 30% of lines end with an ellipsis
    * ``ok_alpha_words``      >= 80% of words contain a letter
    * ``ok_stopwords``        >= 2 distinct English stopword hits
      (the, be/is, to, of, and, that, have, with)

    All pure codegen'd column expressions over ONE scan — no UDF, no
    shuffle; embarrassingly parallel over file splits at any scale.
    """
    c = F.col(text_col)
    toks = F.split(normalize_text(c), " ")
    words = F.filter(toks, lambda w: F.length(w) > 0)
    n_words = F.size(words)
    nz = F.greatest(n_words, F.lit(1))
    lines = F.filter(F.split(c, "\n"), lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wl = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / nz
    # Occurrence counts (split-based), not character counts — one '...'
    # is ONE symbol hit.
    n_symbols = (
        F.size(F.split(c, "#")) - 1 + F.size(F.split(c, r"\.\.\.")) - 1
    )
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stopwords = F.array(
        *[F.lit(s) for s in ("the", "be", "is", "to", "of", "and", "that", "have", "with")]
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(words), stopwords))

    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "ok_symbol_ratio": (n_symbols / nz) <= 0.1,
        "ok_bullet_lines": (bullet_lines / n_lines) < 0.9,
        "ok_ellipsis_lines": (ellipsis_lines / n_lines) < 0.3,
        "ok_alpha_words": (alpha_words / nz) >= 0.8,
        "ok_stopwords": stop_hits >= 2,
    }
    out = df.select(
        "*",
        n_words.alias("gopher_n_words"),
        *[v.alias(k) for k, v in flags.items()],
    )
    keep = None
    for k in flags:
        keep = F.col(k) if keep is None else (keep & F.col(k))
    return out.withColumn("keep_gopher", keep)
