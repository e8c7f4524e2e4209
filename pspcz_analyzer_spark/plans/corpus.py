"""Gate query for the composed training-corpus pipeline.

Runs ``pipeline.prepare_training_corpus`` end-to-end (dedup -> language
filter -> quality filter -> sharded Parquet write) against the documents
table, then returns the corpus read BACK from the sink — so the oracle
match proves the whole composition including the write/read round-trip.

The oracle replicates every stage in DuckDB SQL: md5-fingerprint
canonical selection (min id per fingerprint), the stopword-marker
language argmax, the rule quality score, both token counts, and the
modulo shard assignment (the query runs with ``shard_by_hash=False`` so
the shard is SQL-expressible; hash sharding stays the production default
and is unit-tested for uniformity).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.plans import register
from pspcz_analyzer_spark.scratch import scratch_path
from pspcz_analyzer_spark.plans.text import _NORM


def _scratch(sf_dir: str, name: str) -> str:
    # Per-process salt: concurrent gate/bench sessions must not race on
    # these delete-and-rewrite sink dirs (see pspcz_analyzer_spark.scratch).
    return scratch_path(sf_dir, name)


_LANGS = ("cs", "de", "en", "es", "fr")  # everything but 'und'

_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text,
             {_NORM.format(c="text")} AS ntext,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS n_bpe_tokens,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1) AS pr_raw,
             length(text)::DOUBLE AS n_chars_d
      FROM documents
    ),
    scored AS (
      SELECT *,
             md5(ntext) AS fp,
             list_distinct(string_split(ntext, ' ')) AS toks,
             len(list_distinct(string_split(ntext, ' ')))
               / greatest(n_tokens, 1) AS dr_raw,
             n_chars_d / greatest(n_tokens, 1) AS mtl_raw
      FROM base
    ),
    hits AS (
      SELECT *,
        len(list_intersect(toks, ['the','and','of','to','is','with'])) AS h_en,
        len(list_intersect(toks, ['der','die','und','ist','nicht','das'])) AS h_de,
        len(list_intersect(toks, ['le','la','et','est','les','des'])) AS h_fr,
        len(list_intersect(toks, ['el','la','que','de','los','es'])) AS h_es,
        len(list_intersect(toks, ['a','je','se','na','to','pro'])) AS h_cs
      FROM scored
    ),
    final AS (
      SELECT doc_id,
        CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_cs) = 0 THEN 'und'
             WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de AND h_fr >= h_cs THEN 'fr'
             WHEN h_es >= h_en AND h_es >= h_de AND h_es >= h_cs THEN 'es'
             WHEN h_en >= h_de AND h_en >= h_cs THEN 'en'
             WHEN h_de >= h_cs THEN 'de'
             ELSE 'cs' END AS pred_lang,
        CAST(doc_id % 8 AS INTEGER) AS shard,
        CAST(n_tokens AS INTEGER) AS n_tokens,
        CAST(n_bpe_tokens AS INTEGER) AS n_bpe_tokens,
        CAST(round(
          (CASE WHEN n_tokens < 5 THEN 0.0 ELSE 1.0 END) * 0.25
          + (CASE WHEN mtl_raw >= 3 AND mtl_raw <= 12 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN dr_raw >= 0.3 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN pr_raw <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25, 6)
        AS DOUBLE) AS quality_score
      FROM hits
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
    )
    SELECT doc_id, pred_lang, shard, n_tokens, n_bpe_tokens, quality_score
    FROM final
    WHERE pred_lang IN ('cs','de','en','es','fr') AND quality_score >= 0.5
    ORDER BY doc_id
"""


@register(
    "training_corpus_prepare",
    oracle=_ORACLE,
    tags=("pipeline", "dedup", "quality", "lang-id", "sink", "composite"),
    doc="The composed corpus-preparation job end-to-end: exact dedup + "
    "language + quality filters + sharded Parquet write, verified through "
    "the sink round-trip (pipeline.py::prepare_training_corpus).",
)
def training_corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.pipeline import prepare_training_corpus

    docs = load_table(spark, sf_dir, "documents")
    out = _scratch(sf_dir, "training_corpus")
    prepare_training_corpus(
        spark,
        docs,
        out,
        min_quality=0.5,
        keep_langs=_LANGS,
        near_dup=False,  # near-dup stage is unit-tested; LSH bands are not
        # SQL-expressible, and the gate needs the oracle twin
        shards=8,
        shard_by_hash=False,
    )
    back = spark.read.parquet(out)
    return back.select(
        "doc_id", "pred_lang", "shard", "n_tokens", "n_bpe_tokens", "quality_score"
    ).orderBy("doc_id")


_SPLIT_BUCKET = "((doc_id * 2654435761) % 4294967296) % 100"


@register(
    "corpus_train_split",
    oracle=f"""
    SELECT doc_id,
           CAST({_SPLIT_BUCKET} AS INTEGER) AS bucket,
           CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
    tags=("pipeline", "split", "new-surface"),
    doc="Deterministic hash-bucket train/val/test assignment (90/5/5): a "
    "pure projection, stable across runs and data growth — docs never "
    "migrate between splits (operators/corpusprep.py::train_val_test_split).",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import train_val_test_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return train_val_test_split(docs).orderBy("doc_id")


@register(
    "corpus_pack_sequences",
    oracle="""
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT *, COALESCE(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM base
    )
    SELECT doc_id, shard, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(floor(cum / 512) AS INTEGER) AS pack_id,
           CAST(cum % 512 AS INTEGER) AS pack_offset
    FROM packed
    ORDER BY doc_id
    """,
    tags=("pipeline", "packing", "W3-scale", "new-surface"),
    doc="Sequence packing: lay docs end-to-end within hash shards and "
    "assign each to its 512-token training block (contiguous-fill packing; "
    "straddling docs are attention-masked downstream, "
    "operators/corpusprep.py::pack_sequences).",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.functions.text import token_count
    from pspcz_analyzer_spark.operators.corpusprep import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        token_count("text").alias("n_tokens"),
    )
    return pack_sequences(docs, "n_tokens", budget=512, shard_col="shard").orderBy(
        "doc_id"
    )


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH bench_docs AS (
      SELECT doc_id + 500000 AS doc_id,
             substr(text, 1, CAST(floor(n_chars / 3) AS INT)) AS text
      FROM documents WHERE doc_id % 97 = 0
    ),
    c_norm AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM documents
    ),
    b_norm AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM bench_docs
    ),
    c_sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> array_to_string(toks[i:least(i + 4, len(toks))], ' ')
             )) AS shingle
      FROM c_norm
    ),
    b_sh AS (
      SELECT DISTINCT
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> array_to_string(toks[i:least(i + 4, len(toks))], ' ')
             )) AS shingle
      FROM b_norm
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM c_sh c JOIN b_sh b USING (shingle)
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
    tags=("pipeline", "dedup-near", "decontamination", "new-surface"),
    doc="Benchmark decontamination: corpus docs sharing any normalized "
    "5-gram with a planted eval set (first thirds of every 97th doc), with "
    "distinct-shared-shingle counts. Candidate pairs only meet via shared "
    "shingle hashes; the (small) benchmark side broadcasts "
    "(operators/corpusprep.py::contamination_report).",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.operators.corpusprep import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(n_chars / 3) AS INT))").alias("text"),
    )
    return contamination_report(
        docs.select("doc_id", "text"), bench, n=5
    ).orderBy("doc_id")


@register(
    "doc_top_terms",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id,
             unnest(string_split({_NORM.format(c="text")}, ' ')) AS term
      FROM documents
    ),
    counted AS (
      SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_occurrences
      FROM terms WHERE term <> ''
      GROUP BY term
    )
    SELECT term, CAST(doc_freq AS BIGINT) AS doc_freq,
           CAST(total_occurrences AS BIGINT) AS total_occurrences
    FROM counted
    ORDER BY doc_freq DESC, total_occurrences DESC, term ASC
    LIMIT 50
    """,
    tags=("pipeline", "vocab", "A7-scale", "new-surface"),
    doc="Top-50 vocabulary terms by document frequency (tokenizer-prep "
    "heavy-hitter scan): explode normalized tokens, one term-keyed "
    "aggregate, global top-k via TakeOrderedAndProject; ties broken "
    "deterministically (operators/corpusprep.py::top_terms).",
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import top_terms

    return top_terms(load_table(spark, sf_dir, "documents"), k=50)


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "(\\+[0-9]{3} )?[0-9]{3} [0-9]{3} [0-9]{3}"


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             ) AS grams
      FROM norm
    )
    SELECT doc_id,
           CAST(len(grams) AS INTEGER) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_ngrams,
           round(1.0 - len(list_distinct(grams)) / len(grams), 6) AS dup_ngram_frac
    FROM sh
    ORDER BY doc_id
    """,
    tags=("pipeline", "quality", "repetition", "new-surface"),
    doc="Gopher-style duplicate 3-gram fraction per document (templated/"
    "spammy text repeats phrases): shingle occurrences and their distinct "
    "count from ONE per-row array — no explode, no shuffle "
    "(operators/corpusprep.py::dup_ngram_stats).",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import dup_ngram_stats

    return dup_ngram_stats(load_table(spark, sf_dir, "documents"), n=3).orderBy(
        "doc_id"
    )


@register(
    "corpus_pii_redacted",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' kontakt: clen' || doc_id
                       || '@psp.cz volejte +420 602 123 456'
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
    FROM planted
    ORDER BY doc_id
    """,
    tags=("pipeline", "pii", "F-scale", "new-surface"),
    doc="PII redaction over a corpus with planted contact lines (every 7th "
    "doc): portable email/phone regexes (no lookarounds, Java+RE2 "
    "identical), typed placeholders, fingerprint of the redacted text "
    "proving byte-identical output (functions/text.py::redact_pii).",
)
def corpus_pii_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.functions.text import count_pii, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" kontakt: clen"),
            F.col("doc_id").cast("string"),
            F.lit("@psp.cz volejte +420 602 123 456"),
        ),
    ).otherwise(F.col("text"))
    staged = docs.select("doc_id", planted.alias("t"))
    n_mail, n_tel = count_pii("t")
    return staged.select(
        "doc_id",
        n_mail.alias("n_emails"),
        n_tel.alias("n_phones"),
        F.md5(redact_pii("t")).alias("redacted_fp"),
    ).orderBy("doc_id")


@register(
    "corpus_lang_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(((doc_id * 2246822519) % 4294967296) % 100 AS INTEGER)
               AS sample_bucket
      FROM documents
    )
    SELECT doc_id, lang, sample_bucket
    FROM b
    WHERE sample_bucket < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                          ELSE 10 END
    ORDER BY doc_id
    """,
    tags=("pipeline", "sampling", "new-surface"),
    doc="Deterministic stratified downsampling for data mixing (keep all "
    "en, half de, 10% of the rest): hash-bucket membership, so re-runs and "
    "repartitionings keep exactly the same rows — unlike df.sample "
    "(operators/corpusprep.py::stratified_hash_sample).",
)
def corpus_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        docs, "lang", {"en": 100, "de": 50}, default_pct=10
    ).orderBy("doc_id")


@register(
    "corpus_source_cap",
    oracle="""
    WITH base AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *, COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM base
    )
    SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(tokens_before AS BIGINT) AS tokens_before
    FROM c
    WHERE tokens_before < 800
    ORDER BY doc_id
    """,
    tags=("pipeline", "mixing", "W3-scale", "new-surface"),
    doc="Per-source token budgeting (mixture-weight enforcement): keep each "
    "source's docs in doc_id order until 800 tokens are on board; "
    "within-group running-sum window, one shuffle on source "
    "(operators/corpusprep.py::cap_tokens_per_group).",
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.functions.text import token_count
    from pspcz_analyzer_spark.operators.corpusprep import cap_tokens_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return cap_tokens_per_group(docs, "source", "n_tokens", cap=800).orderBy("doc_id")


@register(
    "corpus_unimax_sample",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    ord AS (
      SELECT lang, cnt,
             row_number() OVER (ORDER BY cnt, lang) AS i,
             coalesce(sum(cnt) OVER (
               ORDER BY cnt, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS bef,
             count(*) OVER () AS k
      FROM c
    ),
    flags AS (
      SELECT lang, cnt, i,
             CASE WHEN cnt * (k - i + 1) <= (400 - bef) THEN 1 ELSE 0 END
               AS capped
      FROM ord
    ),
    pool AS (
      SELECT sum(CASE WHEN capped = 1 THEN cnt ELSE 0 END) AS capsum,
             count(*) - sum(capped) AS u
      FROM flags
    ),
    quotas AS (
      SELECT f.lang,
             CASE WHEN f.capped = 1 THEN f.cnt
                  ELSE (400 - p.capsum) // p.u
                       + CASE WHEN row_number() OVER (
                                PARTITION BY f.capped ORDER BY f.cnt, f.lang
                              ) <= (400 - p.capsum) % p.u THEN 1 ELSE 0 END
             END AS quota
      FROM flags f, pool p
    )
    SELECT d.doc_id, d.lang, CAST(d.rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 2246822519) % 4294967296, doc_id
             ) AS rn
      FROM documents
    ) d
    JOIN quotas q ON d.lang = q.lang
    WHERE d.rn <= q.quota
    ORDER BY d.lang, sample_rank
    """,
    tags=("pipeline", "sampling", "mixing", "new-surface"),
    priority=18,
    doc="UniMax language-budgeted sampling (arXiv:2304.09151): a 400-doc "
    "budget waterfilled across languages — each language gets its full "
    "uniform share, smaller languages contribute everything and their "
    "unused share redistributes (exact integer arithmetic, deterministic "
    "remainder) — then the per-language draw is the replayable hash rank. "
    "The oracle re-derives the ENTIRE waterfill in SQL (window-function "
    "prefix sums; the capped test is provably prefix-monotone), so the "
    "gate pins quotas AND membership. Tames head-heavy mixtures where "
    "temperature sampling still over-samples the head "
    "(operators/corpusprep.py::unimax_quotas/unimax_sample).",
)
def corpus_unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import unimax_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return unimax_sample(docs, "lang", 400).orderBy("lang", "sample_rank")


@register(
    "corpus_lang_sample_exact",
    oracle="""
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 2246822519) % 4294967296, doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 60
    ORDER BY lang, sample_rank
    """,
    tags=("pipeline", "sampling", "new-surface"),
    priority=36,
    doc="EXACT quota sampling: exactly min(60, |lang|) docs per language, "
    "ranked by a replayable id hash — the deterministic 'N docs per "
    "stratum' companion to the rate-based corpus_lang_sample "
    "(operators/corpusprep.py::exact_stratified_sample).",
)
def corpus_lang_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import exact_stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return exact_stratified_sample(docs, "lang", 60).orderBy(
        "lang", "sample_rank"
    )


@register(
    "doc_top_terms_by_lang",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, lang,
             unnest(string_split({_NORM.format(c="text")}, ' ')) AS term
      FROM documents
    ),
    counted AS (
      SELECT lang, term, count(DISTINCT doc_id) AS doc_freq,
             count(*) AS total_occurrences
      FROM terms WHERE term <> ''
      GROUP BY lang, term
    ),
    ranked AS (
      SELECT lang, term, CAST(doc_freq AS BIGINT) AS doc_freq,
             CAST(total_occurrences AS BIGINT) AS total_occurrences,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY doc_freq DESC, total_occurrences DESC, term ASC)
             AS BIGINT) AS rank
      FROM counted
    )
    SELECT * FROM ranked WHERE rank <= 10
    ORDER BY lang, rank
    """,
    tags=("pipeline", "vocab", "new-surface"),
    priority=36,
    doc="Per-language top-10 vocabulary terms (mixture-aware tokenizer "
    "prep): term-keyed aggregate, then a rank window over the (lang, "
    "term) AGGREGATE — window input is bounded by per-group vocabulary, "
    "never corpus rows (operators/corpusprep.py::top_terms_per_group).",
)
def doc_top_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import top_terms_per_group

    return top_terms_per_group(
        load_table(spark, sf_dir, "documents"), "lang", k=10
    ).orderBy("lang", "rank")


_CHUNK = r"regexp_extract_all(text, '\S+ \S+')"


@register(
    "corpus_remove_boilerplate",
    oracle=f"""
    WITH exploded AS (
      SELECT doc_id,
             unnest({_CHUNK}) AS line,
             generate_subscripts({_CHUNK}, 1) AS pos
      FROM documents
    ),
    freq AS (
      SELECT line FROM exploded GROUP BY line
      HAVING count(DISTINCT doc_id) >= 25
    ),
    agg AS (
      SELECT l.doc_id,
             count(*) AS n_lines,
             count(*) FILTER (WHERE f.line IS NULL) AS n_kept,
             COALESCE(string_agg(l.line, ' ' ORDER BY l.pos)
                      FILTER (WHERE f.line IS NULL), '') AS clean_text
      FROM exploded l LEFT JOIN freq f ON l.line = f.line
      GROUP BY l.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_lines, 0) AS INTEGER) AS n_lines,
           CAST(COALESCE(a.n_kept, 0) AS INTEGER) AS n_kept,
           COALESCE(a.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    tags=("pipeline", "boilerplate", "dedup-near", "new-surface"),
    priority=18,
    doc="C4-style boilerplate removal: drop every line occurring in >= 25 "
    "distinct docs (corpus-frequency rule), reassemble survivors in "
    "original order. Lines here are non-overlapping 2-word chunks (the "
    "synthetic corpus has no newlines); production passes the real "
    "newline splitter (operators/corpusprep.py::remove_boilerplate_lines).",
)
def corpus_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import remove_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_boilerplate_lines(
        docs,
        min_docs=25,
        line_splitter=F.expr(r"regexp_extract_all(text, '\\S+ \\S+', 0)"),
        join_sep=" ",
    ).orderBy("doc_id")


_SHUF_KEY = "(doc_id * 2654435761 + 17) % 4294967296"


@register(
    "corpus_shuffle_order",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, {_SHUF_KEY} AS shuffle_key,
             CAST(floor(({_SHUF_KEY}) * 8 / 4294967296) AS INTEGER) AS shard
      FROM documents
    )
    SELECT doc_id, shuffle_key, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY shuffle_key, doc_id)
                AS INTEGER) AS pos
    FROM keyed
    ORDER BY doc_id
    """,
    tags=("pipeline", "shuffle", "new-surface"),
    priority=18,
    doc="Deterministic training-order shuffle: salted multiplicative-hash "
    "key, range-partitioned shard, in-shard position — shard-major read "
    "order replays one fixed pseudorandom permutation, stable under "
    "re-partitioning and incremental appends "
    "(operators/corpusprep.py::shuffle_order).",
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import shuffle_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_order(docs, seed=17, shards=8).orderBy("doc_id")


_MIX_FRAC = "((doc_id * 2246822519) % 4294967296) / 4294967296.0"


@register(
    "corpus_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(power(n_docs, 0.5)) AS tw FROM counts),
    rates AS (
      SELECT lang,
             round(least(1.0, power(n_docs, 0.5) / tw * 300 / n_docs), 6)
               AS keep_rate
      FROM counts, tot
    )
    SELECT d.doc_id, d.lang, r.keep_rate
    FROM documents d JOIN rates r USING (lang)
    WHERE {_MIX_FRAC} < r.keep_rate
    ORDER BY d.doc_id
    """,
    tags=("pipeline", "sampling", "mixing", "new-surface"),
    priority=18,
    doc="Temperature-based data mixing (alpha=0.5, 300-doc budget): "
    "per-language keep rates self-tuned from observed counts toward "
    "n^alpha shares, applied via the deterministic id-hash bucket — "
    "the corpus never shuffles "
    "(operators/corpusprep.py::temperature_mixture).",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import temperature_mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mixture(
        docs, "lang", total_budget=300, alpha=0.5
    ).select("doc_id", "lang", "keep_rate").orderBy("doc_id")


@register(
    "corpus_quality_calibrated",
    oracle="""
    WITH thr AS (
      SELECT round(quantile_cont(n_chars, 0.6), 6) AS threshold
      FROM documents
    )
    SELECT d.doc_id, d.n_chars, t.threshold
    FROM documents d, thr t
    WHERE d.n_chars >= t.threshold
    ORDER BY d.doc_id
    """,
    tags=("pipeline", "quality", "sampling", "new-surface"),
    priority=18,
    doc="Self-tuning quality filter: keep the top 40% of docs by length, "
    "threshold computed as the 60th percentile of the observed "
    "distribution rather than hard-coded — knob-free filtering that "
    "survives corpus drift; the scalar threshold broadcasts back onto "
    "the corpus. Calibrates on a STORED column (n_chars): filtering on a "
    "computed score would re-evaluate its expression inside the "
    "pushed-down filter, so expression-backed scores materialize first "
    "(the pipeline.py staging pattern) "
    "(operators/corpusprep.py::calibrate_keep_threshold).",
)
def corpus_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import calibrate_keep_threshold

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return calibrate_keep_threshold(docs, "n_chars", keep_frac=0.4).orderBy(
        "doc_id"
    )


@register(
    "corpus_extend_near_dup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_NORM.format(c="text")} AS ntext
      FROM documents WHERE doc_id % 7 != 0
    ),
    corpus AS (  -- prepare(): one canonical doc per fingerprint
      SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(ntext)
    )
    -- The +700000 near-dup batch rows (corpus texts with a token
    -- appended) are all dropped by the signature check (agreement ~0.97
    -- vs threshold 0.2); the +800000 novel rows (unique synthetic
    -- tokens, zero shingle overlap with anything) are all kept.
    SELECT doc_id FROM corpus
    UNION ALL
    SELECT doc_id + 800000 AS doc_id
    FROM documents WHERE doc_id % 7 = 0
    ORDER BY doc_id
    """,
    tags=("pipeline", "dedup-near", "incremental", "sink", "new-surface"),
    priority=18,
    doc="Incremental near-dedup against ALL history via the MinHash "
    "sidecar index (pipeline.build_minhash_index + extend_training_corpus "
    "near_dup_index): a batch of history-near-dups (corpus docs with one "
    "token appended - signature agreement ~0.97, certainly >= the 0.2 "
    "threshold) and certainly-novel docs (unique synthetic tokens, zero "
    "shingle overlap) extends the corpus; only the novel docs land. "
    "History is scanned once (id+signature columns), never shuffled - "
    "the batch side broadcasts.",
)
def corpus_extend_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _shutil

    from pspcz_analyzer_spark.pipeline import (
        build_minhash_index,
        extend_training_corpus,
        prepare_training_corpus,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = _scratch(sf_dir, "neardup_corpus")
    idx = _scratch(sf_dir, "neardup_idx")
    for p in (out, idx):
        if os.path.exists(p):
            _shutil.rmtree(p)

    base = docs.filter(F.col("doc_id") % 7 != 0)
    prepare_training_corpus(
        spark, base, out, min_quality=0.0, keep_langs=None,
        near_dup=False, shards=4, shard_by_hash=False,
    )
    corpus = spark.read.parquet(out)
    build_minhash_index(spark, corpus, idx)

    near = corpus.select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    # Unique per-doc tokens: no shingle can overlap history or another
    # novel doc, so "kept" is certain regardless of testdata generation.
    c = F.col("doc_id").cast("string")
    novel = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 800000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("nv"), c), F.concat(F.lit("vx"), c),
            F.concat(F.lit("zq"), c), F.concat(F.lit("wy"), c),
            F.concat(F.lit("kj"), c),
        ).alias("text"),
    )
    extend_training_corpus(
        spark, near.unionByName(novel), out,
        min_quality=0.0, keep_langs=None, shards=4, shard_by_hash=False,
        near_dup_index=idx, near_dup_threshold=0.2,
    )
    return spark.read.parquet(out).select("doc_id").orderBy("doc_id")


@register(
    "doc_bpe_merges",
    oracle=None,  # iterative greedy merges are not SQL-expressible; the
    # merge algebra is pinned by hand-case + determinism tests
    # (test_corpusprep.py::TestBpeMerges)
    tags=("pipeline", "tokenizer", "rows-only", "new-surface"),
    priority=52,
    doc="BPE merge-table training over the corpus (Sennrich-style): the "
    "corpus-scale work is ONE word-count aggregate; the greedy merge loop "
    "runs over the vocabulary-sized count table, as in every production "
    "BPE trainer (operators/corpusprep.py::bpe_merges).",
)
def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, n_merges=40).orderBy("merge_rank")


@register(
    "doc_bpe_encoded",
    oracle=None,  # trained-tokenizer segmentation is not SQL-expressible;
    # greedy rank-order semantics pinned in test_corpusprep.py::TestBpeEncode
    tags=("pipeline", "tokenizer", "rows-only", "new-surface"),
    priority=52,
    doc="Train-then-encode: 40 BPE merges learned from the corpus, then "
    "every doc encoded with them (JVM-side normalization/split, "
    "Arrow-batched greedy merges memoized per distinct word) — trained "
    "token accounting next to the regex estimate "
    "(operators/corpusprep.py::bpe_encode_counts).",
)
def doc_bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import (
        bpe_encode_counts,
        bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = [
        (r.left, r.right)
        for r in bpe_merges(docs, n_merges=40).orderBy("merge_rank").collect()
    ]
    return bpe_encode_counts(docs, table).orderBy("doc_id")


@register(
    "corpus_chunk_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    starts AS (
      SELECT doc_id, t,
             unnest(range(0, greatest(len(t) - 1, 0) + 1, 16)) AS start_tok,
             generate_subscripts(range(0, greatest(len(t) - 1, 0) + 1, 16), 1) - 1
               AS chunk_id
      FROM toks
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(start_tok AS INTEGER) AS start_tok,
           CAST(len(t[start_tok + 1 : start_tok + 24]) AS INTEGER)
             AS n_chunk_tokens,
           array_to_string(t[start_tok + 1 : start_tok + 24], ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
    tags=("pipeline", "chunking", "new-surface"),
    priority=18,
    doc="Overlapping token-window chunking (24-token windows, stride 16, "
    "8-token overlap): retrieval/training context splitting as a pure "
    "codegen'd projection + one Generate — no UDF, no shuffle "
    "(operators/corpusprep.py::chunk_token_windows).",
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import chunk_token_windows

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_token_windows(docs, window=24, stride=16).orderBy(
        "doc_id", "chunk_id"
    )


@register(
    "doc_lm_perplexity",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM.format(c="text")}, ' ')) AS w
      FROM documents
    ),
    dw AS (SELECT doc_id, w FROM words WHERE w != ''),
    wc AS (SELECT w AS word, count(*) AS n FROM dw GROUP BY w),
    tot AS (SELECT sum(n) AS t, count(*) AS v FROM wc)
    SELECT dw.doc_id,
           CAST(count(*) AS INTEGER) AS n_words,
           round(avg(-ln((COALESCE(wc.n, 0) + 0.5)
                         / (tot.t + 0.5 * (tot.v + 1)))), 6) AS avg_neg_logp
    FROM dw LEFT JOIN wc ON dw.w = wc.word, tot
    GROUP BY dw.doc_id
    ORDER BY dw.doc_id
    """,
    tags=("pipeline", "quality", "lm", "new-surface"),
    priority=18,
    doc="Unigram-LM perplexity quality scores (CCNet-style bucketing "
    "signal, self-trained — no external model): one vocab aggregate, a "
    "one-row (T, V) broadcast, a word-keyed left join, one doc-keyed "
    "mean (operators/corpusprep.py::unigram_logprob_scores).",
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_logprob_scores(docs).orderBy("doc_id")


@register(
    "doc_bigram_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS t
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2
      FROM (
        SELECT doc_id,
               unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                       for i in range(1, len(t))]) AS p
        FROM toks WHERE len(t) >= 2
      )
    ),
    model AS (SELECT w1, w2, count(*) AS n12 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(n12) AS n1 FROM model GROUP BY w1),
    voc AS (
      SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(t) AS w FROM toks) WHERE w != ''
    )
    SELECT pairs.doc_id,
           CAST(count(*) AS INTEGER) AS n_bigrams,
           round(avg(-ln((model.n12 + 0.5)
                         / (ctx.n1 + 0.5 * (voc.v + 1)))), 6) AS avg_neg_logp
    FROM pairs
    JOIN model USING (w1, w2)
    JOIN ctx USING (w1), voc
    GROUP BY pairs.doc_id
    ORDER BY pairs.doc_id
    """,
    tags=("pipeline", "quality", "lm", "new-surface"),
    priority=18,
    doc="Bigram-LM perplexity (context-aware CCNet/KenLM-style filter, "
    "self-trained): bigrams built inside the token array (zip_with of "
    "shifted slices — zero shuffle, zero UDF), one pair-keyed training "
    "aggregate, scoring joins + one doc-keyed mean "
    "(operators/corpusprep.py::bigram_logprob_scores).",
)
def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import bigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_logprob_scores(docs).orderBy("doc_id")


def _textrank_oracle_sql() -> str:
    from pspcz_analyzer_spark.plans.relational import _pagerank_oracle_sql

    edges = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS t
      FROM documents
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    band AS MATERIALIZED (
      SELECT term FROM (
        SELECT term, count(*) AS df FROM (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(t) AS term FROM toks
          ) WHERE length(term) >= 3
        ) GROUP BY term
      ), nd WHERE df >= 30 AND df <= floor(0.79 * nd.n)
    ),
    surv AS (
      SELECT w1, w2 FROM (
        SELECT p['w1'] AS w1, p['w2'] AS w2
        FROM (
          SELECT unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                         for i in range(1, len(t))]) AS p
          FROM toks WHERE len(t) >= 2
        )
      ) adj
      JOIN band b1 ON adj.w1 = b1.term
      JOIN band b2 ON adj.w2 = b2.term
      WHERE w1 != w2
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT w1 AS src, w2 AS dst FROM surv
        UNION ALL
        SELECT w2, w1 FROM surv
      )
    )"""
    final = """
    SELECT node AS term, round(rank, 6) AS rank
    FROM r{last}
    ORDER BY round(rank, 6) DESC, node
    LIMIT 20"""
    return _pagerank_oracle_sql(edges_sql=edges, final_sql=final)


@register(
    "doc_textrank_keywords",
    oracle=_textrank_oracle_sql(),
    tags=("pipeline", "graph", "keywords", "new-surface"),
    priority=18,
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank "
    "over the adjacent-word co-occurrence graph, df-banded to drop "
    "noise terms and stopword hubs (operators/textual.py::"
    "textrank_keywords). The corpus-sized pair explode collapses to a "
    "vocabulary-squared-bounded DISTINCT, so the 10 iterations run over "
    "a tiny graph at any corpus scale. Oracle: the same graph "
    "construction + the same 10 unrolled MATERIALIZED-CTE PageRank "
    "iterations the suppliers query pinned, on string nodes.",
)
def doc_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.textual import textrank_keywords

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return textrank_keywords(
        docs, min_term_len=3, min_df=30, max_df_frac=0.79, k=20
    )


@register(
    "doc_duplicate_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+9], ' ')
                     for i in range(1, greatest(len(t) - 8, 1))]) AS w
      FROM toks WHERE len(t) >= 10
    ),
    dup AS (
      SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2
    ),
    per AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id),
    dupper AS (
      SELECT doc_id, count(*) AS n_dup_windows
      FROM wins JOIN dup USING (w) GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_windows,
           COALESCE(d.n_dup_windows, 0) AS n_dup_windows,
           round(COALESCE(d.n_dup_windows, 0) / p.n_windows, 6) AS dup_frac
    FROM per p LEFT JOIN dupper d USING (doc_id)
    ORDER BY p.doc_id
    """,
    tags=("pipeline", "dedup-spans", "new-surface"),
    priority=18,
    doc="Cross-document duplicated-span statistics — the ExactSubstr "
    "signal of Lee et al. 2022 (arXiv:2107.06499) as DataFrame plans "
    "instead of a suffix array: every 10-token sliding window hashed "
    "(xxhash64; the oracle compares the window STRINGS, proving the "
    "hash path loses nothing), duplicated = present in >= 2 distinct "
    "docs. One hash-keyed shuffle + one equi-join against the small "
    "duplicated-hash set; removal twin remove_duplicate_spans is "
    "brute-force-tested in test_dedup.py "
    "(operators/dedup.py::duplicate_span_stats).",
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import duplicate_span_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicate_span_stats(docs, window=10, min_docs=2).orderBy("doc_id")


@register(
    "doc_duplicate_spans_removed",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id,
             unnest([{{'i': i, 'w': array_to_string(t[i:i+9], ' ')}}
                     for i in range(1, greatest(len(t) - 8, 1))],
                    recursive := true)
      FROM toks WHERE len(t) >= 10
    ),
    dup AS (
      SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2
    ),
    starts AS (
      SELECT doc_id, list(i) AS ss FROM wins JOIN dup USING (w)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(array_to_string(
             [t.t[j] for j in range(1, len(t.t) + 1)
              if len(list_filter(COALESCE(s.ss, []),
                                 x -> x <= j AND j <= x + 9)) = 0],
             ' '), '') AS text_clean,
           CAST(len(t.t)
                - len([t.t[j] for j in range(1, len(t.t) + 1)
                       if len(list_filter(COALESCE(s.ss, []),
                                          x -> x <= j AND j <= x + 9)) = 0])
                AS BIGINT) AS n_tokens_removed
    FROM toks t LEFT JOIN starts s USING (doc_id)
    ORDER BY t.doc_id
    """,
    tags=("pipeline", "dedup-spans", "new-surface"),
    priority=18,
    doc="The removal half of ExactSubstr dedup, oracle-paired end to end: "
    "every token covered by a cross-document duplicated 10-token window "
    "is dropped and the CLEANED TEXT itself is hash-compared against an "
    "independent SQL reconstruction (per-token coverage masks in both "
    "engines) — stronger than the stats check, because it pins the exact "
    "window starts, not just their counts "
    "(operators/dedup.py::remove_duplicate_spans).",
)
def doc_duplicate_spans_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(docs, window=10, min_docs=2).orderBy("doc_id")


@register(
    "corpus_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             pow((('0x' || substr(md5('ws1' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT) / 4294967296.0,
                 1.0 / greatest(CAST(n_chars AS DOUBLE), 1e-12)) AS pri
      FROM documents
    )
    SELECT doc_id, n_chars, round(pri, 6) AS priority
    FROM keyed ORDER BY pri DESC, doc_id LIMIT 50
    """,
    tags=("pipeline", "sampling", "new-surface"),
    priority=18,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis "
    "A-ES): 50 docs with probability proportional to length — "
    "priorities u^(1/w) from a salted md5 uniform, global top-k as "
    "TakeOrderedAndProject; deterministic and partition-independent, and "
    "the DuckDB oracle recomputes the same draw from the same md5 hex "
    "(engine-agreeing in practice; see the operator docstring for the "
    "pow() ULP caveat) (operators/corpusprep.py::weighted_sample). "
    "Complements the "
    "rate-based stratified/temperature samplers with an exact-k, "
    "exact-weights draw.",
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "n_chars", k=50).select(
        "doc_id",
        "n_chars",
        F.round("__priority", 6).alias("priority"),
    )


@register(
    "corpus_weighted_sample_per_lang",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             pow((('0x' || substr(md5('ws1' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT) / 4294967296.0,
                 1.0 / greatest(CAST(n_chars AS DOUBLE), 1e-12)) AS pri
      FROM documents
    )
    SELECT doc_id, lang, n_chars, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY lang ORDER BY pri DESC, doc_id
             ) AS rn
      FROM keyed
    )
    WHERE rn <= 25
    ORDER BY lang, sample_rank
    """,
    tags=("pipeline", "sampling", "new-surface"),
    priority=18,
    doc="Per-group weighted sampling without replacement: exactly 25 docs "
    "PER LANGUAGE, probability proportional to length within the group — "
    "the same Efraimidis-Spirakis priority as corpus_weighted_sample "
    "(identical key function, so the two draws agree row-for-row) capped "
    "by a per-group rank window instead of a global top-k. Completes the "
    "sampling family: exact-k uniform per group "
    "(corpus_lang_sample_exact), budgeted uniform across groups "
    "(corpus_unimax_sample), weighted global (corpus_weighted_sample), "
    "weighted per group (this) "
    "(operators/corpusprep.py::weighted_sample_per_group).",
)
def corpus_weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import weighted_sample_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_per_group(docs, "lang", "n_chars", 25).orderBy(
        "lang", "sample_rank"
    )


_DSIR_NORM = _NORM.format(c="text")

_DSIR_FEATS = """
  SELECT {id_sel} (('0x' || substr(md5(f), 1, 8))::BIGINT % 1024) AS b
  FROM (
    SELECT doc_id, unnest(list_concat(
      string_split(nt, ' '),
      list_transform(range(1, len(string_split(nt, ' '))),
        i -> string_split(nt, ' ')[i] || ' ' || string_split(nt, ' ')[i + 1])
    )) AS f
    FROM {src}
  )
  WHERE length(f) > 0
"""


@register(
    "corpus_dsir_scores",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, {_DSIR_NORM} AS nt FROM documents WHERE doc_id % 10 != 0
    ),
    tgt AS (
      SELECT doc_id, {_DSIR_NORM} AS nt FROM documents WHERE doc_id % 10 = 0
    ),
    cf AS ({_DSIR_FEATS.format(id_sel="doc_id,", src="corpus")}),
    tf AS ({_DSIR_FEATS.format(id_sel="", src="tgt")}),
    sb AS (SELECT b, count(*) AS c FROM cf GROUP BY b),
    tb AS (SELECT b, count(*) AS c FROM tf GROUP BY b),
    stot AS (SELECT count(*) AS t FROM cf),
    ttot AS (SELECT count(*) AS t FROM tf),
    buckets AS (SELECT unnest(range(0, 1024)) AS b),
    logs AS (
      SELECT buckets.b,
             ln((COALESCE(tb.c, 0) + 1.0)
                / ((SELECT t FROM ttot) + 1024.0)) AS lp_t,
             ln((COALESCE(sb.c, 0) + 1.0)
                / ((SELECT t FROM stot) + 1024.0)) AS lp_s
      FROM buckets
      LEFT JOIN tb ON buckets.b = tb.b
      LEFT JOIN sb ON buckets.b = sb.b
    ),
    db AS (SELECT doc_id, b, count(*) AS c FROM cf GROUP BY doc_id, b)
    SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_feats,
           round(sum(db.c * (logs.lp_t - logs.lp_s)), 6) AS dsir_score
    FROM db JOIN logs ON db.b = logs.b
    GROUP BY db.doc_id
    ORDER BY db.doc_id
    """,
    tags=("pipeline", "selection", "dsir", "new-surface"),
    priority=18,
    doc="DSIR importance scores (Data Selection via Importance "
    "Resampling, Xie et al. 2023, arXiv:2302.03169 — "
    "operators/corpusprep.py::dsir_logratio_scores): every 10th doc "
    "plays the high-quality target set, the rest the raw corpus; each "
    "corpus doc scored by sum c_b * (ln p_target(b) - ln p_source(b)) "
    "over 1024 hashed unigram+bigram buckets with Laplace smoothing. "
    "One corpus explode, two 1024-row distribution aggregates broadcast "
    "back — the corpus never joins corpus-sized state. Compose with "
    "corpus_weighted_sample for the paper's importance-resampling draw.",
)
def corpus_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import dsir_logratio_scores

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    target = docs.filter(F.col("doc_id") % 10 == 0)
    return dsir_logratio_scores(corpus, target, n_buckets=1024).orderBy("doc_id")


@register(
    "doc_unigram_pieces",
    oracle=None,  # iterative Viterbi-EM is not SQL-expressible; the
    # segmentation algebra is pinned by hand-case + determinism +
    # coverage tests (test_corpusprep.py::TestUnigramLM)
    tags=("pipeline", "tokenizer", "rows-only", "new-surface"),
    priority=52,
    doc="Unigram-LM tokenizer training (SentencePiece family, Kudo 2018 "
    "arXiv:1804.10959, Viterbi-EM variant): the corpus-scale work is ONE "
    "word-count aggregate; seeding, EM segmentation, and pruning run over "
    "the vocabulary-sized table, with single-character coverage guaranteed "
    "(operators/corpusprep.py::unigram_lm_pieces). Complements the BPE "
    "pair (doc_bpe_merges/doc_bpe_encoded) with the second production "
    "tokenizer family.",
)
def doc_unigram_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import unigram_lm_pieces

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_pieces(docs, vocab_size=120)


@register(
    "doc_unigram_encoded",
    oracle=None,  # encoder inherits the trainer's rows-only status; unit
    # anchors: max-probability segmentation + <unk> convention pinned in
    # TestUnigramLM
    tags=("pipeline", "tokenizer", "rows-only", "new-surface"),
    priority=52,
    doc="Per-doc unit counts under the trained unigram-LM pieces: "
    "JVM-side normalize/split, Arrow-batched Viterbi memoized per "
    "distinct word (operators/corpusprep.py::unigram_encode_counts).",
)
def doc_unigram_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import (
        unigram_encode_counts,
        unigram_lm_pieces,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = [
        (r["piece"], r["logprob"])
        for r in unigram_lm_pieces(docs, vocab_size=120).collect()
    ]
    return unigram_encode_counts(docs, table).orderBy("doc_id")


@register(
    "corpus_quality_calibrated_by_lang",
    oracle="""
    SELECT doc_id, lang, n_chars, pct_rank FROM (
      SELECT doc_id, lang, n_chars,
             round(percent_rank() OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id
             ), 6) AS pct_rank
      FROM documents
    )
    WHERE pct_rank >= 0.6
    ORDER BY doc_id
    """,
    tags=("pipeline", "quality", "calibration", "new-surface"),
    priority=18,
    doc="PER-LANGUAGE percentile-calibrated quality filter "
    "(operators/corpusprep.py::keep_top_frac_per_group): keep the top "
    "40% of each language by length — where the global calibration "
    "(corpus_quality_calibrated) applies one threshold and silently "
    "strangles languages whose signal distribution sits lower, the "
    "per-group percentile keeps the same FRACTION everywhere (FineWeb's "
    "per-language thresholds). percent_rank over a total (score, id) "
    "order, rounded to 6 before the cut — keep decisions engine-exact.",
)
def corpus_quality_calibrated_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.corpusprep import keep_top_frac_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return keep_top_frac_per_group(docs, "lang", "n_chars", keep_frac=0.4).orderBy(
        "doc_id"
    )


_SQL_EVALSET = f"""
    toks AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS t
      FROM documents
    ),
    ev AS (
      SELECT doc_id AS eval_id, array_to_string(t[5:24], ' ') AS etext
      FROM toks WHERE doc_id % 53 = 0
      UNION ALL
      SELECT doc_id, array_to_string(list_reverse(t), ' ')
      FROM toks WHERE doc_id % 53 = 1
    ),
    etoks AS (SELECT eval_id, string_split(etext, ' ') AS t FROM ev),
    ewins AS (
      SELECT eval_id,
             unnest([array_to_string(t[i:i+9], ' ')
                     for i in range(1, greatest(len(t) - 8, 1))]) AS w
      FROM etoks WHERE len(t) >= 10
    ),
    twins AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(t[i:i+9], ' ')
                     for i in range(1, greatest(len(t) - 8, 1))]) AS w
      FROM toks WHERE len(t) >= 10
    )
"""


def _evalset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic eval set with KNOWN contamination structure: every 53rd
    doc contributes a 20-token verbatim excerpt (contaminated by
    construction) and every 53rd+1 doc its tokens REVERSED (clean —
    whatever the mechanical ground truth says, the oracle recomputes it
    the same way)."""
    from pspcz_analyzer_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(normalize_text("text"), " ")
    excerpt = docs.filter(F.col("doc_id") % 53 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(toks, 5, 20), " ").alias("text"),
    )
    clean = docs.filter(F.col("doc_id") % 53 == 1).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.reverse(toks), " ").alias("text"),
    )
    return excerpt.unionByName(clean)


@register(
    "eval_contamination_stats",
    oracle=f"""
    WITH {_SQL_EVALSET},
    per AS (SELECT eval_id, count(*) AS n_windows FROM ewins GROUP BY eval_id),
    hit AS (
      SELECT eval_id, count(*) AS n_contaminated
      FROM ewins WHERE w IN (SELECT w FROM twins)
      GROUP BY eval_id
    )
    SELECT p.eval_id, p.n_windows,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           round(COALESCE(h.n_contaminated, 0) / p.n_windows, 6)
             AS contaminated_frac
    FROM per p LEFT JOIN hit h USING (eval_id)
    ORDER BY p.eval_id
    """,
    tags=("pipeline", "decontamination", "exact-substr", "new-surface"),
    priority=18,
    doc="Eval-set contamination audit — GPT-3's exact n-gram overlap "
    "check (Brown et al. 2020 app. C): per eval doc, the fraction of "
    "its 10-token sliding windows found verbatim anywhere in the "
    "training corpus. Planted excerpts must read fully contaminated and "
    "reversed-token controls clean; the oracle recomputes the window "
    "overlap over STRINGS (proving the hash path loses nothing). Plan: "
    "eval window hashes broadcast, train scanned once, survivors "
    "eval-sized (operators/dedup.py::contamination_stats).",
)
def eval_contamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import contamination_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = _evalset(spark, sf_dir)
    return contamination_stats(docs, ev, window=10).orderBy("eval_id")


@register(
    "corpus_decontaminate_substr",
    oracle=f"""
    WITH {_SQL_EVALSET},
    bad AS (
      SELECT DISTINCT t.doc_id
      FROM twins t WHERE t.w IN (SELECT w FROM ewins)
    )
    SELECT d.doc_id
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)
    ORDER BY d.doc_id
    """,
    tags=("pipeline", "decontamination", "exact-substr", "new-surface"),
    priority=18,
    doc="Train-side exact-substring decontamination (operators/dedup.py::"
    "decontaminate_exact_substr): drop every training doc sharing ANY "
    "10-token span with the eval set — the removal the GPT-3/PaLM "
    "pipelines apply after the audit; the fuzzier n-gram Jaccard "
    "decontaminate (corpus_decontaminate) and the embedding twin "
    "(corpus_embedding_decontaminate) complete the three-tier "
    "decontamination story. Sub-window train docs survive by "
    "construction (no spans to match).",
)
def corpus_decontaminate_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import decontaminate_exact_substr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = _evalset(spark, sf_dir)
    return (
        decontaminate_exact_substr(docs, ev, window=10)
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "doc_term_pmi",
    oracle=f"""
    WITH terms AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split({_NORM.format(c="text")}, ' ')) AS term
        FROM documents
      ) WHERE length(term) >= 3
    ),
    nn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    dfq AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
    banded AS (
      SELECT term, df FROM dfq, nn
      WHERE df >= 3 AND df <= CAST(floor(0.9 * n_docs) AS BIGINT)
    ),
    capped AS (
      SELECT doc_id, term FROM (
        SELECT t.doc_id, t.term,
               row_number() OVER (
                 PARTITION BY t.doc_id ORDER BY b.df ASC, t.term ASC
               ) AS rk
        FROM terms t JOIN banded b USING (term)
      ) WHERE rk <= 40
    ),
    cnt AS (SELECT term, count(*) AS n FROM capped GROUP BY term),
    pairs AS (
      SELECT x.term AS term_a, y.term AS term_b, count(*) AS n_ab
      FROM capped x JOIN capped y ON x.doc_id = y.doc_id AND x.term < y.term
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT term_a, term_b, ca.n AS n_a, cb.n AS n_b, n_ab,
           round(ln(n_ab * (SELECT n_docs FROM nn) * 1.0 / (ca.n * cb.n)), 6)
             AS pmi
    FROM pairs
    JOIN cnt ca ON ca.term = term_a
    JOIN cnt cb ON cb.term = term_b
    ORDER BY pmi DESC, term_a, term_b
    LIMIT 50
    """,
    tags=("pipeline", "pmi", "collocation", "text-analysis", "new-surface"),
    priority=18,
    doc="Top-50 term pairs by document-cooccurrence PMI (Church & Hanks "
    "1990 collocations; operators/textual.py::term_pmi_pairs): DF-banded "
    "(stopwords out = no hot join keys, hapaxes out = no noise) and "
    "per-doc capped at the 40 rarest terms, so pair fanout is bounded by "
    "docs x cap^2/2 regardless of document length. All counts computed "
    "over the same capped set — the caps define the sample space. "
    "Ranking uses the rounded PMI so top-k membership is float-stable. "
    "The synthetic corpus draws from a ~30-term vocabulary where every "
    "term sits near df 0.75N, so the query widens the stopword ceiling "
    "to 0.9 (the operator default 0.4 fits natural Zipfian text).",
)
def doc_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.textual import term_pmi_pairs

    return term_pmi_pairs(
        load_table(spark, sf_dir, "documents"), max_df_frac=0.9
    )


@register(
    "doc_inverted_postings",
    oracle=f"""
    WITH terms AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split({_NORM.format(c="text")}, ' ')) AS term
        FROM documents
      ) WHERE length(term) >= 3
    ),
    dfq AS (
      SELECT term, count(*) AS df FROM terms GROUP BY term HAVING count(*) >= 2
    ),
    ranked AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM terms
    ),
    post AS (
      SELECT term,
             array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      FROM ranked WHERE rn <= 20 GROUP BY term
    )
    SELECT d.term, d.df, p.postings
    FROM dfq d JOIN post p USING (term)
    ORDER BY d.term
    """,
    tags=("pipeline", "retrieval", "inverted-index", "new-surface"),
    priority=18,
    doc="Inverted-index postings construction (operators/ranking.py::"
    "inverted_index): term -> (df, first-20 doc ids ascending), the "
    "classic MapReduce retrieval-index build. Per-term aggregation state "
    "is BOUNDED: a row_number window truncates each posting list to the "
    "cap before the list aggregate, so stopword-hot terms cannot blow a "
    "group buffer; df rides the same term-keyed exchange. Query-edge "
    "convention (plans/ingest.py JSON roundtrip): the array<bigint> "
    "postings flatten to a CSV string on BOTH sides — the driver's "
    "pandas hash canonicalizer cannot sort list cells.",
)
def doc_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ranking import inverted_index

    return (
        inverted_index(load_table(spark, sf_dir, "documents"))
        .withColumn(
            "postings",
            F.array_join(F.col("postings").cast("array<string>"), ","),
        )
        .orderBy("term")
    )


@register(
    "corpus_ppl_buckets",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM.format(c="text")}, ' ')) AS w
      FROM documents
    ),
    dw AS (SELECT doc_id, w FROM words WHERE w != ''),
    wc AS (SELECT w AS word, count(*) AS n FROM dw GROUP BY w),
    tot AS (SELECT sum(n) AS t, count(*) AS v FROM wc),
    scores AS (
      SELECT dw.doc_id,
             round(avg(-ln((COALESCE(wc.n, 0) + 0.5)
                           / (tot.t + 0.5 * (tot.v + 1)))), 6) AS avg_neg_logp
      FROM dw LEFT JOIN wc ON dw.w = wc.word, tot
      GROUP BY dw.doc_id
    )
    SELECT s.doc_id, d.lang, s.avg_neg_logp,
           CASE ntile(3) OVER (PARTITION BY d.lang
                               ORDER BY s.avg_neg_logp, s.doc_id)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scores s JOIN documents d USING (doc_id)
    ORDER BY s.doc_id
    """,
    tags=("pipeline", "quality", "lm", "ccnet", "new-surface"),
    priority=18,
    doc="CCNet's head/middle/tail perplexity bucketing (Wenzek et al. "
    "2020), per language: the self-trained unigram LM scores each doc, "
    "then per-lang tertiles assign the bucket — the mixture knob CCNet "
    "pipelines feed downstream (train on head+middle, drop tail). One "
    "lang-partitioned ntile window over the doc-sized score frame; ties "
    "break on (score, doc_id) so bucket membership is deterministic "
    "across engines and partitionings.",
)
def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pspcz_analyzer_spark.operators.corpusprep import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_logprob_scores(docs.select("doc_id", "text"))
    w = Window.partitionBy("lang").orderBy("avg_neg_logp", "doc_id")
    return (
        scores.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "avg_neg_logp",
            F.when(F.ntile(3).over(w) == 1, "head")
            .when(F.ntile(3).over(w) == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_ngram_diversity",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM.format(c="text")}, ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')
             )) AS g
      FROM norm
    )
    SELECT d.source,
           count(*) AS n_ngrams,
           count(DISTINCT g) AS n_distinct_ngrams,
           round(count(DISTINCT g) / count(*), 6) AS ttr
    FROM sh JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("pipeline", "quality", "diversity", "new-surface"),
    priority=18,
    doc="Corpus-level n-gram diversity per source (trigram type-token "
    "ratio): the cross-document complement of doc_repetition_stats — a "
    "source whose TTR collapses is templated/duplicated content even "
    "when each individual doc looks clean, the standard diversity "
    "monitor for synthetic-data and scraped-source intake. One shingle "
    "explode + one source-keyed distinct aggregate.",
)
def corpus_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import _shingle_arrays
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_arrays(docs, "doc_id", "text", 3, distinct=False)
    grams = explode_notnull(sh, F.col("__sh"), "g", keep=("doc_id",))
    return (
        grams.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count_distinct("g").alias("n_distinct_ngrams"),
            F.round(F.count_distinct("g") / F.count(F.lit(1)), 6).alias("ttr"),
        )
        .orderBy("source")
    )
