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
import tempfile

from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.plans import register
from pspcz_analyzer_spark.plans.text import _NORM


def _scratch(sf_dir: str, name: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"pspcz_spark_{tag}_{name}")


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
