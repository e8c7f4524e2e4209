"""Checkpointed batch-enrichment stage (SURVEY X5 + T4).

The reference's LLM pipeline classifies each bill, saving after every item
and resuming by re-reading its Parquet cache and skipping finished work
(/root/reference/pspcz_analyzer/services/tisk/classifier.py:37-111,
services/llm/client.py:473-1058). Spark-first shape:

    todo = docs LEFT ANTI JOIN done ON key        (resume: skip finished)
    results = todo.mapInPandas(infer_batch)        (Arrow-batched inference)
    upsert_parquet(results)                        (atomic snapshot merge)

Inference runs where the data lives; the anti-join makes re-runs
idempotent and crash-safe at any batch boundary; the output is a joinable
enrichment table, never mutated rows. Rate limiting (the reference's 1
req/s politeness) is a per-batch delay hook inside the UDF.

The model call is a DETERMINISTIC STUB (topic = first normalized token,
summary = 100-char truncation — the reference's preview idiom,
law_service.py:97-98) so the stage is oracle-checkable; swap
``_fake_llm_classify`` for a real client in production. Prompt-injection
scrubbing (F16) and heading-aware truncation (F15) are applied on the way
into the "model" exactly like the reference's helpers
(services/llm/helpers.py:25-94).
"""

from __future__ import annotations

import re
import time
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.sources.sinks import resume_anti_join, upsert_parquet

ENRICH_SCHEMA = "doc_id long, topic string, summary string"

# F16: neutralize instruction-override phrasing before it reaches a model.
_INJECTION = re.compile(
    r"(ignore|disregard|forget)\s+(all\s+|any\s+)?(previous|prior|above)\s+instructions",
    re.IGNORECASE,
)
# F15: section headings worth preserving past a truncation cut.
_HEADING = re.compile(r"^(§\s*\d+\w*|Část\s+\w+|Hlava\s+\w+|Čl\.\s*\w+)", re.MULTILINE)


def scrub_injection(text: str, replacement: str = "[redacted]") -> str:
    return _INJECTION.sub(replacement, text)


def truncate_with_headings(text: str, max_chars: int = 4000) -> str:
    """Keep the first ``max_chars`` verbatim plus any section headings from
    the truncated tail, so the model still sees document structure."""
    if len(text) <= max_chars:
        return text
    head, tail = text[:max_chars], text[max_chars:]
    headings = _HEADING.findall(tail)
    if not headings:
        return head
    return head + "\n[…]\n" + "\n".join(headings)


def scrub_injection_col(col) -> "F.Column":
    r"""Column-expression twin of :func:`scrub_injection` (F16) — the same
    regex as a codegen'd regexp_replace, so the scrub runs at scan speed
    and is DuckDB-oracle-checkable (Java and RE2 agree on this pattern:
    ASCII \w/\s, no lookarounds). Parity with the Python form is asserted
    in test_enrich.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(?i)" + _INJECTION.pattern, "[redacted]")


def truncate_with_headings_col(col, max_chars: int = 4000) -> "F.Column":
    """Column-expression twin of :func:`truncate_with_headings` (F15):
    substring head + multiline heading harvest from the tail, all
    built-ins. Character-based slicing in Spark, DuckDB, and Python alike,
    so the three implementations agree byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring(c, 1, max_chars)
    tail = F.substring(c, max_chars + 1, 2_000_000_000)
    headings = F.regexp_extract_all(tail, F.lit("(?m)" + _HEADING.pattern), 1)
    return (
        F.when(F.length(c) <= max_chars, c)
        .when(F.size(headings) == 0, head)
        .otherwise(
            F.concat(head, F.lit("\n[…]\n"), F.array_join(headings, "\n"))
        )
    )


def _fake_llm_classify(text: str) -> tuple[str, str]:
    # DETERMINISTIC STUB for the model call; production swaps in an HTTP
    # client here (same signature: text -> (topic, summary)).
    toks = text.strip().split()
    topic = toks[0].lower() if toks else ""
    summary = text[:100] + "..." if len(text) > 100 else text
    return topic, summary


def infer_topics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_delay_s: float = 0.0,
) -> DataFrame:
    """Arrow-batched inference over documents (one output row per doc)."""
    import pandas as pd

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_delay_s:
                time.sleep(batch_delay_s)  # provider politeness, per batch
            topics, summaries = [], []
            for text in pdf["text"]:
                prepared = truncate_with_headings(scrub_injection(text or ""))
                topic, summary = _fake_llm_classify(prepared)
                topics.append(topic)
                summaries.append(summary)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "topic": topics, "summary": summaries}
            )

    return src.mapInPandas(run, schema=ENRICH_SCHEMA)


def enrich_incremental(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """One resumable enrichment pass: process only docs whose key is absent
    from the output table, merge results in. Returns rows newly enriched.

    Safe to re-run after any crash — finished work is never redone, partial
    output never corrupts the table (atomic snapshot swap in the sink).
    """
    import os

    import shutil
    import uuid

    if os.path.exists(out_path):
        done = spark.read.parquet(out_path)
        todo = resume_anti_join(docs, done, [id_col])
    else:
        todo = docs
    results = infer_topics(todo, id_col=id_col, text_col=text_col)
    # Stage the inference output FIRST, then count/merge from the staged
    # files: inference runs exactly once per pass. Counting the DataFrame
    # and then writing it would execute the model twice — double cost with
    # a real (paid, rate-limited) model, and the written rows could diverge
    # from the counted ones if the model is non-deterministic.
    stage = f"{out_path}.__infer_{uuid.uuid4().hex[:8]}"
    results.write.mode("overwrite").parquet(stage)
    try:
        staged = spark.read.parquet(stage)
        n_new = staged.count()
        if n_new:
            upsert_parquet(spark, staged, out_path, keys=[id_col])
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return n_new
