"""Streaming corpus ingestion: a landing directory of document files feeds
the incremental corpus builder one micro-batch at a time.

``foreachBatch`` + checkpointing gives at-least-once delivery of each
micro-batch to ``extend_training_corpus``; because the extension is
idempotent by content fingerprint (a replayed batch finds its fingerprints
already present and appends nothing), the corpus converges to
effectively-once — the same argument the reference's resumable enrichment
makes for its key-based skip (``services/llm/cache.py:23-61``).

Scale notes: the file source lists only NEW files per batch (checkpointed
log), each batch dedups against the corpus via the column-pruned
fingerprint scan (pipeline.py), and state lives entirely in the checkpoint
+ corpus — the stream itself is stateless, so a 100 TB backlog drains in
bounded availableNow batches at whatever parallelism the cluster has.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pspcz_analyzer_spark.pipeline import extend_training_corpus

DOC_SCHEMA = "doc_id long, text string"


def stream_extend_corpus(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = DOC_SCHEMA,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    shards: int = 8,
    near_dup_index: str | None = None,
) -> list[dict]:
    """Drain all unprocessed landing files into the corpus; one
    ``extend_training_corpus`` call per micro-batch.

    Bounded run (``availableNow``) so callers get the manifests back; a
    production deployment starts the same query with a continuous trigger
    and ships manifests to its metrics sink instead. Returns one manifest
    per non-empty micro-batch, tagged with ``batch_id``.

    ``near_dup_index`` routes every batch through the MinHash sidecar
    (pipeline.build_minhash_index): docs near-duplicating ANY earlier
    batch or the base corpus are dropped, and survivors' signatures keep
    the index current — streaming near-dedup with per-batch cost
    proportional to the batch, never to history.
    """
    manifests: list[dict] = []

    def on_batch(batch_df, batch_id: int) -> None:
        m = extend_training_corpus(
            spark,
            batch_df,
            out_dir,
            min_quality=min_quality,
            keep_langs=keep_langs,
            shards=shards,
            near_dup_index=near_dup_index,
        )
        m["batch_id"] = int(batch_id)
        manifests.append(m)

    q = (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return manifests
