"""Streaming sink into a manifest-committed table — exactly-once appends.

``foreachBatch`` gives at-least-once delivery: a crash between the sink
write and the checkpoint advance replays the batch. The manifest layer's
txn protocol (``manifest.append(txn=(app_id, batch_id))``) absorbs that:
each manifest version carries per-app batch watermarks that commit
ATOMICALLY with the files they describe, so a replayed batch is detected
at commit time and skipped — the stream converges to exactly-once
without content-based idempotence (the fingerprint argument
``streaming/corpus.py`` uses) and without a transactional storage format.

Scale notes: the stream itself is stateless (file-source listing log +
the manifest are the only state); each batch's cost is one additive
parquet write plus one create-exclusive manifest commit, independent of
table history. Concurrent maintenance (compact/delete/vacuum) interleaves
safely: commits serialize on the version counter, and a losing writer
re-plans against the new version (CommitConflict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark import manifest as M


def stream_append_manifest(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    app_id: str = "stream_append",
    max_commit_retries: int = 5,
) -> "list[tuple[int, int]]":
    """Drain all unprocessed landing files into the manifest table with a
    bounded ``availableNow`` run; one idempotent ``manifest.append`` per
    micro-batch. Returns [(batch_id, committed_version)] for this run.

    A ``CommitConflict`` (another writer took the version) re-reads the
    manifest and retries the commit — the batch's data files are already
    staged additively, so the retry is metadata-only.
    """
    results: "list[tuple[int, int]]" = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        for attempt in range(max_commit_retries):
            try:
                v = M.append(batch_df, table_dir, txn=(app_id, int(batch_id)))
                results.append((int(batch_id), v))
                return
            except M.CommitConflict:
                if attempt == max_commit_retries - 1:
                    raise

    q = (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results
