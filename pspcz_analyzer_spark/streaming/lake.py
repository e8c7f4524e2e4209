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
table history. Concurrent maintenance interleaves safely: compact/delete
commits serialize on the version counter and a losing writer re-plans
against the new version (CommitConflict); vacuum is safe against
in-flight writers only through its ``min_age_seconds`` retention guard
(staged-but-uncommitted files younger than the window are never
collected) — run it with the default window, not 0, when writers may be
live.
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

    A ``CommitConflict`` (another writer took the version) is absorbed
    inside ``manifest.append(max_commit_retries=...)``: the batch's data
    files are staged ONCE and each retry re-publishes metadata against
    the re-read manifest — no Spark re-execution, no duplicate staged
    files under contention.
    """
    results: "list[tuple[int, int]]" = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        v = M.append(
            batch_df,
            table_dir,
            txn=(app_id, int(batch_id)),
            max_commit_retries=max_commit_retries,
        )
        results.append((int(batch_id), v))

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


def stream_upsert_manifest(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    key_col: str,
    app_id: str = "stream_upsert",
    max_commit_retries: int = 5,
) -> "list[tuple[int, int]]":
    """Streaming CDC ingestion: drain landing files into the manifest
    table as exactly-once UPSERTS — each micro-batch's rows win over
    existing rows with the same key, one committed version per batch.
    The txn watermark makes at-least-once replays no-ops exactly as in
    :func:`stream_append_manifest`.

    Unlike the append sink, a ``CommitConflict`` here re-invokes the
    WHOLE upsert (victim files depend on the manifest version planned
    against, so a metadata-only retry would be wrong); the txn watermark
    keeps the retry safe, at the cost of restaging the batch — the
    documented write amplification under contention. Batches must arrive
    in change order (the file source's listing order); keys within one
    batch should be unique, last-writer-wins is NOT resolved inside a
    batch.

    Returns [(batch_id, committed_version)] for this run.
    """
    results: "list[tuple[int, int]]" = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        for attempt in range(max_commit_retries):
            try:
                v = M.upsert(
                    batch_df.sparkSession, batch_df, table_dir, key_col,
                    txn=(app_id, int(batch_id)),
                )
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


def stream_materialized_aggregate(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    mv_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    key_col: str,
    value_col: str,
    app_id: str = "stream_append",
    max_commit_retries: int = 5,
) -> "list[tuple[int, int, int]]":
    """Streaming MATERIALIZED VIEW: drain landing files into the base
    manifest table (exactly-once appends, as :func:`stream_append_
    manifest`) and after each committed batch advance the per-key
    (sum, count) aggregate table via :func:`manifest.refresh_aggregate`
    — a continuously-maintained rollup with end-to-end exactly-once and
    ZERO side state beyond the two tables themselves.

    Crash anatomy (each arrow is a separately-durable step): landing ->
    [txn append] base -> [MV txn watermark] mv. A replayed micro-batch
    no-ops at the base (append watermark); a crash between base commit
    and MV refresh is healed by the NEXT refresh reading the CDF delta
    from the MV's own refreshed-through watermark — the two watermarks
    never disagree for long, and neither can double-count. Per-batch
    cost: batch write + commit + delta-sized refresh; the base table's
    history and the MV's unaffected keys are never rescanned.

    Returns [(batch_id, base_version, mv_version)] for this run.
    """
    results: "list[tuple[int, int, int]]" = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        v = M.append(
            batch_df,
            table_dir,
            txn=(app_id, int(batch_id)),
            max_commit_retries=max_commit_retries,
        )
        mv_v = M.refresh_aggregate(
            batch_df.sparkSession, table_dir, mv_dir, key_col, value_col,
            to_version=v,
        )
        results.append((int(batch_id), v, mv_v))

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


def stream_cdc_apply_with_mv(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    mv_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    key_col: str,
    mv_key_col: str,
    value_col: str,
    op_col: str = "op",
    seq_col: "str | None" = None,
    app_id: str = "stream_cdc",
) -> "list[tuple[int, int, int]]":
    """Streaming CDC APPLY with a continuously-maintained rollup — the
    full change-data pipeline as one exactly-once loop: landing batches
    carry upserts and tombstones (``op_col`` = 'I'/'U' upsert, 'D'
    delete), each micro-batch lands as ONE :func:`manifest.merge_into`
    commit (tombstoned keys delete, matched keys update, fresh non-
    tombstone keys insert — ``not_matched_condition`` keeps a delete
    for an absent key a no-op), and :func:`manifest.refresh_aggregate_
    cdf` folds the commit's row-level change feed into the per-key
    (sum, cnt, n_rows) MV.

    Exactly-once anatomy: the MERGE rides ``txn=(app_id, batch_id)``
    (a replayed micro-batch no-ops at the table), the refresh rides its
    own refreshed-through watermark (a crash between MERGE and refresh
    heals at the NEXT refresh, which reads the CDF delta from the last
    committed watermark). Neither step can double-apply; no side state
    beyond the two tables. Per-batch cost: |batch| for the MERGE's
    victim rewrite + |delta| for the refresh — table history and
    unaffected MV keys are never rescanned. The base table must have
    CDF enabled (the MERGE records pre/postimages the refresh needs).

    A real CDC feed carries several ops per key (insert then update in
    one wave, or one availableNow drain sweeping many landing files):
    ``seq_col`` names the feed's ordering column and each micro-batch
    COMPACTS to the latest op per key before the MERGE — the standard
    CDC-apply move (Delta's dedup-before-merge pattern). Without it, a
    multi-op key raises MERGE's ambiguity error rather than guessing an
    order (replays reproduce the same batch, so the failure is loud and
    deterministic, never corrupting).

    Returns [(batch_id, table_version, mv_version)] for this run."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    results: "list[tuple[int, int, int]]" = []
    data_cols: "list[str] | None" = None

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal data_cols
        if data_cols is None:
            data_cols = [
                c for c in batch_df.columns if c not in (op_col, seq_col)
            ]
        if seq_col is not None:
            w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", seq_col)
            )
        M.merge_into(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            key_col,
            when_matched_delete=f"s.{op_col} = 'D'",
            when_matched_update={
                c: f"s.{c}" for c in data_cols if c != key_col
            },
            when_not_matched_insert=True,
            not_matched_condition=f"s.{op_col} != 'D'",
            txn=(app_id, int(batch_id)),
        )
        v = M.current_version(table_dir)
        mv_v = M.refresh_aggregate_cdf(
            batch_df.sparkSession, table_dir, mv_dir, mv_key_col,
            value_col, to_version=v,
        )
        results.append((int(batch_id), v, mv_v))

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
