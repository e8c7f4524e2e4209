"""Streaming incremental-aggregate maintenance: a landing directory of fact
files keeps a per-key additive summary fresh, one micro-batch at a time.

``foreachBatch`` + checkpointing delivers each micro-batch at-least-once;
``merge_incremental_agg`` commits an applied-batch marker atomically WITH
the merged summary (jobs.py), so a replayed batch is detected and skipped
— the summary converges to exactly-once without a transaction log. This is
the streaming face of the same merge the batch job exposes: per batch the
plan scans only that batch's files plus the key-cardinality-sized summary,
never the history, which is what keeps a 100 TB backlog's maintenance cost
proportional to the delta.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pspcz_analyzer_spark.jobs import has_applied_marker, merge_incremental_agg


def stream_incremental_agg(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    summary_path: str,
    checkpoint_dir: str,
    keys: list[str],
    sum_cols: list[str],
) -> int:
    """Drain all unprocessed landing files into the summary; returns the
    number of micro-batches applied (replays excluded). Bounded run via
    ``availableNow`` — a production deployment runs the same query on a
    continuous trigger."""
    applied = 0

    def on_batch(batch_df, batch_id: int) -> None:
        nonlocal applied
        marker = f"batch_{batch_id}"
        if has_applied_marker(summary_path, marker):
            return  # at-least-once replay; the merge already committed
        merge_incremental_agg(
            spark, summary_path, batch_df, keys, sum_cols, applied_marker=marker
        )
        applied += 1

    q = (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied
