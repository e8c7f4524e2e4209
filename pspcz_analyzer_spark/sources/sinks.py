"""Parquet write paths (SURVEY S4/S10/S12, T4).

The reference writes Parquet caches everywhere and resumes incremental
work by re-reading + merging
(/root/reference/pspcz_analyzer/data/cache.py:18-43,
services/tisk/classifier.py:37-111, services/amendments/cache_manager.py:94-165).
Spark equivalents:

* overwrite_parquet — ``mode("overwrite")`` replaces S3/S4's
  write-then-invalidate (a fresh snapshot IS the invalidation; readers of
  the old file set are unaffected mid-query);
* partitioned writes — ``partitionBy`` gives partition-pruned scans, the
  per-period directory layout of the reference (one dir per electoral
  period) generalized;
* upsert_parquet — key-based merge for incremental/resumable sinks: keep
  existing rows whose keys are absent from the new batch, union the batch,
  rewrite atomically (stage to a sibling dir, then swap) — plain-Parquet
  stand-in for a Delta MERGE;
* resume_anti_join — T4's "skip already-done items": the work-remaining
  set as a left_anti join against the done table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def overwrite_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_files: int | None = None,
) -> None:
    """Overwrite-mode Parquet write.

    ``max_files`` coalesces the output — the small-files guard: a
    many-partition plan writing a small result otherwise lands hundreds of
    tiny files whose per-file open/footer cost dominates later scans.
    Coalesce (not repartition) avoids an extra shuffle.
    """
    if max_files is not None:
        df = df.coalesce(max_files)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(spark, path: str, max_files: int = 1) -> int:
    """Rewrite an existing dataset into at most ``max_files`` files per
    directory (post-hoc compaction for incrementally-appended outputs).
    Returns the resulting file count."""
    import glob

    df = spark.read.parquet(path)
    stage = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(max_files).write.mode("overwrite").parquet(stage)
    _swap_in(stage, path)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def _swap_in(stage: str, path: str) -> None:
    """Replace ``path`` with ``stage`` crash-recoverably: the old snapshot
    is renamed aside before the stage moves in, so no point of failure
    loses data — a crash between the renames leaves both copies on disk
    (the target is briefly absent, never partial). Local-FS semantics; on
    an object store use a manifest/table format instead."""
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(stage, path)
    shutil.rmtree(old, ignore_errors=True)


def upsert_parquet(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Merge ``new`` into the Parquet dataset at ``path`` by key: new rows
    win; existing rows with unmatched keys survive.

    Parquet cannot overwrite a path that feeds the writing plan, so the
    merged snapshot is staged next to the target and swapped in. The swap
    is crash-RECOVERABLE, not atomic: the old snapshot is renamed aside
    before the stage moves in (never deleted first), so every failure
    point leaves a complete copy on disk; readers can race only with a
    brief path-absent window, never see a mixed file set.
    """
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(new.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(new)
    else:
        merged = new
    stage = f"{path}.__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(stage)
    _swap_in(stage, path)


def resume_anti_join(todo: DataFrame, done: DataFrame, keys: list[str]) -> DataFrame:
    """Work remaining: todo rows whose keys are not yet in done (T4)."""
    return todo.join(done.select(*keys).distinct(), keys, "left_anti")
