"""Freshness semantics (SURVEY T1/T2): Spark re-reads Parquet snapshots per
query, so a rewritten table + serving-cache invalidation IS the reference's
file-watcher reload — no poller needed."""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.serving.cache import TTLCache
from pspcz_analyzer_spark.sources.sinks import overwrite_parquet


def test_snapshot_reread_after_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    overwrite_parquet(spark.range(5).withColumn("v", F.lit("old")), path)
    assert spark.read.parquet(path).count() == 5
    overwrite_parquet(spark.range(9).withColumn("v", F.lit("new")), path)
    # A fresh scan sees the new snapshot immediately — no refresh step.
    got = spark.read.parquet(path)
    assert got.count() == 9
    assert {r["v"] for r in got.collect()} == {"new"}


def test_refresh_is_cache_invalidation(spark, tmp_path):
    """The reference's watcher maps file changes to cache drops
    (data_reader.py:388-508); here that's invalidate_prefix + re-scan."""
    path = str(tmp_path / "t2")
    cache = TTLCache(ttl_seconds=3600)
    overwrite_parquet(spark.range(3), path)
    n1 = cache.get_or_compute("counts:t2", lambda: spark.read.parquet(path).count())
    overwrite_parquet(spark.range(7), path)
    # Stale until invalidated (by the refresh hook), fresh after.
    assert cache.get_or_compute("counts:t2", lambda: 0) == n1 == 3
    cache.invalidate_prefix("counts:")
    assert cache.get_or_compute("counts:t2", lambda: spark.read.parquet(path).count()) == 7
