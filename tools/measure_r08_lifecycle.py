"""Composed lakehouse lifecycle at CDC scale (round-8 ask): a standing
table with liquid clustering + bloom + CDF properties takes a week of
simulated daily ingest waves, each wave running the production loop

    stage (WAP) -> audit the staged batch -> publish -> maintain()

where maintain() carries the standing policies (incremental clustering
of the wave's arrivals, bloom backfill, small-file compaction, vacuum
behind a 3-version retention). Claims measured:

- per-wave wall time is FLAT while the table grows 7x (cost tracks
  ingest, not table size — the liquid-clustering contract composed with
  WAP and vacuum);
- manifest metadata stays BOUNDED: the version-blob size tracks the
  live file count (compaction + vacuum keep it flat), not ingest
  history.

Prints one JSON line per wave for SCALING.md.

Usage: python tools/measure_r08_lifecycle.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pspcz_analyzer_spark.session import get_spark  # noqa: E402

WAVE_ROWS = 200_000


def main() -> int:
    import shutil
    import tempfile

    from pspcz_analyzer_spark import manifest as M

    spark = get_spark(shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="lifecycle_r08_")
    path = os.path.join(root, "events")
    try:
        spark.range(2 * WAVE_ROWS).select(
            F.col("id").alias("event_id"),
            ((F.col("id") * 7919) % 100_000).alias("user_id"),
            (F.col("id") % 7).alias("day"),
        ).repartition(8).write.parquet(path)
        M.manifest_init(path, stat_cols=["user_id"])
        M.optimize_clustered(spark, path, ["user_id"], num_partitions=8)
        M.ensure_blooms(spark, path, "event_id")
        M.enable_cdf(path)
        base = 10_000_000
        for day in range(7):
            lo = base + day * WAVE_ROWS
            wave = spark.range(lo, lo + WAVE_ROWS).select(
                F.col("id").alias("event_id"),
                ((F.col("id") * 104729) % 100_000).alias("user_id"),
                F.lit(day).cast("bigint").alias("day"),
            ).repartition(4)
            ref = f"day{day}"
            t0 = time.time()
            before = M.load_manifest_table(spark, path).count()
            M.stage_append(wave, path, ref)
            # audit: table + staged batch (the would-be post-publish view),
            # still invisible to ordinary readers
            staged_n = M.load_staged(spark, path, ref).count()
            assert staged_n == before + WAVE_ROWS
            M.publish_staged(spark, path, ref)
            t_ingest = time.time() - t0
            t0 = time.time()
            res = M.maintain(
                spark,
                path,
                target_bytes=8 * 1024 * 1024,
                max_small_files=24,
                retain_versions=3,
                vacuum_min_age_seconds=0.0,
            )
            t_maintain = time.time() - t0
            m = M.read_manifest(path)
            fs, rel = M.get_fs(path)
            blob = os.path.join(
                M._manifest_dir(rel), f"{m['version']:08d}.json"
            )
            total = M.load_manifest_table(spark, path).count()
            print(json.dumps({
                "wave": day,
                "ingest_s": round(t_ingest, 2),
                "maintain_s": round(t_maintain, 2),
                "policy": {k: v for k, v in res.items() if v},
                "live_files": len(m["files"]),
                "manifest_kb": round(fs.size(blob) / 1024, 1),
                "versions_retained": len(M._versions(path)),
                "rows": total,
            }), flush=True)
            assert total == 2 * WAVE_ROWS + (day + 1) * WAVE_ROWS
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
