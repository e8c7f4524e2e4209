"""Two-level manifests: measure the COMMIT-IO claim — on a table with
many files, an append should write O(delta) manifest bytes (one small
segment + a pointer blob) instead of re-serializing every file's
metadata into the version blob.

Method: build a stats-tracked table at 1x/10x file counts, append one
small batch, and account every byte the commit wrote under _manifest/
(new version blob + new segment blobs). The flat baseline is simulated
by raising MANIFEST_SEGMENT_THRESHOLD above the file count.

Prints one JSON line per (mode, scale) for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pspcz_analyzer_spark.session import get_spark  # noqa: E402


def _mdir_state(path: str) -> "dict[str, int]":
    out = {}
    for sub, _dirs, names in os.walk(os.path.join(path, "_manifest")):
        for n in names:
            p = os.path.join(sub, n)
            out[p] = os.path.getsize(p)
    return out


def main() -> int:
    from pspcz_analyzer_spark import manifest as M

    spark = get_spark(shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="seg_scale_")
    try:
        scales = {
            "flat": (("1x", 200), ("10x", 2000)),
            # r9 ask: prove the reuse check's DRIVER CPU stays flat-ish
            # across another decade (the r8 shape re-canonicalized every
            # file record per commit — O(files) json.dumps).
            "segmented": (("1x", 200), ("10x", 2000), ("100x", 20000)),
        }
        for mode, pairs in scales.items():
            for label, files in pairs:
                M.MANIFEST_SEGMENT_THRESHOLD = (
                    10**9 if mode == "flat" else 64
                )
                path = os.path.join(root, f"t_{mode}_{label}")
                spark.range(files * 100).select(
                    F.col("id").alias("k"), (F.col("id") % 9).alias("g")
                ).repartition(files).write.parquet(path)
                M.manifest_init(path, stat_cols=["k"])
                before = _mdir_state(path)
                # Three appends; report the best (scheduler noise) of
                # wall AND driver process CPU — batch write cost is
                # constant across scales, so growth isolates the commit.
                walls, cpus = [], []
                for i in range(3):
                    t0, c0 = time.time(), time.process_time()
                    M.append(
                        spark.range(
                            10_000_000 + i * 100, 10_000_100 + i * 100
                        ).selectExpr("id AS k", "id % 9 AS g").coalesce(1),
                        path,
                    )
                    walls.append(time.time() - t0)
                    cpus.append(time.process_time() - c0)
                after = _mdir_state(path)
                new_bytes = sum(
                    sz for p, sz in after.items() if p not in before
                ) // 3  # per-append average of the three commits
                print(json.dumps({
                    "mode": mode, "scale": label, "files": files,
                    "append_s": round(min(walls), 3),
                    "append_driver_cpu_s": round(min(cpus), 3),
                    "commit_manifest_bytes": new_bytes,
                }), flush=True)
                n = M.load_manifest_table(spark, path).count()
                assert n == files * 100 + 300
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
