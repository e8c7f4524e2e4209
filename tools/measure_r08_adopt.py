"""1x vs 10x behavior of the round-8 adoption ops: convert_to_manifest
(hive adoption is metadata-only — renames + one commit — so wall time
tracks FILE COUNT, never data volume) and import_snapshot's two modes
(copy pays byte IO, reference mode is metadata-only at any size).

Prints one JSON line per (op, scale) for SCALING.md.
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


def main() -> int:
    from pspcz_analyzer_spark import manifest as M

    spark = get_spark(shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="adopt_scale_")
    try:
        for label, n_rows, parts in (("1x", 200_000, 8), ("10x", 2_000_000, 80)):
            src = os.path.join(root, f"hive_{label}")
            spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id") % 16).alias("day"),
            ).repartition(parts // 8).write.partitionBy("day").parquet(src)
            t0 = time.time()
            M.convert_to_manifest(src)
            t_conv = time.time() - t0
            m = M.read_manifest(src)
            t0 = time.time()
            n = M.load_manifest_table(spark, src).count()
            t_read = time.time() - t0
            assert n == n_rows
            print(json.dumps({
                "op": "convert_to_manifest", "scale": label,
                "files": len(m["files"]),
                "convert_s": round(t_conv, 3),
                "first_read_s": round(t_read, 2),
            }), flush=True)

            flat = os.path.join(root, f"flat_{label}")
            spark.range(n_rows).select(F.col("id").alias("k")).repartition(
                parts
            ).write.parquet(flat)
            for mode, copy in (("copy", True), ("reference", False)):
                dst = os.path.join(root, f"imp_{mode}_{label}")
                t0 = time.time()
                M.import_snapshot(flat, dst, copy=copy)
                t_imp = time.time() - t0
                assert M.load_manifest_table(spark, dst).count() == n_rows
                print(json.dumps({
                    "op": f"import_snapshot[{mode}]", "scale": label,
                    "files": parts, "import_s": round(t_imp, 3),
                }), flush=True)
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
