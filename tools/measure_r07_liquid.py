"""Incremental-clustering scale claim, measured: the SAME appended wave
clusters in the same time whether the already-clustered table is 1x or
10x — cost tracks ingest, not table size."""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pspcz_analyzer_spark.session import get_spark  # noqa: E402


def main() -> None:
    import shutil
    import tempfile

    from pspcz_analyzer_spark import manifest as M

    spark = get_spark(shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="liquid_scale_")
    try:
        for label, n_rows, files in (("1x", 200_000, 8), ("10x", 2_000_000, 80)):
            path = os.path.join(root, f"t_{label}")
            spark.range(n_rows).select(
                F.col("id").alias("k"),
                ((F.col("id") * 7919) % 100_000).alias("v"),
            ).repartition(files).write.parquet(path)
            M.manifest_init(path, stat_cols=["v"])
            t0 = time.time()
            M.optimize_clustered(spark, path, ["v"], num_partitions=files)
            full_s = time.time() - t0
            # identical 20k-row wave on both tables
            M.append(
                spark.range(9_000_000, 9_020_000).select(
                    F.col("id").alias("k"),
                    ((F.col("id") * 7919) % 100_000).alias("v"),
                ).repartition(2),
                path,
            )
            t0 = time.time()
            n, w = M.optimize_clustered(spark, path, ["v"], num_partitions=2)
            inc_s = time.time() - t0
            d = M.clustering_depth(path, "v")
            print(
                f"{label}: rows={n_rows} full_pass={full_s:.2f}s "
                f"incremental_pass(20k wave)={inc_s:.2f}s "
                f"(clustered {n} files -> {w}) depth={d}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
