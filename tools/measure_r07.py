"""Round-7 scale measurements.

1. extend_ivfpq_index per-batch cost as the persisted index grows 1x -> 10x
   (the flat-cost claim: frozen centroids/codebooks, so a batch pays one
   broadcast-encode pass regardless of index size).
2. merge_into large-source path (shuffle join) vs small-source path
   (broadcast) at matched work, sanity-checking the size-adaptive victim
   planner's crossover behavior.

Method matches tools/measure_r06*.py: warm session, best-of-two.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pspcz_analyzer_spark.session import get_spark  # noqa: E402


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main() -> None:
    import shutil
    import tempfile

    from pspcz_analyzer_spark import manifest as M
    from pspcz_analyzer_spark.jobs import write_range_sorted
    from pspcz_analyzer_spark.operators.ann import (
        build_ivfpq_index,
        extend_ivfpq_index,
    )

    spark = get_spark(app_name="measure_r07")
    work = tempfile.mkdtemp(prefix="measure_r07_")
    dim, cells = 32, 8

    def vecs(lo, n, tag):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.sin(F.col("id") * i * 0.7 + F.lit(hash(tag) % 97)),
            ).cast("array<float>").alias("embedding"),
        )

    print("== extend_ivfpq_index batch cost vs index size ==")
    for scale, base_n in (("1x", 20_000), ("10x", 200_000)):
        idx = os.path.join(work, f"ivfpq_{scale}")
        build_ivfpq_index(
            spark, vecs(0, base_n, "base"), idx,
            n_centroids=cells, m_sub=8, k_codes=16, train_fraction=0.2,
        )
        batch = vecs(10_000_000, 5_000, "batch").localCheckpoint()
        dt = best2(lambda: extend_ivfpq_index(spark, batch, idx))
        n_now = spark.read.parquet(os.path.join(idx, "codes")).count()
        print(f"extend_ivfpq 5k batch @ index {scale} ({base_n}): "
              f"{dt:.2f}s (codes now {n_now})")

    print("== merge_into source-size paths ==")
    for scale, n in (("1x", 100_000), ("10x", 1_000_000)):
        tbl = os.path.join(work, f"mrg_{scale}")
        shutil.rmtree(tbl, ignore_errors=True)
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 977).alias("v")
        )
        write_range_sorted(df, tbl, "k", num_partitions=16)
        M.manifest_init(tbl, stat_cols=["k"])
        # source >> DML_COLLECT_KEY_LIMIT -> large path (shuffle join)
        src = spark.range(0, n, 2).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        ).localCheckpoint()
        t0 = time.time()
        res = M.merge_into(
            spark, tbl, src, "k", when_matched_update={"v": "s.v"}
        )
        dt = time.time() - t0
        print(f"merge_into {scale} ({n} rows, {n // 2} source keys, "
              f"large path): {dt:.2f}s updated={res['updated']}")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()




def measure_cdf() -> None:
    """read_changes cost must track the CHANGES, not the table size."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from pspcz_analyzer_spark import manifest as M
    from pspcz_analyzer_spark.jobs import write_range_sorted
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(app_name="measure_r07_cdf")
    work = tempfile.mkdtemp(prefix="measure_cdf_")
    for scale, n in (("1x", 200_000), ("10x", 2_000_000)):
        tbl = os.path.join(work, f"cdf_{scale}")
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 991).alias("v")
        )
        write_range_sorted(df, tbl, "k", num_partitions=16)
        M.manifest_init(tbl, stat_cols=["k"])
        M.enable_cdf(tbl)
        v0 = M.current_version(tbl)
        t0 = time.time()
        M.delete_where(spark, tbl, "k % 1000 = 7")  # ~n/1000 matches
        dml = time.time() - t0
        t0 = time.time()
        cnt = M.read_changes(spark, tbl, v0).count()
        rd = time.time() - t0
        print(f"cdf {scale} (table {n}): delete_where {dml:.2f}s, "
              f"read_changes {rd:.2f}s over {cnt} change rows")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    import sys as _sys

    if "--cdf" in _sys.argv:
        measure_cdf()
    else:
        main()
