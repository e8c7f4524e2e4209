"""Round-7 DDL scale measurements: the metadata-only claims, measured.

widen_column_type / add_column(initial_default) / drop_column /
add_identity_column backfill on a 1x vs 10x table — every one should be
FLAT (cost = one manifest read + one JSON commit, independent of data
volume), because no data file is opened: widen/drop/defaults rewrite
only the schema + maps, and the identity backfill allocates per-file
bases from the manifest's stored row counts.

Also measures the READ-side overhead the features add: a full-table
aggregate before DDL vs after (defaults coalesce + identity base join
are one broadcast metadata join each — the delta should be small and
flat in table size).

Method matches tools/measure_r07.py: warm session, best-of-two.
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
        r = fn()
        ts.append(time.time() - t0)
    return min(ts), r


def main() -> None:
    import shutil
    import tempfile

    from pspcz_analyzer_spark import manifest as M
    from pspcz_analyzer_spark.jobs import write_range_sorted

    spark = get_spark(shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="ddl_scale_")
    try:
        for label, n_rows, n_files in (("1x", 200_000, 8), ("10x", 2_000_000, 80)):
            path = os.path.join(root, f"t_{label}")
            df = spark.range(n_rows).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") % 97).cast("float").alias("x"),
                (F.col("id") % 5).cast("int").alias("g"),
            )
            write_range_sorted(df, path, "k", num_partitions=n_files)
            M.manifest_init(path, stat_cols=["k"])

            t0 = time.time()
            M.widen_column_type(path, "k", "bigint")
            M.widen_column_type(path, "x", "double")
            widen_s = time.time() - t0

            t0 = time.time()
            M.add_column(
                path, "src", "string",
                initial_default="'legacy'", write_default="'live'",
            )
            default_s = time.time() - t0

            t0 = time.time()
            M.add_identity_column(path, "uid")
            ident_s = time.time() - t0

            t0 = time.time()
            M.drop_column(path, "g")
            drop_s = time.time() - t0

            read_s, rows = best2(
                lambda: M.load_manifest_table(spark, path)
                .agg(
                    F.sum("k"), F.count("src"), F.count_distinct("uid")
                )
                .collect()
            )
            print(
                f"{label}: rows={n_rows} files={n_files} "
                f"widen={widen_s:.3f}s default={default_s:.3f}s "
                f"identity={ident_s:.3f}s drop={drop_s:.3f}s "
                f"read_with_features={read_s:.3f}s agg={rows[0]}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
