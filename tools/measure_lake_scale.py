"""Measure the lake maintenance ops at 1x vs 10x file populations.

SCALING.md's query section proves the QUERY plans scale; this harness
covers the file-surgery ops (delete_keys / compact_small_files /
write_zordered), whose contracts are about FILES, not rows:

* delete_keys — cost tracks the AFFECTED files only: at 10x data laid
  out range-sorted with 10x more files, the same 2 victim keys still
  cluster into ~1-2 files, so the delete should be ~flat while the
  table grew 10x.
* compact_small_files — cost tracks SMALL-FILE BYTES: 10x more small
  files of the same size => ~10x (linear), never table-size-bound.
* write_zordered — one stats pass + one range exchange: ~linear.

Usage: python tools/measure_lake_scale.py [sf_dir]   (default sf0.1)
Prints a markdown table row per (op, scale); best-of-two, warm session.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from pspcz_analyzer_spark.catalog import load_table  # noqa: E402
from pspcz_analyzer_spark.jobs import (  # noqa: E402
    compact_small_files,
    delete_keys,
    write_range_sorted,
    write_zordered,
)
from pspcz_analyzer_spark.session import get_spark  # noqa: E402


def best_of_two(fn) -> float:
    times = []
    for _ in range(2):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="lake_scale")
    base = os.path.join(tempfile.gettempdir(), f"lake_scale_{os.getpid()}")
    os.makedirs(base, exist_ok=True)

    ev1 = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n1 = ev1.count()
    top_id = ev1.agg(F.max("event_id")).collect()[0][0] + 1
    # 10x replica: same user domain (victims stay 2 keys), distinct ids.
    ev10 = ev1.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(9)))).select(
        (F.col("event_id") + F.col("__r") * top_id).alias("event_id"),
        "user_id",
        "value",
    )
    rows = {}

    for tag, df, parts in (("1x", ev1, 16), ("10x", ev10, 160)):
        path = os.path.join(base, f"sorted_{tag}")

        def setup():
            shutil.rmtree(path, ignore_errors=True)
            write_range_sorted(df, path, "user_id", num_partitions=parts)

        # write_zordered timing (its own dir; overwrite mode resets it).
        zpath = os.path.join(base, f"z_{tag}")
        rows[f"write_zordered {tag}"] = (
            best_of_two(lambda: write_zordered(df, zpath, ["user_id", "value"])),
            f"{len(glob.glob(os.path.join(zpath, '*.parquet')))} files",
        )

        # delete_keys: re-lay the table before each timed run (the op
        # mutates it); report victim-file count from the op's return.
        deleted_files = []

        def timed_delete():
            setup()
            t0 = time.time()
            nf, _ = delete_keys(spark, path, "user_id", [7, 8])
            deleted_files.append(nf)
            return time.time() - t0

        rows[f"delete_keys {tag}"] = (
            min(timed_delete(), timed_delete()),
            f"{deleted_files[-1]} of {len(glob.glob(os.path.join(path, '*.parquet')))} files rewritten",
        )

        # compact_small_files: many deliberately-small files.
        cpath = os.path.join(base, f"small_{tag}")
        small_files = 64 if tag == "1x" else 640
        merged_n = []

        def timed_compact():
            shutil.rmtree(cpath, ignore_errors=True)
            df.repartition(small_files).write.parquet(cpath)
            t0 = time.time()
            m, _ = compact_small_files(spark, cpath, target_bytes=512 * 1024 * 1024)
            merged_n.append(m)
            return time.time() - t0

        rows[f"compact_small_files {tag}"] = (
            min(timed_compact(), timed_compact()),
            f"{merged_n[-1]} small files merged",
        )

    print(f"events rows: 1x={n1:,} 10x={n1 * 10:,}")
    print("| op | sec | note |")
    print("|---|---:|---|")
    for k, (sec, note) in rows.items():
        print(f"| {k} | {sec:.2f} | {note} |")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
