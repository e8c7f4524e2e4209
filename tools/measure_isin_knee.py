"""Measure the Catalyst cost of the DML fast path's ``isin(*key_set)``
literal filter as the key count grows (round-8 ask: the 100k-literal
``In`` AST was suspected planner-hostile well before the limit).

Two timings per N:
- build+analyze: construct the Column (N py4j literal conversions) and
  force analysis via ``df.schema`` on the filtered frame;
- optimize+execute: run the filter end-to-end on a small table (the
  Catalyst In->InSet conversion happens during optimization; execution
  on 10k rows is negligible next to plan work at large N).

Compared against the LEFT ANTI join path at the same N. Output: one JSON
line per (path, N) for SCALING.md.

Usage: python tools/measure_isin_knee.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pspcz_analyzer_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    base = spark.range(10_000).select(F.col("id").alias("k")).cache()
    base.count()

    for n in (1_000, 10_000, 25_000, 50_000, 100_000):
        keys = list(range(0, 2 * n, 2))[:n]

        t0 = time.time()
        cond = ~F.col("k").isin(*keys)
        filtered = base.filter(cond)
        _ = filtered.schema  # force analysis
        t_build = time.time() - t0

        t0 = time.time()
        cnt = filtered.count()
        t_exec = time.time() - t0
        print(json.dumps({
            "path": "isin", "n_keys": n,
            "build_analyze_s": round(t_build, 3),
            "optimize_execute_s": round(t_exec, 3),
            "rows": cnt,
        }))

        kdf = spark.createDataFrame([(k,) for k in keys], "k bigint")
        t0 = time.time()
        joined = base.join(kdf, "k", "left_anti")
        _ = joined.schema
        t_build_j = time.time() - t0
        t0 = time.time()
        cnt_j = joined.count()
        t_exec_j = time.time() - t0
        print(json.dumps({
            "path": "anti_join", "n_keys": n,
            "build_analyze_s": round(t_build_j, 3),
            "optimize_execute_s": round(t_exec_j, 3),
            "rows": cnt_j,
        }))
        assert cnt == cnt_j
    return 0


if __name__ == "__main__":
    sys.exit(main())
