"""Stats-driven join planning: measure the PLAN-TIME claim — the
join_auto decision (two scan_estimate calls) must cost metadata time
that tracks FILE COUNT, never data volume, and must stay flat when the
data under each file grows 10x.

Method: build a range-sorted fact at (files, rows) = (8, 60k), (80,
600k) [10x files AND 10x rows] and (8, 600k) [10x rows, same files],
plus a small dim; time scan_estimate on a pruning range + the
join_strategy pick. Also records what the decision WOULD have been
without pruning (the unpruned fact estimate) — the case raw Spark
file-size estimation sees.

Prints one JSON line per scale for SCALING.md.
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
    from pspcz_analyzer_spark.jobs import write_range_sorted

    spark = get_spark(shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="join_auto_scale_")
    try:
        dim_path = os.path.join(tmp, "dim")
        (
            spark.range(500)
            .select(
                F.col("id").alias("user_id"),
                F.concat(F.lit("u"), F.col("id")).alias("name"),
            )
            .coalesce(1)
            .write.parquet(dim_path)
        )
        M.manifest_init(dim_path)
        dim_est = M.scan_estimate(dim_path)

        for label, files, rows in (
            ("1x", 8, 60_000),
            ("10x_rows_same_files", 8, 600_000),
            ("10x_files_and_rows", 80, 600_000),
        ):
            fact_path = os.path.join(tmp, f"fact_{label}")
            fact = spark.range(rows).select(
                F.col("id").alias("event_id"),
                (F.col("id") % 500).alias("user_id"),
                (F.rand(7) * 100).alias("value"),
            )
            write_range_sorted(fact, fact_path, "event_id", num_partitions=files)
            M.manifest_init(fact_path, stat_cols=["event_id"])
            ranges = {"event_id": (0, rows // 10 - 1)}
            # warm the manifest cache the way a living planner runs, then
            # time the steady-state estimate (best of 5)
            M.scan_estimate(fact_path, ranges=ranges)
            best = min(
                _timed(lambda: M.scan_estimate(fact_path, ranges=ranges))
                for _ in range(5)
            )
            est = M.scan_estimate(fact_path, ranges=ranges)
            unpruned = M.scan_estimate(fact_path)
            print(
                json.dumps(
                    {
                        "scale": label,
                        "files": files,
                        "rows": rows,
                        "estimate_ms": round(best * 1000, 2),
                        "files_kept": est["files_kept"],
                        "bytes_kept": est["bytes_kept"],
                        "strategy_pruned": M.join_strategy(est, dim_est),
                        "strategy_unpruned": M.join_strategy(
                            unpruned, dim_est
                        ),
                    }
                )
            )
        # The decision-flip case: fact x fact, both ~7x over the 10 MB
        # broadcast bar unpruned. Raw Spark file-size estimation sees two
        # unbroadcastable relations and plans a two-sided shuffle; the
        # governed scan's POST-PRUNING estimate proves the filtered side
        # small and ships it instead.
        big_a = os.path.join(tmp, "fact_a")
        big_b = os.path.join(tmp, "fact_b")
        for p in (big_a, big_b):
            fact = spark.range(6_000_000).select(
                F.col("id").alias("event_id"),
                (F.col("id") % 100_000).alias("user_id"),
                (F.rand(7) * 100).alias("value"),
            )
            write_range_sorted(fact, p, "event_id", num_partitions=64)
            M.manifest_init(p, stat_cols=["event_id"])
        ranges = {"event_id": (0, 449_999)}
        pruned = M.scan_estimate(big_a, ranges=ranges)
        unpruned = M.scan_estimate(big_a)
        other = M.scan_estimate(big_b)
        print(
            json.dumps(
                {
                    "scale": "fact_x_fact_flip",
                    "bytes_unpruned": unpruned["bytes_kept"],
                    "bytes_pruned": pruned["bytes_kept"],
                    "strategy_pruned": M.join_strategy(pruned, other),
                    "strategy_unpruned": M.join_strategy(unpruned, other),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
