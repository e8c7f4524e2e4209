"""Round-7: pin the iterative-operator cost model (VERDICT r6 ask).

Splits a fixed-iteration graph op's wall time into FIXED per-round
overhead (job scheduling + eager localCheckpoint materialization +
shuffle setup) and the DATA term (edge-join + dst aggregate bytes), by
timing pagerank at n_iter=2 and n_iter=12 on 1x and 10x edge sets:

    per_round  = (t12 - t2) / 10
    setup_cost = t2 - 2 * per_round

If per_round barely moves at 10x data, rounds are overhead-dominated at
test scale and tuning partition counts there is pointless; the data term
is what a real cluster parallelizes away. Results land in PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pspcz_analyzer_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pspcz_analyzer_spark.operators.graph import pagerank

    spark = get_spark(app_name="measure_r07_graph")

    def edges(n_nodes, n_edges, seed):
        return (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64(F.col("id") + seed), F.lit(n_nodes)).alias("src"),
                F.pmod(F.xxhash64(F.col("id") * 31 + seed + 7), F.lit(n_nodes)).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .localCheckpoint()
        )

    def run(e, iters):
        t0 = time.time()
        pagerank(e, n_iter=iters).agg(F.sum("rank")).collect()
        return time.time() - t0

    for scale, (nn, ne) in (("1x", (2_000, 40_000)), ("10x", (20_000, 400_000)),
                            ("100x", (200_000, 4_000_000))):
        e = edges(nn, ne, 11)
        run(e, 2)  # warm
        t2 = min(run(e, 2) for _ in range(2))
        t12 = min(run(e, 12) for _ in range(2))
        per_round = (t12 - t2) / 10
        setup = t2 - 2 * per_round
        print(f"pagerank {scale}: nodes={nn} edges~{ne} t2={t2:.2f}s "
              f"t12={t12:.2f}s per_round={per_round*1000:.0f}ms "
              f"setup={setup:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
