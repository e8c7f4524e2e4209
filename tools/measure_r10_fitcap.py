"""r9 verdict ask #7: pin the SemDeDup fit-cap tail ANALYTICALLY.

The r9 decade sweep left one explained-but-unmeasured residual: past
``fit_sample_cap`` the k-means FIT should cost O(cap * k * iters) — with
the sample pinned at the cap and k = ceil(n / target_cell_size), doubling
the corpus doubles k and should ~double fit wall-time (linear in n).
Without the cap the sample AND k both grow, and fit time would ~4x per
corpus doubling (the n*k quadratic the cap exists to kill).

This script measures the FIT ALONE (the exact production path:
sample -> pyspark.ml KMeans.fit, same params as
operators/dedup.py::semantic_dedup) on synthetic embeddings at two corpus
sizes past the cap and prints the ratio. Expected: capped ratio ~2
(k-growth only), uncapped ratio ~4 (n*k).

Usage: python tools/measure_r10_fitcap.py [n_base] [dim]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from pspcz_analyzer_spark.session import get_spark

# Module-level defaults; main() overrides from argv. Sized so one Lloyd
# iteration is COMPUTE-bound (sample*k*dim multiply-adds >> per-job
# scheduling overhead) — at small k the fit is all fixed job latency and
# the asymptotic term is invisible (measured: k=500 vs k=1000 at
# sample=20k/dim=16 was NOISE).
CAP = 50_000  # fit_sample_cap, scaled down so the A/B fits in minutes
CELL = 100  # target_cell_size -> k = n / CELL
SEED = 42


def synth(spark, n: int, dim: int):
    """Deterministic synthetic embeddings: hash-derived floats in [0,1)."""
    cols = [
        (
            (F.hash(F.col("id"), F.lit(i)).cast("double") / 2147483647.0 + 1)
            / 2
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), *cols)
        .select(
            "vec_id",
            F.array(*[F.col(f"c{i}") for i in range(dim)]).alias(
                "embedding"
            ),
        )
    )


def fit_seconds(spark, n: int, dim: int, capped: bool) -> tuple[float, int]:
    """Time ONE k-means fit exactly as semantic_dedup builds it."""
    df = synth(spark, n, dim)
    k = max(2, -(-n // CELL))
    frac = (CAP / n) if (capped and n > CAP) else 1.0
    feat = df.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "__fv"
        ),
    )
    train = feat if frac >= 1.0 else feat.sample(frac, seed=SEED)
    train = train.persist()
    train.count()  # materialize outside the timed window
    t0 = time.time()
    # Controls that isolate the per-iteration cost term the cap bounds:
    # tol=0 forces exactly maxIter Lloyd iterations (uniform synthetic
    # data otherwise converges in 1-2, hiding the asymptotics) and
    # random init removes kmeans||'s own data-dependent pass count.
    # Production (semantic_dedup) keeps Spark defaults; the COST MODEL
    # per iteration (sample * k * dim) is identical.
    KMeans(
        k=k, seed=SEED, featuresCol="__fv", predictionCol="__cell",
        maxIter=5, tol=0.0, initMode="random",
    ).fit(train)
    dt = time.time() - t0
    train.unpersist()
    return dt, k


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="fitcap")
    # Warmup: first ML fit in a session pays JIT/codegen — untimed.
    fit_seconds(spark, 10_000, dim, True)
    rows = []
    for capped in (True, False):
        for n in (n_base, 2 * n_base):
            dt, k = fit_seconds(spark, n, dim, capped)
            rows.append((capped, n, k, dt))
            print(
                f"capped={capped} n={n} k={k} "
                f"sample={min(n, CAP) if capped else n} fit={dt:.2f}s",
                flush=True,
            )
    by = {(c, n): dt for c, n, _k, dt in rows}
    r_cap = by[(True, 2 * n_base)] / by[(True, n_base)]
    r_un = by[(False, 2 * n_base)] / by[(False, n_base)]
    print(
        f"RESULT capped_ratio={r_cap:.2f} (expect ~2, k-growth only) "
        f"uncapped_ratio={r_un:.2f} (expect ~4, n*k)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
