"""Shared partitioning helper for CPU-bound operator stages.

Shingling, signature hashing, and document parsing are CPU-bound per row;
a small Parquet input arrives as 1-2 splits and would starve every other
core, so those stages widen the input up to the cluster parallelism. At
real scale file splits already saturate the cluster and the widen is a
no-op — the parse/hash rides the scan partitioning with no extra shuffle.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    """Logical+physical plan text via the public ``explain`` API.

    ``explain`` compiles the plan but runs no action, and (unlike probing
    ``df.rdd``) never finalizes AQE stages, so it is safe on any plan.
    """
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="extended")
    return buf.getvalue()


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input has fewer
    splits than cores; pass scan-shaped well-split inputs through untouched.

    The partition-count probe (``df.rdd``) is only safe on scan-shaped
    inputs: on a plan containing shuffles it finalizes AQE and EXECUTES the
    upstream stages, which then run AGAIN for the real action (measured 5x
    end-to-end). For such plans skip the probe and repartition outright —
    they were about to shuffle anyway, so one more narrow exchange of the
    input is cheap relative to re-running aggregations twice.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        plan = _plan_text(df)
    except Exception:
        return df.repartition(target)
    if any(k in plan for k in ("Aggregate", "Join", "Window", "Sort", "Repartition")):
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
