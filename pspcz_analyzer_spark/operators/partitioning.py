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

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _plan_text(df: DataFrame) -> str:
    """Logical+physical plan text via the public ``explain`` API.

    ``explain`` compiles the plan but runs no action, and (unlike probing
    ``df.rdd``) never finalizes AQE stages, so it is safe on any plan.
    """
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="extended")
    return buf.getvalue()


def spread(df: DataFrame, scan_shaped: bool | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input has fewer
    splits than cores; pass scan-shaped well-split inputs through untouched.

    ``scan_shaped`` is the caller's declaration of the input's plan shape —
    every CPU-bound stage in this package knows it statically (they consume
    a projected table scan), so the default path never inspects plan text:

    - ``True``: the plan is scan+projection only. The partition-count probe
      (``df.rdd``) is safe here and the input keeps its scan partitioning
      when already wide (the 100 TB case: file splits saturate the cluster
      and this is a no-op).
    - ``False``: the plan contains shuffles (aggregate/join/window). Never
      probe — on such plans ``df.rdd`` finalizes AQE and EXECUTES the
      upstream stages, which then run AGAIN for the real action (measured
      5x end-to-end). Repartition outright: the plan was about to shuffle
      anyway, so one more narrow exchange of the input is cheap relative
      to re-running aggregations twice.
    - ``None`` (deprecated fallback for legacy callers): sniff the explain
      text to guess — version/format-brittle; pass the flag instead.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if scan_shaped is None:
        try:
            plan = _plan_text(df)
        except Exception:
            return df.repartition(target)
        scan_shaped = not any(
            k in plan
            for k in ("Aggregate", "Join", "Window", "Sort", "Repartition")
        )
    if not scan_shaped:
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explode_notnull(
    df: DataFrame, arr: Column | str, alias: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(alias))`` without the
    inferred-filter trap.

    A non-outer explode invites ``InferFiltersFromGenerate`` to add
    ``size(arr) > 0 AND isnotnull(arr)`` below the Generate. That filter
    embeds TWO copies of the (often expensive) array expression, and
    predicate pushdown drags it below any repartition — so the expression
    is re-evaluated per row on the RAW input's few splits, serializing the
    whole stage (measured 13x slower for shingle explodes over a one-file
    Parquet scan: 14.4 s -> 1.1 s at 50 k docs x n=5).

    ``explode_outer`` infers no such filter; the row it emits for a
    null/empty array carries a null ``alias``, dropped by a cheap filter on
    the OUTPUT column — restoring inner-explode semantics.

    Caveat: arrays whose ELEMENTS can be null are not for this helper (an
    inner explode keeps null elements; the output filter here drops them).
    Every array in this codebase is built from concat_ws/split/hash
    expressions, which never produce null elements.
    """
    out = df.select(*[F.col(c) for c in keep], F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


def posexplode_notnull(
    df: DataFrame,
    arr: Column | str,
    pos_alias: str,
    alias: str,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """``posexplode`` twin of :func:`explode_notnull` (same rationale)."""
    out = df.select(
        *[F.col(c) for c in keep],
        F.posexplode_outer(arr).alias(pos_alias, alias),
    )
    return out.filter(F.col(alias).isNotNull())
