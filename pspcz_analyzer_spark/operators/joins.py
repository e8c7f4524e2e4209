"""Join-shaped operators: latest-per-key, top-n-per-key, fuzzy match, as-of.

Reference parity:
* latest_per_key re-expresses the "sort desc + unique keep first" idiom the
  reference uses for latest club membership
  (/root/reference/pspcz_analyzer/services/mp_builder.py:31-33, SURVEY J3/W1).
* fuzzy_best_match re-expresses the difflib best-match submitter resolver
  (/root/reference/pspcz_analyzer/services/amendments/submitter_resolver.py:19-91,
  SURVEY J11) with Spark's built-in levenshtein — JVM-side, no Python UDF.
* asof_join re-expresses the vote→stage date cascade
  (/root/reference/pspcz_analyzer/services/votes_service.py:45-84, SURVEY J12)
  as the scalable union+window technique: ONE shuffle on (key, time), no
  range cross-product — this is the 100 TB-safe formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under future annotations
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``.

    Callers must make ``order_by`` a total order (append a unique id as the
    last column) for deterministic results — Spark window ties, unlike the
    reference's stable Polars sort, are otherwise nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topn_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-n rows per key with an explicit rank column (dense, 1-based)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)


def fuzzy_best_match(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int | None = None,
    right_tiebreak: str | None = None,
    scorer: str = "levenshtein",
    min_ratio: float | None = None,
) -> DataFrame:
    """For each left row, the best-scoring right row under ``scorer``.

    * ``scorer="levenshtein"`` (default): smallest edit distance via the
      built-in ``levenshtein`` — whole-stage codegen, no UDF, the scale
      path. ``max_distance`` caps it.
    * ``scorer="ratio"``: exact ``difflib.SequenceMatcher.ratio`` parity
      with the reference's submitter resolver
      (/root/reference/pspcz_analyzer/services/amendments/
      submitter_resolver.py:36-46): highest ratio wins, ``min_ratio``
      replicates its ``_MATCH_THRESHOLD >= 0.7`` filter. Python's ratio has
      no JVM twin, so scoring runs in an Arrow-batched pandas UDF — per
      candidate PAIR after the join, never per row² in Python, and the
      candidate set is already bounded by the broadcast/blocked right side.

    Implementation: broadcast the smaller ``right`` side, score, pick top-1
    per left row via window (ties break on score then ``right_tiebreak`` —
    the reference's first-row-wins tie is iteration-order-dependent and has
    no distributed equivalent, so the tiebreak here is explicit and
    deterministic). At huge right-side cardinality put MinHashLSH blocking
    first (see operators/dedup.py) — scoring and selection stay the same.
    """
    joined = left.join(F.broadcast(right))
    if scorer == "levenshtein":
        scored = joined.withColumn(
            "distance", F.levenshtein(F.col(left_col), F.col(right_col))
        )
        if max_distance is not None:
            scored = scored.filter(F.col("distance") <= max_distance)
        order = F.col("distance").asc()
    elif scorer == "ratio":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _ratio(a: pd.Series, b: pd.Series) -> pd.Series:
            import difflib

            return pd.Series(
                [
                    difflib.SequenceMatcher(None, x or "", y or "").ratio()
                    for x, y in zip(a, b)
                ]
            )

        scored = joined.withColumn(
            "ratio", _ratio(F.col(left_col), F.col(right_col))
        )
        if min_ratio is not None:
            scored = scored.filter(F.col("ratio") >= min_ratio)
        order = F.col("ratio").desc()
    else:
        raise ValueError(f"unknown scorer: {scorer}")
    tiebreaks: list[Column] = [order, F.col(right_tiebreak or right_col).asc()]
    return latest_per_key(scored, [left_col], tiebreaks)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    strict: bool = True,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the values of the nearest
    right row with the same key — ``direction="backward"`` takes the
    latest right row with ``right_time`` <= (or < when ``strict``)
    ``left_time``; ``direction="forward"`` takes the earliest right row
    with ``right_time`` >= (or >) ``left_time``. The forward variant is
    the same union+window plan scanning time in reverse.

    Scalable formulation: tag both sides, union on a common schema, and use
    ``last(..., ignorenulls=True)`` over a (key, time) window. Exactly one
    shuffle on the key — no per-row range scan, no cross product — so the
    plan survives arbitrarily large inputs as long as single keys fit a
    partition (salt upstream if one key dominates).

    Ties: right rows sorted by (time, original order not guaranteed) — pass
    pre-deduplicated right sides (e.g. via latest_per_key) when multiple
    right rows can share a timestamp.
    """
    on = list(on)
    lcols = left.columns
    # Common layout: key cols, event time, side tag, payload struct.
    l_tag = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_values]).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_values]).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal time iff non-strict;
    # strict puts left first so it cannot see same-instant right rows.
    # (The tag logic is direction-independent — only the time order flips.)
    order_tag = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, order_tag)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__is_left") == 1).select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__match")[c].alias(f"{prefix}{c}") for c in right_values],
    )
    return out


def cascade_join(
    left: DataFrame,
    levels: Sequence[DataFrame],
    left_id: str,
    value_cols: Sequence[str],
    level_col: str = "match_level",
) -> DataFrame:
    """Priority-cascade match: attach the FIRST level that matched each row.

    Re-expresses the reference's multi-level vote→stage resolution
    (/root/reference/pspcz_analyzer/services/votes_service.py:45-84): try
    the most specific key first, fall back level by level, record which
    level won. Each ``levels[i]`` is a pre-resolved match table
    ``(left_id, *value_cols)`` with AT MOST one row per left id (dedupe
    upstream with latest_per_key / groupBy-max).

    Scalable shape: tag each level with its priority, union them (no
    barrier — the union is a narrow concat of already-shuffled aggregates),
    take ``min(struct(level, ...))`` per left id — one shuffle on the id —
    and left-join the winner back. No level ever sees another level's
    misses, so there is no iterative "filter the unmatched and rejoin"
    driver loop (which would serialize the levels at scale).
    """
    value_cols = list(value_cols)
    tagged = [
        lvl.select(
            F.col(left_id),
            F.lit(i + 1).cast("int").alias(level_col),
            *[F.col(c) for c in value_cols],
        )
        for i, lvl in enumerate(levels)
    ]
    allm = tagged[0]
    for t in tagged[1:]:
        allm = allm.unionByName(t)
    best = allm.groupBy(left_id).agg(
        F.min(F.struct(level_col, *value_cols)).alias("__m")
    )
    return left.join(best, left_id, "left").select(
        *[F.col(c) for c in left.columns],
        F.col(f"__m.{level_col}").alias(level_col),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    max_cells: int = 4096,
) -> DataFrame:
    """Point-in-interval range join via domain bucketing — the custom
    operator Spark lacks natively: a raw ``p BETWEEN lo AND hi`` join has
    no equi-key, so Catalyst plans BroadcastNestedLoopJoin (only viable
    while one side fits a broadcast) or a cartesian product.

    Scale path: grid the (numeric) domain into ``bucket_width`` cells.
    Each interval explodes to the cells it touches
    (``floor(lo/B) .. floor(hi/B)`` — at most ``len/B + 2`` rows), each
    point maps to exactly ONE cell, and the join becomes a hash equi-join
    on the cell id with the exact BETWEEN predicate evaluated inside it.
    Because a point lives in a single cell, every qualifying (point,
    interval) pair meets exactly once — no dedup pass. Pick
    ``bucket_width`` near the typical interval length: explode factor
    stays ~2 while cells stay selective (the same trade every interval
    index — e.g. PostGIS grids — makes).

    Inputs are numeric (caller converts timestamps, e.g. epoch seconds
    via ``timestamp_diff``). Degenerate intervals (``lo > hi``, or a null
    bound) match nothing under BETWEEN, so they are dropped before the
    explode — a raw ``F.sequence(lo_cell, hi_cell)`` would instead emit a
    DESCENDING cell list for them and wrongly join. ``max_cells`` is the
    explode-factor contract made executable: an interval spanning more
    than that many cells (an outlier row, or a ``bucket_width`` chosen
    far below the real interval lengths) fails the job with a clear
    message instead of silently materializing a huge per-row array.
    Returns all columns of both inputs for qualifying pairs; one shuffle
    per side, keyed by the cell id.
    """
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    pt = points.withColumn(
        "__cell", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    lo_cell = F.floor(F.col(lo_col) / bucket_width).cast("long")
    hi_cell = F.floor(F.col(hi_col) / bucket_width).cast("long")
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "__cells",
        F.when(
            hi_cell - lo_cell >= max_cells,
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join: interval spans more than "
                        f"{max_cells} cells (bucket_width={bucket_width} "
                        "is far below this interval's length; raise "
                        "bucket_width or max_cells): lo="
                    ),
                    F.col(lo_col).cast("string"),
                    F.lit(" hi="),
                    F.col(hi_col).cast("string"),
                )
            ).cast("array<long>"),
        ).otherwise(F.sequence(lo_cell, hi_cell)),
    )
    iv = explode_notnull(iv, "__cells", "__cell", keep=tuple(intervals.columns))
    return (
        pt.join(iv, "__cell")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__cell")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table: one
    row per changed key with ``change_type`` in insert/delete/update and
    the null-safe list of changed columns — what a lake without a
    transactional format (this repo's Parquet world, the reference's
    re-downloaded UNL dumps) uses to find what a refresh actually
    changed, feed incremental maintenance (``jobs.py`` incremental
    aggregates), or audit an upsert.

    Plan: ONE full-outer sort-merge join keyed on ``keys`` (both sides
    shuffle once on the same key — at 100 TB co-locate via bucketed
    layouts, ``jobs.write_bucketed``, and neither side shuffles at all);
    change classification and the changed-column list are codegen'd
    null-safe comparisons, no second pass. Unchanged keys are dropped
    before anything leaves the join, so output tracks churn, not table
    size.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError(
            "compare_cols must be non-empty; for a key-presence-only diff "
            "pass any column and ignore changed_cols, or use an anti-join"
        )
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    differs = [
        ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}")) for c in compare_cols
    ]
    any_diff = differs[0]
    for d in differs[1:]:
        any_diff = any_diff | d
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(any_diff, F.lit("update"))
    )
    changed = F.when(
        change == "update",
        F.concat_ws(
            ",", *[F.when(d, F.lit(c)) for c, d in zip(compare_cols, differs)]
        ),
    ).otherwise(F.lit(""))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            changed.alias("changed_cols"),
            *[F.col(f"__old_{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"__new_{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )


def _bloom_positions(col: Column, m_bits: int, k: int) -> Column:
    """The k bit positions a key sets/probes: position_i =
    md5(key ":" i) taken as a 60-bit integer mod ``m_bits``. Pure
    codegen'd column expression (conv/substring/md5) — the probe runs
    inside the fact table's scan stage, no UDF, no shuffle."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(":", col.cast("string"), i.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits,
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Semi-join with a Bloom-filter runtime prefilter — the explicit form
    of the runtime-filter technique engines inject for selective joins
    (Spark's InjectRuntimeFilter, Bloom 1970): when the dimension side is
    too big to broadcast as rows, its KEY SET still compresses into a
    ``m_bits``-bit bitmap (8 KiB at the 2^16 default) that broadcasts for
    free, and the fact side drops non-matching rows INSIDE its scan stage
    — before the shuffle — instead of carrying them to the join.

    Exactness by construction: a Bloom filter has no false negatives, so
    every true member survives the prefilter; the confirming left-semi
    equi-join on the survivors removes the false positives (rate
    ~(1-e^{-kn/m})^k, ~2 % at the defaults for n=10k keys). The result
    therefore EQUALS the plain semi-join for any (m_bits, k) — the knobs
    trade prefilter selectivity, never correctness (property-tested
    against the exact semi-join in test_joins.py).

    Plan shape: one pass over dim's keys builds per-word OR aggregates
    (m_bits/64 rows — e.g. 1024 — collected driver-side, the same bounded
    payload as any broadcast scalar), embedded as an array<bigint>
    LITERAL in the probe — exactly how Spark's own injected runtime
    filters ship their bloom bitmaps. The literal (not a crossJoin'd
    one-row frame, which Catalyst reorders ABOVE the confirm join,
    running the probe after the shuffle it exists to shrink) makes the
    probe a plain Filter that pushdown keeps in the fact's scan stage —
    below whatever join the confirm becomes. At 100 TB: the fact table's
    shuffle volume scales with the SURVIVORS, not the table — the whole
    point; dim shuffles once on the distinct bit positions (bounded by
    m_bits, not dim's size).
    """
    dim_key = dim_key or fact_key
    spark = fact.sparkSession
    words = (
        dim.select(
            F.explode(_bloom_positions(F.col(dim_key), m_bits, k)).alias("p")
        )
        .distinct()
        .groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
                )
            ).alias("bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["bits"]
    bitmap = F.lit(arr)  # ONE Literal node (8 KiB), not 1024 children
    probe = F.forall(
        _bloom_positions(F.col(fact_key), m_bits, k),
        lambda p: (
            F.element_at(bitmap, (p / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
        )
        != 0,
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.filter(probe).join(keys, fact_key, "left_semi")
