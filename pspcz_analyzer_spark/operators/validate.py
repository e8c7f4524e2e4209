"""Order-independent table fingerprints — data-equality validation.

The primitive behind "did the migration/compaction/clone/restore
preserve the data": one scan per table producing a constant-size
(n_rows, checksum) summary that is invariant to row order and file
layout, so two pipelines (or two engines — the DuckDB oracle replays
the same formula) can compare petabyte tables by exchanging one row.

Checksum = SUM over rows of the first 8 hex digits of
md5(col1 \\x1f col2 \\x1f ...) as an integer. Summation is commutative
(order-free) and exact in int64 up to ~4e9 rows (2^32 max addend); the
md5-over-canonical-text idiom is the same one the CMS/sampling oracles
replay, so cross-engine agreement is by construction, not luck.
Collision note: an ADVERSARY can forge sum collisions; against random
corruption (the operational threat: lost rows, duplicated files, type
drift) detection odds are 1 - 2^-32 per differing row set. Null cells
canonicalize to a sentinel so (NULL) and ('') differ.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def fingerprint_table(
    df: DataFrame, cols: "list[str] | None" = None
) -> DataFrame:
    """One row: (n_rows, checksum) for ``df`` over ``cols`` (default: all
    columns, in NAME order so projections/reorderings don't change the
    fingerprint). One scan, map-side partial aggregation, constant
    output."""
    cols = sorted(df.columns) if cols is None else list(cols)
    canon = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
        for c in cols
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *canon)), 1, 8), 16, 10
    ).cast("long")
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("__h"), F.lit(0)).cast("long").alias("checksum"),
    )


def tables_equal(a: DataFrame, b: DataFrame, cols: "list[str] | None" = None) -> bool:
    """Fingerprint equality of two frames (same caveats as above) —
    two scans, one driver-side row compare."""
    fa = fingerprint_table(a, cols).collect()[0]
    fb = fingerprint_table(b, cols).collect()[0]
    return (fa["n_rows"], fa["checksum"]) == (fb["n_rows"], fb["checksum"])


def fingerprint_buckets(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 256,
    cols: "list[str] | None" = None,
) -> DataFrame:
    """(bucket, n_rows, checksum): the table's fingerprint split over
    ``n_buckets`` hash buckets of ``key_col`` — the Merkle-ish layer over
    :func:`fingerprint_table` that makes reconciliation CHEAP: two
    replicas compare by exchanging ``n_buckets`` rows, and only the
    buckets whose (count, checksum) disagree need a row-level rescan —
    anti-entropy repair for petabyte tables at the cost of one scan plus
    a bucket-count exchange. Bucketing uses the engine-reproducible md5
    idiom (not Spark's hash()), so a DuckDB replica computes identical
    bucket ids and the comparison is meaningful across engines."""
    cols = sorted(df.columns) if cols is None else list(cols)
    canon = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
        for c in cols
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *canon)), 1, 8), 16, 10
    ).cast("long")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % n_buckets
    )
    return (
        df.select(bucket.alias("bucket"), h.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h").cast("long").alias("checksum"),
        )
    )


def diff_buckets(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    n_buckets: int = 256,
    cols: "list[str] | None" = None,
) -> DataFrame:
    """Buckets where two tables DISAGREE: (bucket, n_rows_a, n_rows_b,
    match) for every bucket present on either side, match=false where
    count or checksum differs — the planning step of reconciliation (the
    repair step rescans only rows hashing into the false buckets). Empty
    buckets on one side read as 0 rows, so added/removed key ranges
    surface as count mismatches, not silent absence."""
    fa = fingerprint_buckets(a, key_col, n_buckets, cols).withColumnRenamed(
        "n_rows", "n_rows_a"
    ).withColumnRenamed("checksum", "cs_a")
    fb = fingerprint_buckets(b, key_col, n_buckets, cols).withColumnRenamed(
        "n_rows", "n_rows_b"
    ).withColumnRenamed("checksum", "cs_b")
    same = (
        F.coalesce("n_rows_a", F.lit(0)) == F.coalesce("n_rows_b", F.lit(0))
    ) & (F.coalesce("cs_a", F.lit(0)) == F.coalesce("cs_b", F.lit(0)))
    return fa.join(fb, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_rows_a", F.lit(0)).cast("long").alias("n_rows_a"),
        F.coalesce("n_rows_b", F.lit(0)).cast("long").alias("n_rows_b"),
        same.alias("match"),
    )


def check_expectations(
    df: DataFrame,
    rules: "dict[str, tuple]",
) -> DataFrame:
    """Declarative data-quality gate (the great-expectations pattern in
    one operator): ``rules`` maps a rule name to ``(row_predicate,
    min_pass_fraction)``; ALL rules evaluate in ONE scan (a single
    aggregate with per-rule conditional sums, map-side combined), and
    the result is one row per rule — (rule, n_rows, n_pass,
    pass_fraction, threshold, passed) — the shape a pipeline asserts on
    before promoting a batch. NULL predicate results count as FAILURES
    (a rule that can't evaluate a row hasn't passed it). Row-wise rules
    only by design; set-level checks (uniqueness, cardinality drift)
    belong to profile_table/hll_distinct, which aggregate differently.
    """
    names = sorted(rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, name in enumerate(names):
        pred, _ = rules[name]
        aggs.append(
            F.sum(F.coalesce(pred.cast("int"), F.lit(0))).alias(f"__p{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', __p{i}, CAST({float(rules[n][1])} AS DOUBLE)"
        for i, n in enumerate(names)
    )
    long = wide.selectExpr(
        "__n",
        f"stack({len(names)}, {stack_args}) AS (rule, __pass, threshold)",
    )
    frac = F.when(F.col("__n") == 0, F.lit(1.0)).otherwise(
        F.col("__pass") / F.col("__n")
    )
    return long.select(
        "rule",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("__pass").cast("long").alias("n_pass"),
        F.round(frac, 6).alias("pass_fraction"),
        "threshold",
        (frac >= F.col("threshold")).alias("passed"),
    ).orderBy("rule")
