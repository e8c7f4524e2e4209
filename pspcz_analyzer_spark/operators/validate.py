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
