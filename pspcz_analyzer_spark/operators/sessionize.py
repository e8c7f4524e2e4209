"""Gap-based sessionization as a reusable batch operator.

New surface beyond the reference (its freshness machinery is file-watching,
not event-time — SURVEY §2.10 note); specified directly from Spark
semantics. The streaming twin lives in streaming/events.py
(``F.session_window`` + watermark); this batch formulation is the
backfill/oracle-checkable path and must agree with it on closed sessions.

Plan shape: ONE shuffle on the key (window partition); the boundary flag +
running sum is two window functions over the same (key, time) sort, so
Catalyst evaluates them in a single Window node. Scales with per-key event
counts, not total rows — salt upstream only if a single key dominates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 30 * 60,
    order_tiebreak: str | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-key session sequence number; a gap > ``gap_seconds``
    between consecutive events starts a new session.

    ``order_tiebreak`` (a unique column) makes same-timestamp ordering
    deterministic — required for hash-stable results.
    """
    order = [F.col(time_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    w_acc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(time_col).over(w)
    # timestamp_diff (not unix_micros) so the operator accepts both
    # TIMESTAMP and TIMESTAMP_NTZ event-time columns.
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col(time_col))
    is_new = F.when(
        prev.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__is_new", is_new).withColumn(
        session_col, F.sum("__is_new").over(w_acc).cast("long")
    ).drop("__is_new")


def session_bounds(
    sessions: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    session_col: str = "session_seq",
) -> DataFrame:
    """Collapse sessionized events to one row per session with bounds and
    size — the batch analog of a session_window aggregation."""
    return sessions.groupBy(key_col, session_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
    )
