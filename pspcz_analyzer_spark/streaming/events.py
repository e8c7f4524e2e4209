"""Streaming operators over events (new surface per SURVEY §2.10 note).

The reference's freshness machinery is a 30 s mtime poller
(/root/reference/pspcz_analyzer/services/data_reader.py:57,388-508); its
Spark-native replacement is a Structured Streaming file source plus
event-time windows with watermarks — specified from Spark semantics
directly (the reference has no event-time behavior to copy).

Every aggregation here has a registered BATCH twin in plans/windows.py
(same expressions, same window functions); tests/test_streaming.py proves
stream(availableNow) == batch on the driver's events table. That parity is
the correctness story for the streaming path — the oracle gate covers the
batch twin, and the twin covers the stream.

Scale notes: the watermark bounds state (old windows are evicted);
shuffle is keyed by window/session key exactly as in batch; a file-source
backlog is processed in bounded availableNow batches, so state never
depends on total corpus size, only on the watermark horizon.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# events.parquet read schema: ts is written as TIMESTAMP(MICROS,
# isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ — declare it
# that way so the streaming schema matches the batch load_table read.
_EVENTS_RAW = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one-file backlog; in
    production a landing directory that keeps growing).

    Watermarks demand TIMESTAMP (with zone), so the naive column is cast
    LTZ. The session zone must already be UTC — guaranteed by get_spark()
    at build time or plans.query_fns's ensure_runtime_confs shim — which
    makes that cast the identity on the underlying micros value (stream
    results stay equal to the NTZ batch twins and the DuckDB oracle
    regardless of machine timezone).
    """
    from pspcz_analyzer_spark.session import ensure_runtime_confs

    import os

    ensure_runtime_confs(spark)  # UTC zone makes the NTZ->LTZ cast identity
    table = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(table):
        # Directory layout (Spark-written part files): stream the dir.
        # pathGlobFilter matches LEAF file names, so the single-file
        # filter below would silently match nothing here.
        raw = spark.readStream.schema(_EVENTS_RAW).parquet(table)
    else:
        raw = (
            spark.readStream.schema(_EVENTS_RAW)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count/sum (batch twin: events_tumbling_1h)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows (batch twin: events_sliding_1h_30m)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native streaming sessionization via session_window (batch twin:
    events_session_window_10m). State per open session, evicted past the
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_nation_totals(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the event stream with BATCH dimension
    tables (customer -> nation), then aggregate per nation.

    The static side is broadcast — no stream-side shuffle for the join, no
    join state at all (stream-static joins are stateless; each micro-batch
    probes the current dim snapshot). This is the streaming twin of the
    dict-lookup enrichment the reference does per request; at cluster
    scale the dims refresh by re-reading the snapshot between batches.
    """
    bridge = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_nationkey"
        ).join(
            nation.select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("user_id", "n_name")
    )
    return (
        events.join(bridge, "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def view_purchase_attribution(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream self-join: attribute each purchase to the same user's
    views in the preceding ``window``.

    Both sides carry a watermark and the join condition bounds event time
    on both ends, so the state store holds only rows inside
    watermark + window — state is evicted as the watermark advances and
    never grows with stream length. Inner-join matches emit as soon as
    both rows have arrived (no watermark wait), so an availableNow drain
    equals the batch interval join row-for-row.

    ``how="left_outer"`` adds the UNATTRIBUTED purchases (null view
    columns) — the conversion-funnel complement. Outer rows can only
    emit once the watermark proves no matching view can still arrive,
    so a purchase's null row is withheld until event time passes
    ``purchase_ts + watermark``; a drain that must flush every outer row
    advances the watermark past the data (the catalog query feeds one
    far-future sentinel per side and filters it from the sink).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        views,
        F.expr(
            f"user_id = v_user AND view_ts >= purchase_ts - interval {window}"
            " AND view_ts < purchase_ts"
        ),
        how,
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        "purchase_ts",
        "view_ts",
        "purchase_value",
    )


def dedupe_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup bounded by the watermark — state holds only
    keys newer than the horizon (dropDuplicatesWithinWatermark), the
    streaming analog of exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    lifetime event count + value total, emitted once per micro-batch.

    This is the escape hatch for semantics built-in windows can't express
    (cross-window lifetime state, custom eviction, conditional alerts).
    State is one tiny row per user key, partitioned by the groupBy — memory
    scales with distinct keys, never with event volume.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the whole backlog in one bounded run into a memory sink and
    return the result table (test/backfill harness; batch-parity checks)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def tws_available() -> bool:
    """Whether ``transformWithStateInPandas`` can run here: its state
    protocol speaks protobuf between the Python worker and the state
    store, so a usable ``google.protobuf`` is a hard runtime requirement
    (this container ships a broken install — the worker crashes with
    ``ImportError: cannot import name 'descriptor'``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total) via ``transformWithStateInPandas``
    — Spark 4's arbitrary-state API, the successor to
    ``applyInPandasWithState`` (:func:`stateful_user_totals` is the same
    semantics on the older API; both stay implemented because existing
    jobs migrate gradually). State is ONE ValueState tuple per user —
    typed, TTL-capable, queryable via the state store — and the
    processor emits the updated running totals for every user seen in
    the batch. Arrow-batched; state never grows with event volume.

    Requires the RocksDB state store provider AND a working protobuf
    (:func:`tws_available`); raises ImportError with the actionable gap
    otherwise — the same honest runtime-absence gate as the encrypted-PDF
    and matplotlib paths."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs a working google.protobuf "
            "(state-protocol codec); install protobuf or use "
            "stateful_user_totals (applyInPandasWithState) which has "
            "identical semantics"
        )
    import pandas as pd  # noqa: F811
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "cnt bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._state.get()
            cnt, tot = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                tot += float(pdf["value"].sum())
            self._state.update((cnt, tot))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "total_value": [tot]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )
