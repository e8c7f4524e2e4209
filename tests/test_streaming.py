"""Streaming-vs-batch parity: every streaming aggregation drained with
availableNow must equal its registered batch twin on the same events data.
This is the correctness chain: DuckDB oracle -> batch twin -> stream."""

from __future__ import annotations

import pytest

from pspcz_analyzer_spark.plans import query_fns
from pspcz_analyzer_spark.streaming.events import (
    dedupe_stream,
    read_events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _sorted(rows, *keys):
    return sorted((tuple(r[k] for k in keys) for r in rows))


@pytest.fixture(scope="module")
def stream(spark):
    return read_events_stream(spark, SF_DIR)


def test_stream_schema(stream):
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert stream.isStreaming


def test_tumbling_parity(spark, stream):
    got = run_available_now(tumbling_counts(stream), "t_tumbling")
    want = query_fns()["events_tumbling_1h"](spark, SF_DIR)
    cols = ("window_start", "n_events", "total_value")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)


def test_sliding_parity(spark, stream):
    got = run_available_now(sliding_counts(stream), "t_sliding")
    want = query_fns()["events_sliding_1h_30m"](spark, SF_DIR)
    cols = ("window_start", "n_events", "total_value")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)


def test_session_parity(spark, stream):
    got = run_available_now(session_counts(stream), "t_session")
    want = query_fns()["events_session_window_10m"](spark, SF_DIR)
    cols = ("user_id", "session_start", "session_end", "n_events")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)


def test_stateful_user_totals_parity(spark, stream):
    """applyInPandasWithState lifetime totals == batch groupBy on a
    fully-drained backlog."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.catalog import load_table
    from pspcz_analyzer_spark.streaming.events import stateful_user_totals

    got = run_available_now(
        stateful_user_totals(stream), "t_stateful", output_mode="append"
    )
    want = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    cols = ("user_id", "n_events", "total_value")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)


def test_watermark_drops_late_data(spark, tmp_path):
    """Real late-data semantics across micro-batches: an event arriving in
    batch 2 whose timestamp is older than (max event time - watermark) must
    NOT update its (already finalizable) window, while an in-horizon event
    must. This is behavior availableNow single-batch runs can't show."""
    import datetime as dt
    import time

    import pyspark.sql.functions as F

    land = tmp_path / "land"
    land.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage" / name))
        import shutil

        for f in (tmp_path / "stage" / name).glob("*.parquet"):
            shutil.copy(f, land / f"{name}.parquet")

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)

    write_batch("b1", [
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(hours=3), 1, 1.0),  # advances watermark to ~1h
    ])
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .parquet(str(land))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) from t_late").collect()[0][0] >= 2:
                break
            time.sleep(0.5)
        # Batch 2: one LATE event (t0 window, far behind watermark) and one
        # fresh event inside the horizon.
        write_batch("b2", [
            (3, t0, 2, 1.0),                              # late -> dropped
            (4, t0 + dt.timedelta(hours=3, minutes=5), 2, 1.0),  # on time
        ])
        deadline = time.time() + 60
        fresh_n = None
        while time.time() < deadline:
            rows = {r["ws"]: r["n"] for r in spark.sql("select * from t_late").collect()}
            fresh_n = rows.get(t0 + dt.timedelta(hours=3))
            if fresh_n == 2:
                break
            time.sleep(0.5)
        rows = {r["ws"]: r["n"] for r in spark.sql("select * from t_late").collect()}
        assert rows[t0 + dt.timedelta(hours=3)] == 2  # on-time event counted
        assert rows[t0] == 1  # late event NOT added to the old window
    finally:
        q.stop()


def test_dedupe_stream(spark, stream):
    got = run_available_now(
        dedupe_stream(stream, keys=["user_id"]), "t_dedupe", output_mode="append"
    )
    from pspcz_analyzer_spark.catalog import load_table

    distinct_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert got.count() == distinct_users
