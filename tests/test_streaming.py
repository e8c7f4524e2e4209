"""Streaming-vs-batch parity: every streaming aggregation drained with
availableNow must equal its registered batch twin on the same events data.
This is the correctness chain: DuckDB oracle -> batch twin -> stream."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
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


def test_late_drops_query_live_parity(spark):
    """r11: the oracle-paired events_stream_late_drops query replays 20%
    of events one filler-trigger late and must equal the batch twin that
    keeps exactly what a correct watermark keeps — and must NOT equal
    the no-watermark aggregate (i.e. drops really engaged)."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.catalog import load_table

    got = query_fns()["events_stream_late_drops"](spark, SF_DIR).collect()

    ev = load_table(spark, SF_DIR, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL '749.5' SECOND")).alias("c")
    ).collect()[0]["c"]
    win = F.window("ts", "1 hour")
    kept = ev.filter(
        (F.col("event_id") % 5 != 0) | (win.end > F.lit(cutoff))
    )
    want = (
        kept.groupBy(win.start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # late drops actually happened: the stream kept fewer rows than the
    # full corpus (scale-relative — the late wave is 1/5 of events and
    # spans far below the cutoff at every sf)
    n_streamed = sum(r["n_events"] for r in got)
    n_total = ev.count()
    assert n_streamed < n_total
    assert n_streamed >= int(0.8 * n_total)  # on-time wave always kept


def test_view_purchase_stream_parity(spark, stream):
    """Stream-stream interval self-join drained with availableNow equals
    the batch interval join row-for-row (inner joins emit on arrival; no
    watermark wait)."""
    from pspcz_analyzer_spark.catalog import load_table
    from pspcz_analyzer_spark.streaming.events import view_purchase_attribution

    got = run_available_now(
        view_purchase_attribution(stream), "t_vp", output_mode="append"
    )
    ev = load_table(spark, SF_DIR, "events")
    ev.createOrReplaceTempView("t_vp_events")
    want = spark.sql("""
        SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
        FROM t_vp_events p JOIN t_vp_events v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND v.ts >= p.ts - interval 1 hour AND v.ts < p.ts
        WHERE p.event_type = 'purchase'
    """)
    cols = ("purchase_id", "view_id", "user_id")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)
    assert len(got.collect()) > 0  # non-vacuous at sf0.001


def test_nation_totals_stream_parity(spark, stream):
    """Stream-static broadcast join + complete-mode agg equals the batch
    join/agg over the drained backlog."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.catalog import load_table
    from pspcz_analyzer_spark.streaming.events import enrich_nation_totals

    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    got = run_available_now(
        enrich_nation_totals(stream, customer, nation), "t_nation"
    )
    want = (
        load_table(spark, SF_DIR, "events")
        .join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_nationkey"),
            "user_id",
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    cols = ("n_name", "n_events", "total_value")
    assert _sorted(got.collect(), *cols) == _sorted(want.collect(), *cols)


def test_stream_join_state_eviction(spark, tmp_path):
    """The watermark actually EVICTS join state across micro-batches: drain
    a 12-hour backlog one file (= one hour) per batch and assert the state
    store never holds more than the watermark+window horizon's worth of
    rows — the property that keeps stream-stream joins bounded at any
    stream length."""
    import datetime as dt

    from pspcz_analyzer_spark.streaming.events import view_purchase_attribution

    land = tmp_path / "land"
    land.mkdir()
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    n_total = 0
    for hour in range(12):
        rows = []
        for minute in range(0, 60, 10):  # 6 events/hour: alternate view/purchase
            ts = t0 + dt.timedelta(hours=hour, minutes=minute)
            etype = "view" if (minute // 10) % 2 == 0 else "purchase"
            rows.append((n_total, ts, 1, etype, 1.0, "{}"))
            n_total += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
        import shutil

        for f in (tmp_path / "stage").glob("*.parquet"):
            shutil.copy(f, land / f"h{hour:02d}.parquet")

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    joined = view_purchase_attribution(stream, window="1 hour", watermark="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    peak_state = max(
        (
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        ),
        default=0,
    )
    assert peak_state > 0  # the join did buffer state
    # Horizon = watermark (1h) + window (1h) + the in-flight hour ~= 3 of
    # 12 hours of data; without eviction state would approach n_total.
    assert peak_state <= n_total * 0.5, peak_state
    got = spark.table("t_evict")
    # Parity on the drained backlog proves eviction never dropped a
    # joinable row: every purchase matches its preceding in-window views.
    ev = spark.read.parquet(str(land))
    ev.createOrReplaceTempView("t_evict_events")
    want_n = spark.sql("""
        SELECT count(*) FROM t_evict_events p JOIN t_evict_events v
          ON v.user_id = p.user_id AND v.event_type = 'view'
         AND v.ts >= p.ts - interval 1 hour AND v.ts < p.ts
        WHERE p.event_type = 'purchase'
    """).collect()[0][0]
    assert got.count() == want_n


def test_dedupe_stream(spark, stream):
    got = run_available_now(
        dedupe_stream(stream, keys=["user_id"]), "t_dedupe", output_mode="append"
    )
    from pspcz_analyzer_spark.catalog import load_table

    distinct_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert got.count() == distinct_users


def test_stateful_checkpoint_recovery(spark, tmp_path):
    """Lifetime state survives a stop/restart from the same checkpoint:
    run availableNow over batch 1, stop, land batch 2, restart — the
    second run must resume source offsets AND the per-user state store,
    so a user spanning both batches emits CUMULATIVE totals, and the
    latest row per user equals the batch twin over the full backlog."""
    import datetime as dt
    import shutil

    from pspcz_analyzer_spark.streaming.events import stateful_user_totals

    land = tmp_path / "land"
    land.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = "event_id long, ts timestamp, user_id long, value double"

    def land_batch(name, rows):
        stage = tmp_path / "stage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        for f in stage.glob("*.parquet"):
            shutil.copy(f, land / f"{name}.parquet")

    out = tmp_path / "out"

    def drain():
        # File sink, not memory: only fault-tolerant sinks support
        # restarting from a checkpoint. Rows APPEND across runs; the
        # latest row per user (max n_events — monotone) is the current
        # total.
        stream = spark.readStream.schema(schema).parquet(str(land))
        q = (
            stateful_user_totals(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(str(out)).collect()
        latest = {}
        for r in rows:
            cur = latest.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                latest[r.user_id] = (r.n_events, r.total_value)
        return rows, latest

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    land_batch("b1", [(1, t0, 1, 1.0), (2, t0, 1, 2.0), (3, t0, 2, 3.0)])
    rows1, latest1 = drain()
    assert latest1 == {1: (2, 3.0), 2: (1, 3.0)}

    land_batch("b2", [(4, t0, 1, 4.0), (5, t0, 3, 5.0)])
    rows2, latest2 = drain()
    # User 1 spans both batches: cumulative (3 events, 1+2+4 = 7.0), not
    # (1, 4.0)
    # — the state store was recovered, not rebuilt. User 2 emitted no new
    # row (so source offsets advanced past b1 too: run 2 saw only b2).
    run2_rows = {
        (r.user_id, r.n_events, r.total_value)
        for r in rows2
        if (r.user_id, r.n_events, r.total_value)
        not in {(q.user_id, q.n_events, q.total_value) for q in rows1}
    }
    assert run2_rows == {(1, 3, 7.0), (3, 1, 5.0)}
    # Latest-per-user equals the batch twin over the full backlog.
    assert latest2 == {1: (3, 7.0), 2: (1, 3.0), 3: (1, 5.0)}


class TestStreamIncrementalAgg:
    def test_summary_tracks_backlog_and_survives_replay(self, spark, tmp_path):
        """Two landing drops -> summary equals a full recompute after each
        drain; a manually replayed batch (same marker) is a no-op, so
        at-least-once delivery converges to exactly-once totals."""
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.jobs import merge_incremental_agg
        from pspcz_analyzer_spark.streaming.aggregates import stream_incremental_agg

        landing = str(tmp_path / "landing")
        summary = str(tmp_path / "summary")
        ckpt = str(tmp_path / "ckpt")
        schema = "k long, v double"

        b1 = spark.range(600).select((F.col("id") % 5).alias("k"), (F.col("id") * 1.0).alias("v"))
        b1.coalesce(1).write.mode("append").parquet(landing)
        n1 = stream_incremental_agg(spark, landing, schema, summary, ckpt, ["k"], ["v"])
        assert n1 >= 1

        def totals():
            return {
                r["k"]: (r["sum_v"], r["cnt"])
                for r in spark.read.parquet(summary).collect()
            }

        def want(df):
            return {
                r["k"]: (r["sum_v"], r["cnt"])
                for r in df.groupBy("k")
                .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("cnt"))
                .collect()
            }

        assert totals() == want(b1)

        b2 = spark.range(600, 1000).select((F.col("id") % 5).alias("k"), (F.col("id") * 1.0).alias("v"))
        b2.coalesce(1).write.mode("append").parquet(landing)
        stream_incremental_agg(spark, landing, schema, summary, ckpt, ["k"], ["v"])
        assert totals() == want(b1.unionByName(b2))

        # Replay: re-merging a batch under an ALREADY-COMMITTED marker must
        # be refused by the caller-side check the stream wrapper uses.
        from pspcz_analyzer_spark.jobs import has_applied_marker

        assert has_applied_marker(summary, "batch_0")
        before = totals()
        if not has_applied_marker(summary, "batch_0"):  # the wrapper's guard
            merge_incremental_agg(spark, summary, b1, ["k"], ["v"], applied_marker="batch_0")
        assert totals() == before

        # A fresh drain with nothing new applies zero batches.
        assert stream_incremental_agg(
            spark, landing, schema, summary, ckpt, ["k"], ["v"]
        ) == 0


def test_tws_twin_matches_batch_or_gates_honestly(spark, tmp_path):
    """transformWithStateInPandas twin (Spark 4 arbitrary-state API): when
    the runtime supports it (working protobuf), the availableNow drain
    must equal the batch groupBy; otherwise the operator raises the
    documented actionable ImportError (runtime-absence gate, like the
    encrypted-PDF path)."""
    import pyspark.sql.functions as F
    import pytest

    from pspcz_analyzer_spark.streaming.events import (
        read_events_stream,
        tws_available,
        tws_user_totals,
    )

    sf_dir = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf_dir)
    if not tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            tws_user_totals(stream)
        return
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        tws_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in spark.table("t_tws_totals").collect()
    }
    from pspcz_analyzer_spark.catalog import load_table

    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert got == want


def test_outer_join_flushes_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: unmatched purchases emit null view
    rows once the watermark passes them — including the TAIL of the
    data, which needs sentinel batches (watermark for batch N comes
    from batch N-1) and needs the sentinel filter to stay OUT of the
    streaming query (a pushed-down predicate lands below the
    EventTimeWatermark node and starves the watermark)."""
    import os

    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.streaming.events import (
        _EVENTS_RAW,
        view_purchase_attribution,
    )

    landing = str(tmp_path / "outer_landing")
    import datetime as dt

    def _t(s_):
        return dt.datetime.fromisoformat(s_)

    rows = [
        # user 1: view then purchase 30 min later -> attributed
        (1, _t("2024-01-01 10:00:00"), 1, "view", 0.0, None),
        (2, _t("2024-01-01 10:30:00"), 1, "purchase", 5.0, None),
        # user 2: purchase with no view -> must emit a null row
        (3, _t("2024-01-01 10:45:00"), 2, "purchase", 7.0, None),
    ]
    df = spark.createDataFrame(rows, _EVENTS_RAW)
    df.coalesce(1).write.parquet(os.path.join(landing, "b1"))
    for i, hours in ((2, 100), (3, 101)):
        ts = _t("2024-01-01 10:00:00") + dt.timedelta(hours=hours)
        spark.createDataFrame(
            [
                (-2 * i, ts, -1, "view", 0.0, None),
                (-2 * i - 1, ts, -1, "purchase", 0.0, None),
            ],
            _EVENTS_RAW,
        ).coalesce(1).write.parquet(os.path.join(landing, f"b{i}"))
    stream = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "*"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        view_purchase_attribution(stream, how="left_outer")
        .writeStream.format("memory")
        .queryName("outer_flush_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.table("outer_flush_sink")
        .filter(F.col("user_id") >= 0)
        .collect()
    }
    assert got == {(2, 1), (3, None)}


class TestManifestCDFSource:
    def test_drain_resume_and_noop(self, spark, tmp_path):
        import shutil

        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        p = str(tmp_path / "cdf_tbl")
        out = str(tmp_path / "cdf_out")
        ck = str(tmp_path / "cdf_ck")
        spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
        M.manifest_init(p)

        def drain():
            q = (
                spark.readStream.format("manifest")
                .option("tablePath", p)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        df = spark.read.parquet(out)
        assert df.count() == 10
        assert set(df.columns) == {"id", "v", "_commit_version"}
        assert {r[0] for r in df.select("_commit_version").distinct().collect()} == {1}
        # Resume from the engine's own checkpoint: only the delta streams.
        M.append(spark.range(10, 25).selectExpr("id", "id * 2 AS v"), p)
        drain()
        df = spark.read.parquet(out)
        assert df.count() == 25 and df.select("id").distinct().count() == 25
        assert {
            r[0] for r in df.select("_commit_version").distinct().collect()
        } == {1, 2}
        # No new versions -> no-op drain, no duplicates (exactly-once).
        drain()
        assert spark.read.parquet(out).count() == 25

    def test_schema_evolution_null_fills_old_files(self, spark, tmp_path):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )
        import pyspark.sql.functions as F

        register_cdf_source(spark)
        p = str(tmp_path / "cdf_evo")
        spark.range(5).selectExpr("id").write.parquet(p)
        M.manifest_init(p)
        M.append(
            spark.range(5, 8).selectExpr("id", "'x' AS tag"),
            p,
            merge_schema=True,
        )
        sink = "cdf_evo_sink"
        q = (
            spark.readStream.format("manifest")
            .option("tablePath", p)
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        df = spark.table(sink)
        assert df.count() == 8
        assert df.filter(F.col("tag").isNull()).count() == 5  # pre-evolution
        assert df.filter(F.col("tag") == "x").count() == 3


class TestManifestStreamSink:
    def test_exactly_once_appends_and_replay_absorption(self, spark, tmp_path):
        import os

        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / "sink_tbl")
        landing = str(tmp_path / "sink_landing")
        ck = str(tmp_path / "sink_ck")
        spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) AS v").write.parquet(tbl)
        M.manifest_init(tbl)
        spark.range(10).selectExpr(
            "id", "CAST(id * 1.5 AS DOUBLE) AS v"
        ).coalesce(2).write.parquet(os.path.join(landing, "b1"))

        def drain(checkpoint):
            q = (
                spark.readStream.schema("id long, v double")
                .option("maxFilesPerTrigger", "1")
                .parquet(os.path.join(landing, "*"))
                .writeStream.format("manifest")
                .option("tablePath", tbl)
                .option("txnAppId", "t1")
                .option("checkpointLocation", checkpoint)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain(ck)
        assert M.load_manifest_table(spark, tbl).count() == 10
        assert (M.read_manifest(tbl).get("txns") or {}).get("t1") is not None
        # Second wave appends only the delta.
        spark.range(10, 30).selectExpr(
            "id", "CAST(id * 1.5 AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(os.path.join(landing, "b2"))
        drain(ck)
        got = M.load_manifest_table(spark, tbl)
        assert got.count() == 30 and got.select("id").distinct().count() == 30
        # Full replay from a FRESH checkpoint: the txn watermark absorbs
        # every replayed batch; no duplicate rows, no orphan files.
        import shutil

        shutil.rmtree(ck)
        files_before = set(M.read_manifest(tbl)["files"])
        drain(str(tmp_path / "sink_ck2"))
        assert M.load_manifest_table(spark, tbl).count() == 30
        assert set(M.read_manifest(tbl)["files"]) == files_before
        leftovers = [
            f for f in os.listdir(tbl)
            if f.startswith("dsink-") and f not in files_before
        ]
        assert not leftovers  # replay duplicates were cleaned up
        # Row accounting flowed through the sink commits.
        assert sum((M.read_manifest(tbl).get("rows") or {}).values()) == 30

    def test_sink_stages_physical_names_after_rename(self, spark, tmp_path):
        import os

        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )
        import pyarrow.parquet as pq
        import pyspark.sql.functions as F

        register_cdf_source(spark)
        tbl = str(tmp_path / "sinkr_tbl")
        landing = str(tmp_path / "sinkr_landing")
        spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS amount").write.parquet(tbl)
        M.manifest_init(tbl)
        M.rename_column(tbl, "amount", "total")
        # The stream carries the NEW logical name...
        spark.range(5, 9).selectExpr(
            "id", "CAST(id AS DOUBLE) AS total"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        q = (
            spark.readStream.schema("id long, total double")
            .parquet(os.path.join(landing, "*"))
            .writeStream.format("manifest")
            .option("tablePath", tbl)
            .option("checkpointLocation", str(tmp_path / "sinkr_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        m = M.read_manifest(tbl)
        sink_file = [f for f in m["files"] if f.startswith("dsink-")][0]
        phys = pq.ParquetFile(os.path.join(tbl, sink_file)).schema_arrow.names
        assert "amount" in phys and "total" not in phys  # physical on disk
        got = M.load_manifest_table(spark, tbl)
        assert got.columns == ["id", "total"] and got.count() == 9
        assert got.filter(F.col("id") == 7).first()["total"] == 7.0


class TestManifestBatchReader:
    def test_batch_read_and_version_as_of(self, spark, tmp_path):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )
        import pyspark.sql.functions as F

        register_cdf_source(spark)
        p = str(tmp_path / "batch_tbl")
        spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS amount").write.parquet(p)
        M.manifest_init(p)
        v1 = M.current_version(p)
        M.rename_column(p, "amount", "total")
        M.append(spark.range(10, 15).selectExpr("id", "CAST(id AS DOUBLE) AS total"), p)
        # Current snapshot: new logical name, both eras, _commit_version.
        cur = (
            spark.read.format("manifest").option("tablePath", p).load()
        )
        assert set(cur.columns) == {"id", "total", "_commit_version"}
        assert cur.count() == 15
        assert cur.filter(F.col("_commit_version") > v1).count() == 5
        # Time travel reads the OLD schema and the old snapshot.
        old = (
            spark.read.format("manifest")
            .option("tablePath", p)
            .option("versionAsOf", str(v1))
            .load()
        )
        assert set(old.columns) == {"id", "amount", "_commit_version"}
        assert old.count() == 10


class TestManifestStreamSinkValidation:
    """The stream sink must enforce the same invariants as batch append:
    CHECK constraints reject violating micro-batches BEFORE any file
    lands, and generated columns are computed (or validated) per task on
    the Arrow batches — a stream can never commit rows append() would
    have refused."""

    def _sink(self, spark, tmp_path, name, schema_expr, init_df):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / f"{name}_tbl")
        init_df.write.parquet(tbl)
        M.manifest_init(tbl)
        return M, tbl

    def _drain(self, spark, landing, tbl, ck, schema):
        q = (
            spark.readStream.schema(schema)
            .parquet(os.path.join(landing, "*"))
            .writeStream.format("manifest")
            .option("tablePath", tbl)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_constraint_violation_fails_batch_and_commits_nothing(
        self, spark, tmp_path
    ):
        M, tbl = self._sink(
            spark, tmp_path, "csink", "id long, v double",
            spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.set_constraint(spark, tbl, "v_nonneg", "v >= 0")
        landing = str(tmp_path / "c_landing")
        spark.range(5).selectExpr(
            "id", "CAST(id - 3 AS DOUBLE) AS v"  # two negatives
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        v0 = M.current_version(tbl)
        with pytest.raises(Exception, match="v_nonneg"):
            self._drain(
                spark, landing, tbl,
                str(tmp_path / "c_ck"), "id long, v double",
            )
        assert M.current_version(tbl) == v0
        assert M.load_manifest_table(spark, tbl).count() == 0
        staged = [
            f for f in os.listdir(tbl) if f.startswith("dsink-")
        ]
        assert not staged, "violating batch left staged files behind"

    def test_constraint_pass_commits(self, spark, tmp_path):
        M, tbl = self._sink(
            spark, tmp_path, "oksink", "id long, v double",
            spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.set_constraint(spark, tbl, "v_nonneg", "v >= 0")
        landing = str(tmp_path / "ok_landing")
        spark.range(5).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        self._drain(
            spark, landing, tbl, str(tmp_path / "ok_ck"), "id long, v double"
        )
        assert M.load_manifest_table(spark, tbl).count() == 5

    def test_generated_column_computed_per_batch(self, spark, tmp_path):
        M, tbl = self._sink(
            spark, tmp_path, "gsink", "id long, v double",
            spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.add_generated_column(spark, tbl, "v2", "double", "v * 2")
        landing = str(tmp_path / "g_landing")
        # Stream omits the generated column — the sink must compute it.
        spark.range(3, 6).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        self._drain(
            spark, landing, tbl, str(tmp_path / "g_ck"), "id long, v double"
        )
        t = M.load_manifest_table(spark, tbl)
        assert t.count() == 6
        got = {
            r["id"]: r["v2"] for r in t.filter(F.col("id") >= 3).collect()
        }
        assert got == {3: 6.0, 4: 8.0, 5: 10.0}

    def test_generated_column_supplied_wrong_rejected(self, spark, tmp_path):
        M, tbl = self._sink(
            spark, tmp_path, "gbad", "id long, v double",
            spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.add_generated_column(spark, tbl, "v2", "double", "v * 2")
        landing = str(tmp_path / "gbad_landing")
        spark.range(3).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v", "CAST(99 AS DOUBLE) AS v2"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        v0 = M.current_version(tbl)
        with pytest.raises(Exception, match="v2"):
            self._drain(
                spark, landing, tbl, str(tmp_path / "gbad_ck"),
                "id long, v double, v2 double",
            )
        assert M.current_version(tbl) == v0

    def test_unknown_column_rejected(self, spark, tmp_path):
        M, tbl = self._sink(
            spark, tmp_path, "usink", "id long, v double",
            spark.range(1).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        landing = str(tmp_path / "u_landing")
        spark.range(3).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v", "id AS rogue"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        with pytest.raises(Exception, match="rogue"):
            self._drain(
                spark, landing, tbl, str(tmp_path / "u_ck"),
                "id long, v double, rogue long",
            )

    def test_identity_supplied_rejected_omitted_allocates(
        self, spark, tmp_path
    ):
        M, tbl = self._sink(
            spark, tmp_path, "isink", "id long, v double",
            spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.add_identity_column(tbl, "uid")
        landing = str(tmp_path / "i_landing")
        spark.range(3, 5).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v", "id AS uid"
        ).coalesce(1).write.parquet(os.path.join(landing, "bad"))
        v0 = M.current_version(tbl)
        with pytest.raises(Exception, match="GENERATED"):
            self._drain(
                spark, landing, tbl, str(tmp_path / "i_ck1"),
                "id long, v double, uid long",
            )
        assert M.current_version(tbl) == v0
        # Omitting the column: the sink commits and identity allocates
        # metadata-only at the commit (contiguous continuation).
        landing2 = str(tmp_path / "i_landing2")
        spark.range(3, 5).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(os.path.join(landing2, "b1"))
        self._drain(
            spark, landing2, tbl, str(tmp_path / "i_ck2"), "id long, v double"
        )
        t = M.load_manifest_table(spark, tbl)
        got = sorted(r[0] for r in t.select("uid").collect())
        assert got == [1, 2, 3, 4, 5]

    def test_write_default_fills_omitted_column(self, spark, tmp_path):
        M, tbl = self._sink(
            spark, tmp_path, "dsinkd", "id long, v double",
            spark.range(2).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        )
        M.add_column(
            tbl, "src", "string",
            initial_default="'old'", write_default="'stream'",
        )
        landing = str(tmp_path / "d_landing")
        spark.range(2, 5).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        self._drain(
            spark, landing, tbl, str(tmp_path / "d_ck"), "id long, v double"
        )
        t = M.load_manifest_table(spark, tbl)
        assert t.filter(F.col("src") == "stream").count() == 3
        assert t.filter(F.col("src") == "old").count() == 2


class TestMidStreamSchemaChange:
    """A version whose schema no longer matches the stream's pinned one
    must fail the stream loudly (Delta's restart rule) — never emit
    shape-mismatched batches. A RESTARTED stream re-pins and resumes
    from the checkpointed offset."""

    def test_reader_refuses_changed_schema_mid_stream(self, spark, tmp_path):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            ManifestCDFStreamReader,
            ManifestRowCDFStreamReader,
        )

        tbl = str(tmp_path / "mss_tbl")
        spark.range(3).select(F.col("id").alias("k")).coalesce(
            1
        ).write.parquet(tbl)
        M.manifest_init(tbl)
        M.add_column(tbl, "tag", "string")
        M.append(
            spark.createDataFrame([(10, "x")], "k long, tag string"), tbl
        )
        # a stream pinned at the PRE-change schema sees the new version
        r = ManifestCDFStreamReader(tbl, 0, ["k", "_commit_version"])
        with pytest.raises(RuntimeError, match="changed mid-stream"):
            r.partitions({"version": 1}, {"version": 3})
        rc = ManifestRowCDFStreamReader(
            tbl, 0, ["k", "_change_type", "_commit_version"]
        )
        with pytest.raises(RuntimeError, match="changed mid-stream"):
            rc.partitions({"version": 1}, {"version": 3})
        # a reader pinned at the CURRENT schema proceeds
        r2 = ManifestCDFStreamReader(tbl, 0, ["k", "tag", "_commit_version"])
        assert r2.partitions({"version": 2}, {"version": 3})


class TestSourceFeatureParity:
    """The manifest DataSource (batch + streams) must read defaults and
    identity columns exactly like load_manifest_table — a pipeline fed
    by the stream and one fed by the table must agree row-for-row."""

    def test_batch_source_applies_defaults_and_identity(self, spark, tmp_path):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / "fp_tbl")
        spark.range(5).select(F.col("id").alias("k")).coalesce(
            1
        ).write.parquet(tbl)
        M.manifest_init(tbl)
        M.add_column(
            tbl, "src", "string",
            initial_default="'old'", write_default="'new'",
        )
        M.add_identity_column(tbl, "uid", start=100, step=2)
        M.append(
            spark.range(50, 53).select(F.col("id").alias("k")), tbl
        )
        expected = {
            (r["k"], r["src"], r["uid"])
            for r in M.load_manifest_table(spark, tbl).collect()
        }
        got = {
            (r["k"], r["src"], r["uid"])
            for r in spark.read.format("manifest")
            .option("tablePath", tbl)
            .load()
            .collect()
        }
        assert got == expected
        assert {r[1] for r in got} == {"old", "new"}
        assert sorted(r[2] for r in got) == [100 + 2 * i for i in range(8)]

    def test_cdf_stream_applies_features_on_synthesized_inserts(
        self, spark, tmp_path
    ):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / "fs_tbl")
        spark.range(3).select(F.col("id").alias("k")).coalesce(
            1
        ).write.parquet(tbl)
        M.manifest_init(tbl)
        M.add_column(tbl, "src", "string", initial_default="'old'")
        M.add_identity_column(tbl, "uid")
        out = str(tmp_path / "fs_out")
        q = (
            spark.readStream.format("manifest")
            .option("tablePath", tbl)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "fs_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(out)
        assert got.filter(F.col("src") == "old").count() == 3
        assert sorted(r[0] for r in got.select("uid").collect()) == [1, 2, 3]

    def test_cdf_stream_restores_hive_partition_values(
        self, spark, tmp_path
    ):
        """Round-8: streaming a hive-adopted table must restore the
        partition columns from the recorded directory tokens (they are
        null in the bytes), mirroring the batch reader's pfill."""
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / "hive_stream_tbl")
        spark.range(90).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("day")
        ).write.partitionBy("day").parquet(tbl)
        M.convert_to_manifest(tbl)
        out = str(tmp_path / "hive_stream_out")
        q = (
            spark.readStream.format("manifest")
            .option("tablePath", tbl)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "hive_stream_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(out)
        assert got.count() == 90
        assert got.filter(F.col("day").isNull()).count() == 0
        per = {
            r["day"]: r["n"]
            for r in got.groupBy("day").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert per == {0: 30, 1: 30, 2: 30}


class TestRowCDFStream:
    """Streaming row-level change feed (readChanges=true): DML commits
    arrive as typed change rows, appends as synthesized inserts, and
    offsets (table versions) live in the engine's checkpoint so a second
    drain picks up only the delta."""

    def test_stream_serves_dml_changes_exactly_once(self, spark, tmp_path):
        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.streaming.cdf_source import (
            register_cdf_source,
        )

        register_cdf_source(spark)
        tbl = str(tmp_path / "rowcdf_tbl")
        ck = str(tmp_path / "rowcdf_ck")
        spark.range(100).selectExpr(
            "id AS k", "CAST(id % 7 AS DOUBLE) AS v"
        ).coalesce(2).write.parquet(tbl)
        M.manifest_init(tbl, stat_cols=["k"])
        M.enable_cdf(tbl)
        start_v = M.current_version(tbl)
        M.delete_where(spark, tbl, "k < 10")
        M.update_where(spark, tbl, "k >= 95", {"v": "v + 100"})

        out = str(tmp_path / "rowcdf_out")

        def drain():
            q = (
                spark.readStream.format("manifest")
                .option("tablePath", tbl)
                .option("startVersion", str(start_v))
                .option("readChanges", "true")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        got = spark.read.parquet(out)
        by_type = {
            r["_change_type"]: r["n"]
            for r in got.groupBy("_change_type").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert by_type == {
            "delete": 10, "update_preimage": 5, "update_postimage": 5
        }
        # second wave: plain append -> synthesized inserts, delta only
        M.append(
            spark.range(200, 203).selectExpr(
                "id AS k", "CAST(0 AS DOUBLE) AS v"
            ),
            tbl,
        )
        drain()
        got = spark.read.parquet(out)
        ins = got.filter("_change_type = 'insert'").collect()
        assert {r["k"] for r in ins} == {200, 201, 202}
        assert got.count() == 23  # 20 + 3, nothing replayed
