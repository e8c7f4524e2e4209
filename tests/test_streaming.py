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


def test_dedupe_stream(spark, stream):
    got = run_available_now(
        dedupe_stream(stream, keys=["user_id"]), "t_dedupe", output_mode="append"
    )
    from pspcz_analyzer_spark.catalog import load_table

    distinct_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert got.count() == distinct_users
