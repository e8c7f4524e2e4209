"""Pagination + top-k tests, including the keyset path and its pushed
predicate (the at-scale pagination pattern)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.operators.pagination import page_keyset, page_offset, top_k


def _df(spark):
    return spark.createDataFrame([(i,) for i in range(1, 101)], "id long")


def test_top_k(spark):
    rows = top_k(_df(spark), [F.col("id").desc()], 3).collect()
    assert [r["id"] for r in rows] == [100, 99, 98]


def test_top_k_uses_take_ordered(spark):
    plan = top_k(_df(spark), [F.col("id").desc()], 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_page_offset_boundaries(spark):
    page2 = page_offset(_df(spark), [F.col("id").asc()], page=2, per_page=10).collect()
    assert [r["id"] for r in page2] == list(range(11, 21))
    last = page_offset(_df(spark), [F.col("id").asc()], page=10, per_page=10).collect()
    assert [r["id"] for r in last] == list(range(91, 101))
    beyond = page_offset(_df(spark), [F.col("id").asc()], page=11, per_page=10).collect()
    assert beyond == []


def test_keyset_continuation(spark):
    first = page_keyset(_df(spark), "id", per_page=10).collect()
    assert [r["id"] for r in first] == list(range(100, 90, -1))
    nxt = page_keyset(_df(spark), "id", per_page=10, after=first[-1]["id"]).collect()
    assert [r["id"] for r in nxt] == list(range(90, 80, -1))


def test_keyset_ascending(spark):
    asc = page_keyset(_df(spark), "id", per_page=5, after=95, descending=False).collect()
    assert [r["id"] for r in asc] == [96, 97, 98, 99, 100]
