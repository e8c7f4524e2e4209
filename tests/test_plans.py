"""Registry + plan-shape tests.

Beyond row correctness (tools/check_correctness.py covers that against
DuckDB), assert the *plans* are the ones we want at scale: dims broadcast,
filters pushed into the Parquet scan, no nested-loop joins in hot paths.
"""

from __future__ import annotations

import duckdb
import pytest

from pspcz_analyzer_spark.plans import all_queries, oracle_sqls, query_fns

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRegistry:
    def test_catalog_loads(self):
        qs = all_queries()
        assert len(qs) >= 44

    def test_every_query_has_fn(self):
        for name, fn in query_fns().items():
            assert callable(fn), name

    def test_oracle_coverage(self):
        qs, os_ = query_fns(), oracle_sqls()
        missing = set(qs) - set(os_)
        # Only genuinely non-SQL-expressible queries may omit oracles.
        assert missing <= {"ann_lsh_pairs", "mp_pca_coords"}, missing

    def test_oracles_bind_in_duckdb(self):
        """Every oracle must at least bind/plan on the real tables (the
        round-1 failure mode: lateral range() unsupported by DuckDB 1.0)."""
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        for name, sql in oracle_sqls().items():
            con.execute(f"EXPLAIN {sql}")  # binder + planner, no execution


@pytest.mark.parametrize(
    "qname",
    ["q5_nation_revenue", "loyalty_rebellion_rates", "mp_vote_similarity",
     "attendance_rates", "events_sessionized"],
)
def test_no_nested_loop_joins(spark, qname):
    plan = _plan(query_fns()[qname](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, qname
    assert "CartesianProduct" not in plan, qname


def test_q6_filter_pushdown(spark):
    """q6's date/discount/quantity predicates must reach the Parquet scan."""
    plan = _plan(query_fns()["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed into the lineitem scan"


def test_q5_broadcasts_dims(spark):
    plan = _plan(query_fns()["q5_nation_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_column_pruning_reaches_scan(spark):
    """A two-column projection must not scan all lineitem columns."""
    plan = _plan(query_fns()["order_lines_nested"](spark, SF_DIR))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "l_orderkey" in scan[0]
    assert "l_extendedprice" not in scan[0]


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["n_name", "revenue"]
