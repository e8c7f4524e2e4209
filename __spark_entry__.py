"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Everything delegates to the declarative registry in
``pspcz_analyzer_spark.plans`` — one entry per operator family from
SURVEY.md §2 plus the LLM-data-pipeline surface (dedup, ANN,
text analysis, sessionization).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q5_nation_revenue: scan-filter two facts, five broadcast dims, one
    fact-side shuffle — the plan shape every analysis query here follows.
    """
    from pspcz_analyzer_spark.plans import query_fns

    return query_fns()["q5_nation_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pspcz_analyzer_spark.plans import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    non-expressible ones (LSH bucketing, PCA basis) are omitted and get
    the driver's rows-only check."""
    from pspcz_analyzer_spark.plans import oracle_sqls

    return oracle_sqls()
