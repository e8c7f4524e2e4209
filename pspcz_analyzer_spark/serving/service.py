"""Query facade over a long-lived SparkSession (SURVEY §3.1 lifecycle).

The reference's route layer resolves params, checks a TTL cache, and runs
the Polars compute in a pool
(/root/reference/pspcz_analyzer/routes/voting.py:23-45). Here step 5 is a
lazy Spark plan; the facade collects the (small) result to row dicts at the
serving edge only — operators themselves never collect. The TTL cache
absorbs repeats; a data refresh calls ``invalidate()``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from pspcz_analyzer_spark.operators import voting as V
from pspcz_analyzer_spark.plans import query_fns
from pspcz_analyzer_spark.plans.voting import (
    derive_mp_info,
    derive_mp_votes,
    derive_void_votes,
)
from pspcz_analyzer_spark.serving.cache import TTLCache

Rows = list[dict[str, Any]]


class QueryService:
    def __init__(
        self, spark: SparkSession, sf_dir: str, ttl_seconds: float = 3600.0, clock=None
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        kwargs = {"clock": clock} if clock else {}
        self.cache = TTLCache(ttl_seconds, **kwargs)
        self.compute_calls = 0  # observability: cache-miss counter

    def _cached(self, key: str, df_fn) -> Rows:
        def compute() -> Rows:
            self.compute_calls += 1
            return [r.asDict(recursive=True) for r in df_fn().collect()]

        return self.cache.get_or_compute(key, compute)

    # -- analysis endpoints (route semantics of routes/voting.py) --

    def loyalty(self, top: int | None = 30, party: str | None = None) -> Rows:
        key = f"loyalty:{self.sf_dir}:{top}:{party}"
        return self._cached(
            key,
            lambda: V.loyalty(
                derive_mp_votes(self.spark, self.sf_dir),
                derive_void_votes(self.spark, self.sf_dir),
                derive_mp_info(self.spark, self.sf_dir),
                top=top,
                party_filter=party,
            ),
        )

    def attendance(
        self, sort: str = "worst", top: int | None = 30, party: str | None = None
    ) -> Rows:
        key = f"attendance:{self.sf_dir}:{sort}:{top}:{party}"
        return self._cached(
            key,
            lambda: V.attendance(
                derive_mp_votes(self.spark, self.sf_dir),
                derive_void_votes(self.spark, self.sf_dir),
                derive_mp_info(self.spark, self.sf_dir),
                top=top,
                sort=sort,
                party_filter=party,
            ),
        )

    def query(self, name: str) -> Rows:
        """Any registered catalog query by name (the generic endpoint)."""
        fns = query_fns()
        if name not in fns:
            raise KeyError(f"unknown query: {name}")
        return self._cached(
            f"query:{self.sf_dir}:{name}", lambda: fns[name](self.spark, self.sf_dir)
        )

    def sql(self, query: str, max_rows: int = 10_000) -> Rows:
        """Raw SQL over the registered testdata views (spark.sql) — the
        escape hatch for users who query with SQL strings rather than the
        named catalog. Views register lazily once per service; results cap
        at ``max_rows`` so an unbounded SELECT cannot flood the driver."""
        from pspcz_analyzer_spark.catalog import register_views

        if not getattr(self, "_views_ready", False):
            register_views(self.spark, self.sf_dir)
            self._views_ready = True
        df = self.spark.sql(query).limit(max_rows)
        return [r.asDict(recursive=True) for r in df.collect()]

    def invalidate(self, prefix: str = "") -> int:
        """Data-refresh hook: drop cached results (optionally by prefix)."""
        if prefix:
            return self.cache.invalidate_prefix(prefix)
        self.cache.clear()
        return -1
