"""The query catalog.

Every operator family from SURVEY.md §2 is exercised by at least one named
query over the driver's testdata tables. Each entry pairs a Spark DataFrame
builder with an equivalent ANSI-SQL oracle string that DuckDB runs on the
same Parquet files; the driver hash-compares the two at sf0.01.

Registration is declarative: modules call ``register(...)`` at import time;
``all_queries()`` / ``all_oracles()`` feed ``__spark_entry__.py`` and tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the same tables; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # Import side effects populate the registry.
    from pspcz_analyzer_spark.plans import (  # noqa: F401
        documents,
        ingest,
        media,
        relational,
        text,
        tpch,
        vectors,
        voting,
        windows,
    )


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
