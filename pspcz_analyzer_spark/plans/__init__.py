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
    priority: int = 100  # lower = earlier in all_queries() iteration order


_REGISTRY: dict[str, Query] = {}

# Verification harnesses that budget a fixed number of queries consume the
# registry in iteration order, so ordering is part of the public contract.
# Round-4 rotation: the driver re-attests 50 queries per round against
# freshly regenerated testdata, so the budget goes to the queries with the
# WEAKEST current attestation. Tiers (lower first):
#   10 = sentinels — regression canaries (kept from the r03-green core) plus
#        any query whose plan changed this round and must re-attest;
#   15 = never driver-attested in ANY round (oracle exists, only local gate
#        runs have checked them);
#   18 = NEW THIS ROUND (set via register(priority=18) at the definition,
#        not in this map) — brand-new operators attest before stale ones;
#   20 = r02-green but not re-checked since (testdata regenerated twice and
#        code evolved — r02 rows are stale attestation);
#   52 = rows-only by design (no oracle possible: LSH/IVF results are
#        approximation-defined, PCA basis signs impl-defined, HLL
#        estimates); each has an oracle-paired anchor at tier <= 20
#        (minhash_lsh_exact_recall / ann_lsh_exact_recall for LSH banding,
#        ann_ivf_exhaustive_top10 for the IVF index, mp_vote_similarity for
#        the vote-matrix encoding PCA consumes, doc_vocab_exact for the
#        vocabulary scan), so a driver slot on them would be wasted;
#   55 = r02-green queue — next in line if the budget ever grows;
#   60 = r03-green (current-round driver attestation; yield their slots).
PRIORITY_SENTINEL = 10
PRIORITY_NEVER_ATTESTED = 15
PRIORITY_R02_STALE = 20
PRIORITY_ROWS_ONLY = 52
PRIORITY_R02_QUEUE = 55
PRIORITY_ATTESTED_R03 = 60

_PRIORITY: dict[str, int] = {
    # Sentinels: two untouched canaries + the two pagination composites whose
    # total-hit count was reworked this round (window -> broadcast scalar).
    **{
        n: PRIORITY_SENTINEL
        for n in (
            "q5_nation_revenue",
            "loyalty_rebellion_rates",
            "laws_listing_page",
        )
    },
    # Never attested by the driver in any round (r02 errs, budget cutoffs,
    # round-3 additions past slot 50). Includes the round-3 TPC-H tail, the
    # corpus-prep tail, the streaming twins, and the trailing-24h window
    # whose frame precision was fixed this round.
    **{
        n: PRIORITY_NEVER_ATTESTED
        for n in (
            "q8_market_share",
            "q9_product_profit",
            "q11_important_stock",
            "q15_top_supplier",
            "q16_supplier_count",
            "q17_small_qty_revenue",
            "q20_part_promotion",
            "q21_waiting_supplier",
            "q22_global_sales",
            "corpus_train_split",
            "corpus_lang_sample_exact",
            "corpus_pii_redacted",
            "corpus_source_cap",
            "doc_top_terms_by_lang",
            "doc_repetition_stats",
            "events_hot_users",
            "events_session_dynamic_gap",
            "events_trailing_24h",
            "events_rollup_hourly_daily",
            "events_stream_user_totals",
            "events_stream_nation_totals",
            "ann_lsh_exact_recall",
            "profile_orders_columns",
            "salted_join_priority_revenue",
        )
    },
    # Variant twins whose shared machinery is attested by a tier-15
    # sibling (corpus_lang_sample_exact, doc_top_terms_by_lang,
    # asof_latest_order_before_event r03-green): next in line behind the
    # 50-slot budget, making room for this round's new operators.
    **{
        n: 19
        for n in (
            "corpus_lang_sample",
            "doc_top_terms",
            "asof_next_order_after_event",
            # Subsumed by doc_duplicate_spans_removed (same window/dup-set
            # machinery, and the removed-text check additionally pins the
            # exact window starts).
            "doc_duplicate_spans",
        )
    },
    # r02-green but stale (checked two testdata generations ago). The 20
    # with the most operator-family coverage take the remaining budget
    # slots; the rest queue at PRIORITY_R02_QUEUE.
    **{
        n: PRIORITY_R02_STALE
        for n in (
            "fuzzy_match_supplier_customer",
            "top3_orders_per_customer",
            "latest_order_per_customer",
            "doc_search_normalized",
            "docs_browser_page",
            "doc_token_stats",
            "doc_fingerprints",
            "law_refs_extracted",
            "parquet_overwrite_roundtrip",
            "parquet_partitioned_prune",
            "parquet_upsert_resume",
            "media_binary_stats",
            "media_image_features",
            "media_frame_sample",
            "vote_number_resolution",
            "orders_keyset_page",
            "prefix_match_parts",
            "customer_display_names",
            "orders_by_month",
            "docs_by_source_stats",
        )
    },
    # Rows-only by design (see tier note above).
    **{
        n: PRIORITY_ROWS_ONLY
        for n in (
            "ann_lsh_pairs",
            "ann_ivf_top10",
            "mp_pca_coords",
            "doc_vocab_approx",
        )
    },
    # r02-green queue: next in line behind the budget.
    **{
        n: PRIORITY_R02_QUEUE
        for n in (
            "doc_quality_scores",
            "exact_dedup_survivors",
            "minhash_lsh_exact_recall",
            "simhash_dup_pairs",
            "doc_language_id",
            "steno_crossval_letters",
            "doc_topics_enriched",
            "steno_parse_votes",
            "near_dup_jaccard",
            "anti_join_customers_without_orders",
            "semi_join_customers_with_1997_orders",
            "orders_page3",
            "nation_pairs_same_region",
            "pivot_status_by_priority",
            "point_lookup_order",
            "distinct_status_priority",
            "except_building_without_bigspenders",
            "rollup_priority_status",
            "cube_status_priority",
        )
    },
}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    priority: int = 100,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
            priority=priority,
        )
        return fn

    return deco


def _load_all() -> None:
    # Import side effects populate the registry.
    from pspcz_analyzer_spark.plans import (  # noqa: F401
        behavior,
        corpus,
        documents,
        ingest,
        media,
        relational,
        text,
        tpch,
        tpch_full,
        vectors,
        voting,
        windows,
    )


def all_queries() -> dict[str, Query]:
    """Registry sorted by (priority, registration order) — stable."""
    _load_all()
    order = {name: i for i, name in enumerate(_REGISTRY)}
    return {
        q.name: q
        for q in sorted(
            _REGISTRY.values(),
            key=lambda q: (_PRIORITY.get(q.name, q.priority), order[q.name]),
        )
    }


def _with_runtime_confs(fn: QueryFn) -> QueryFn:
    """Contract-boundary shim: apply the runtime-settable confs every query
    needs (UTC session zone, legacy nanos/charset reads) before the plan is
    built, idempotently. This is the ONE place session state is touched, so
    plan/operator bodies stay mutation-free and results never depend on
    which query a vanilla-session caller (the driver, the local gate) ran
    first."""
    import functools

    from pspcz_analyzer_spark.session import ensure_runtime_confs

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_runtime_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def query_fns() -> dict[str, QueryFn]:
    return {name: _with_runtime_confs(q.fn) for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
