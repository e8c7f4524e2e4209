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
# Round-5 rotation: the driver re-attests 50 queries per round against
# freshly regenerated testdata, so the budget goes to the queries with the
# WEAKEST current attestation. Tiers (lower first):
#   10 = sentinels — the r04 red row (parquet_compact_roundtrip, oracle
#        typing fixed this round), every query whose PLAN changed this
#        round (span-dedup persist, range_join degenerate-interval guard),
#        and two untouched canaries;
#   15 = never driver-attested in ANY round (oracle exists, only local
#        gate runs have checked them) — the last three of the catalog;
#   18 = NEW THIS ROUND (set via register(priority=18) at the definition,
#        not in this map) — brand-new operators attest before stale ones;
#   20 = r02-green but not re-checked since (testdata regenerated and code
#        evolved — r02 rows are stale attestation);
#   25 = r02-green queue promoted into the budget this round (the former
#        tier 55; with the r03/r04 cohorts yielding their slots the whole
#        queue now fits);
#   52 = rows-only by design (no oracle possible: LSH/IVF results are
#        approximation-defined, PCA basis signs impl-defined, HLL
#        estimates); each has an oracle-paired anchor at a lower tier
#        (minhash_lsh_exact_recall / ann_lsh_exact_recall for LSH banding,
#        ann_ivf_exhaustive_top10 for the IVF index, mp_vote_similarity for
#        the vote-matrix encoding PCA consumes, doc_vocab_exact for the
#        vocabulary scan), so a driver slot on them would be wasted;
#   60 = r03-green, 62 = r04-green (most recent attestation yields first).
PRIORITY_SENTINEL = 10
PRIORITY_NEVER_ATTESTED = 15
PRIORITY_R02_STALE = 20
PRIORITY_R02_QUEUE = 25
PRIORITY_ROWS_ONLY = 52
PRIORITY_ATTESTED_R03 = 60
PRIORITY_ATTESTED_R04 = 62

_PRIORITY: dict[str, int] = {
    # Sentinels: the fixed r04 red row, the plan-changed queries, and two
    # untouched canaries.
    **{
        n: PRIORITY_SENTINEL
        for n in (
            # r04's ONLY red row: rows/schema matched, the value hash
            # tripped on DuckDB HUGEINT vs Spark BIGINT for sum(int); the
            # oracle now casts. Must re-attest green.
            "parquet_compact_roundtrip",
            # Span-dedup window stream now persisted (one corpus scan);
            # same results, changed plan => re-attest both consumers.
            "doc_duplicate_spans",
            "doc_duplicate_spans_removed",
            # range_join gained the degenerate-interval filter and the
            # max_cells guard => plan changed.
            "events_range_join_windows",
            # Untouched canaries.
            "q5_nation_revenue",
            "loyalty_rebellion_rates",
        )
    },
    # The last never-driver-attested oracle-bearing queries (variant twins
    # whose shared machinery is r03/r04-green via a sibling, promoted now
    # that the budget has room): a green row here completes the catalog —
    # every oracle-bearing query attested in some round.
    **{
        n: PRIORITY_NEVER_ATTESTED
        for n in (
            "corpus_lang_sample",
            "doc_top_terms",
            "asof_next_order_after_event",
        )
    },
    # r02-green but stale (checked two testdata generations ago).
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
    # r02-green queue, promoted into the budget this round.
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
    # r03-green cohort: attested one round ago, yield to staler rows.
    **{
        n: PRIORITY_ATTESTED_R03
        for n in (
            "unl_roundtrip_nation",
            "json_nested_roundtrip",
            "pdf_letters_parse",
            "order_lines_nested",
            "asof_latest_order_before_event",
            "asof_cascade",
        )
    },
    # r04-green cohort (CORRECTNESS_r04.json): freshest attestation, last
    # in line. Overrides the inline register(priority=18) of the round-4
    # additions so they stop consuming budget.
    **{
        n: PRIORITY_ATTESTED_R04
        for n in (
            "laws_listing_page",
            "corpus_train_split",
            "doc_repetition_stats",
            "corpus_pii_redacted",
            "corpus_source_cap",
            "corpus_lang_sample_exact",
            "doc_top_terms_by_lang",
            "profile_orders_columns",
            "events_hot_users",
            "salted_join_priority_revenue",
            "q8_market_share",
            "q9_product_profit",
            "q11_important_stock",
            "q15_top_supplier",
            "q16_supplier_count",
            "q17_small_qty_revenue",
            "q20_part_promotion",
            "q21_waiting_supplier",
            "q22_global_sales",
            "ann_lsh_exact_recall",
            "events_session_dynamic_gap",
            "events_trailing_24h",
            "events_rollup_hourly_daily",
            "events_stream_user_totals",
            "events_stream_nation_totals",
            "events_funnel",
            "events_retention_cohorts",
            "doc_bm25_topk",
            "doc_html_strip_roundtrip",
            "corpus_remove_boilerplate",
            "corpus_shuffle_order",
            "corpus_temperature_mix",
            "corpus_quality_calibrated",
            "corpus_extend_near_dup",
            "corpus_chunk_windows",
            "doc_lm_perplexity",
            "corpus_weighted_sample",
            "doc_prompt_prep",
            "parquet_zorder_roundtrip",
            "incremental_agg_roundtrip",
            "orders_snapshot_diff",
            "ann_ivf_index_roundtrip",
            "corpus_embedding_decontaminate",
            "semantic_dedup_by_label",
            "corpus_extend_semantic",
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
