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
# Round-11 rotation: the driver re-attests 50 queries per round against
# freshly regenerated testdata, so the budget goes to the queries with the
# WEAKEST current attestation. Ledger: zero attestation debt remains (every
# oracle-paired query is green in some round); after the r10 rotation the
# stalest cohort is the r05 TAIL (the 29 r05-green queries r10's budget did
# not reach — the r10 verdict's ask #2). Budget math: 4 sentinels + 1
# never-attested r11-new (events_stream_late_drops, decorator priority 18)
# + 29 r05 tail = 34; the ~16 remaining slots take the r06 cohort's head in
# registration order. Tiers (lower first):
#   10 = sentinels — queries whose plan or code path CHANGED this round
#        (events_stream_view_purchase_outer drains in a newSession clone,
#        commit 3dfbcb9; both join_star queries had their single-fact-scan
#        sentinel rewritten from plan-text matching to plan-tree node
#        counting, 3dfbcb9; manifest_lakehouse_lifecycle exercises the
#        vacuum/restore paths that now verify blob crc32+length on read
#        and enforce the reader retention floor, 33a2df1);
#   18 = never driver-attested — events_stream_late_drops (registered at
#        priority 18 via its @register call);
#   40 = r05-green TAIL (29 queries) — fully inside the budget this round;
#   60..71 = r06/r07/r08/r09/r10-green — freshest attestations yield last;
#   72 = rows-only by design — oracle-paired anchors cover them, so a
#        driver slot here records only a weaker rows-only check; they
#        yield to every oracle-paired tier.
PRIORITY_SENTINEL = 10
PRIORITY_NEW = 18
PRIORITY_ATTESTED_R05 = 40
PRIORITY_ROWS_ONLY = 72
PRIORITY_ATTESTED_R06 = 60
PRIORITY_ATTESTED_R07 = 62
PRIORITY_ATTESTED_R08 = 64
PRIORITY_ATTESTED_R09 = 68
PRIORITY_ATTESTED_R10 = 70

_PRIORITY: dict[str, int] = {
    # Sentinels: queries whose PLAN or code path changed in r11 — re-attest first.
    **{
        n: PRIORITY_SENTINEL
        for n in (
            "events_stream_view_purchase_outer",
            "manifest_join_star",
            "manifest_join_star_snowflake",
            "manifest_lakehouse_lifecycle",
        )
    },
    # r05-green TAIL — the 29 r05-attested queries the r10 rotation did not
    # reach; the stalest attestations in the catalog (r10 verdict ask #2).
    **{
        n: PRIORITY_ATTESTED_R05
        for n in (
            "asof_next_order_after_event",
            "bloom_prune_orders_building",
            "bucketed_join_revenue",
            "corpus_dsir_scores",
            "corpus_quality_calibrated_by_lang",
            "corpus_weighted_sample_per_lang",
            "doc_duplicate_spans",
            "doc_duplicate_spans_removed",
            "embedding_hard_negatives",
            "embedding_matryoshka_prefix",
            "events_cms_user_counts",
            "events_stream_dedup",
            "events_value_equidepth",
            "events_value_histogram",
            "law_refs_extracted",
            "lineitem_numeric_correlations",
            "loyalty_rebellion_rates",
            "manifest_history_accounting",
            "manifest_stats_prune",
            "manifest_zorder_optimize",
            "media_binary_stats",
            "media_frame_sample",
            "pagerank_suppliers",
            "parquet_compact_roundtrip",
            "parquet_overwrite_roundtrip",
            "parquet_partitioned_prune",
            "parquet_upsert_resume",
            "q5_nation_revenue",
            "semantic_dedup_farthest",
        )
    },
    # Rows-only by design (approximation/iteration-defined: LSH/IVF top-k, PCA basis, k-means, HLL, BPE/unigram training); each has an oracle-paired exact anchor at a lower tier, so a driver slot here would be wasted.
    **{
        n: PRIORITY_ROWS_ONLY
        for n in (
            "ann_ivf_top10",
            "ann_ivfpq_top10",
            "ann_lsh_pairs",
            "doc_bpe_encoded",
            "doc_bpe_merges",
            "doc_unigram_encoded",
            "doc_unigram_pieces",
            "doc_vocab_approx",
            "mp_pca_coords",
            "mp_pca_coords_distributed",
            "semantic_dedup_kmeans",
        )
    },
    # r06-green cohort — next-stalest; the r11 budget remainder (~16 slots)
    # reaches this tier's head in registration order.
    **{
        n: PRIORITY_ATTESTED_R06
        for n in (
            "ann_ivfpq_exhaustive_top10",
            "clone_divergence_buckets",
            "corpus_decontaminate_substr",
            "csv_roundtrip_hostile",
            "customer_rfm_segments",
            "doc_bigram_perplexity",
            "doc_hybrid_rrf_topk",
            "doc_term_pmi",
            "doc_textrank_keywords",
            "embedding_knn_graph",
            "er_sorted_neighborhood",
            "events_hll_distinct_users",
            "events_hourly_resample",
            "events_manifest_cdf_stream",
            "events_stream_mv_refresh",
            "events_value_psi",
            "events_value_trend_ols",
            "hits_trade_graph",
            "kcore_trade_graph",
            "lpa_supplier_communities",
            "manifest_bloom_point_lookup",
            "manifest_cdf_appends",
            "manifest_clone_roundtrip",
            "manifest_delete_roundtrip",
            "manifest_generated_partition",
            "manifest_hilbert_optimize",
            "manifest_mor_delete_roundtrip",
            "manifest_mv_refresh",
            "manifest_null_prune",
            "manifest_partition_evolution",
            "manifest_scan_pruned",
            "manifest_schema_evolution",
            "media_image_features",
            "media_video_mp4_features",
            "orders_expectations",
            "orders_table_fingerprint",
            "pagerank_weighted_suppliers",
            "parquet_delete_roundtrip",
            "ppr_nation0_market",
            "semantic_dedup_salted",
            "supplier_hops_bfs",
            "triangle_suppliers",
        )
    },
    # r07-green cohort.
    **{
        n: PRIORITY_ATTESTED_R07
        for n in (
            "anti_join_customers_without_orders",
            "clustering_coeff_suppliers",
            "corpus_ngram_diversity",
            "corpus_ppl_buckets",
            "doc_language_id",
            "doc_quality_scores",
            "eval_contamination_stats",
            "events_anomaly_zscore",
            "events_decayed_value",
            "events_robust_outliers",
            "events_weekly_seasonality",
            "exact_dedup_survivors",
            "frequent_part_pairs",
            "link_prediction_suppliers",
            "manifest_cdc_roundtrip",
            "manifest_cluster_incremental",
            "manifest_day_partition_scan",
            "manifest_default_roundtrip",
            "manifest_delete_pos_roundtrip",
            "manifest_drop_readd_roundtrip",
            "manifest_files_accounting",
            "manifest_identity_roundtrip",
            "manifest_merge_full_roundtrip",
            "manifest_mor_materialized",
            "manifest_rename_roundtrip",
            "manifest_replace_where_roundtrip",
            "manifest_restore_roundtrip",
            "manifest_row_cdf_roundtrip",
            "manifest_row_tracking_roundtrip",
            "manifest_scan_box_zorder",
            "manifest_scan_unpruned",
            "manifest_scd2_customer",
            "manifest_widen_roundtrip",
            "media_audio_features",
            "minhash_lsh_exact_recall",
            "near_dup_containment",
            "near_dup_jaccard",
            "orc_roundtrip_supplier",
            "orders_price_position",
            "orders_scd2_asof_segment",
            "part_association_rules",
            "semi_join_customers_with_1997_orders",
            "simhash_dup_pairs",
            "top3_orders_per_customer",
        )
    },
    # r08-green cohort.
    **{
        n: PRIORITY_ATTESTED_R08
        for n in (
            "amendments_merged",
            "asof_cascade",
            "asof_latest_order_before_event",
            "corpus_decontaminate",
            "corpus_pack_sequences",
            "cube_status_priority",
            "customer_display_names",
            "distinct_status_priority",
            "doc_inverted_postings",
            "doc_length_quantiles",
            "doc_topics_enriched",
            "doc_vocab_exact",
            "events_props_json",
            "except_building_without_bigspenders",
            "fuzzy_match_supplier_customer",
            "hive_adopt_roundtrip",
            "interchange_roundtrip",
            "json_nested_roundtrip",
            "manifest_agg_pushdown",
            "manifest_analyze_roundtrip",
            "manifest_join_runtime_pruned",
            "manifest_partitions_table",
            "manifest_scan_auto",
            "manifest_scan_dnf",
            "nation_pairs_same_region",
            "near_dup_clusters",
            "near_dup_jaccard_capped",
            "order_lines_nested",
            "orders_by_month",
            "orders_keyset_page",
            "orders_page3",
            "pdf_letters_parse",
            "pivot_status_by_priority",
            "point_lookup_order",
            "prefix_match_parts",
            "q18_large_orders",
            "q1_pricing_summary",
            "q3_top_revenue_orders",
            "q4_priority_with_returns",
            "q6_forecast_revenue",
            "rollup_priority_status",
            "steno_crossval_letters",
            "steno_parse_votes",
            "training_corpus_prepare",
            "unl_roundtrip_nation",
            "vote_number_resolution",
            "votes_browser_page",
        )
    },
    # r09-green cohort.
    **{
        n: PRIORITY_ATTESTED_R09
        for n in (
            "ann_bruteforce_top10",
            "ann_ivf_exhaustive_top10",
            "attendance_rates",
            "coalition_cohesion",
            "corpus_chunk_windows",
            "corpus_extend_near_dup",
            "corpus_lang_sample_exact",
            "corpus_pii_redacted",
            "corpus_quality_calibrated",
            "corpus_remove_boilerplate",
            "corpus_shuffle_order",
            "corpus_source_cap",
            "corpus_temperature_mix",
            "corpus_train_split",
            "doc_bm25_topk",
            "doc_html_strip_roundtrip",
            "doc_lm_perplexity",
            "doc_repetition_stats",
            "doc_top_terms_by_lang",
            "embedding_near_dup",
            "embedding_pairs_cross_label",
            "events_carry_forward_purchase",
            "events_funnel",
            "events_lag_gap",
            "events_retention_cohorts",
            "events_running_value",
            "events_session_window_10m",
            "events_sessionized",
            "events_sliding_1h_30m",
            "events_stream_tumbling_1h",
            "events_stream_view_purchase",
            "events_tumbling_1h",
            "manifest_mv_incremental_cdf",
            "manifest_wap_roundtrip",
            "mp_similarity_top20",
            "mp_vote_similarity",
            "party_breakdown_vote42",
            "party_pair_agreement",
            "q10_returned_revenue",
            "q12_shipmode_priority",
            "q13_customer_distribution",
            "q14_promo_share",
            "q19_disjunctive_revenue",
            "q2_min_cost_supplier",
            "q7_nation_volume",
            "vote_detail_rows",
        )
    },
    # r10-green cohort — freshest attestations yield last (the r10 rotation:
    # 6 manifest sentinels + the snowflake new + the 28-query r04 tail + the
    # r05 cohort head, all re-attested by CORRECTNESS_r10).
    **{
        n: PRIORITY_ATTESTED_R10
        for n in (
            "ann_ivf_index_roundtrip",
            "ann_lsh_exact_recall",
            "corpus_embedding_decontaminate",
            "corpus_extend_semantic",
            "corpus_lang_sample",
            "corpus_unimax_sample",
            "corpus_weighted_sample",
            "doc_fingerprints",
            "doc_gopher_flags",
            "doc_nb_lang_classify",
            "doc_prompt_prep",
            "doc_retrieval_eval",
            "doc_search_normalized",
            "doc_token_stats",
            "doc_top_terms",
            "docs_browser_page",
            "docs_by_source_stats",
            "events_hot_users",
            "events_range_join_windows",
            "events_rollup_hourly_daily",
            "events_session_dynamic_gap",
            "events_stream_nation_totals",
            "events_stream_user_totals",
            "events_top_user_paths",
            "events_trailing_24h",
            "events_transition_matrix",
            "incremental_agg_roundtrip",
            "latest_order_per_customer",
            "laws_listing_page",
            "manifest_dml_roundtrip",
            "manifest_join_auto",
            "manifest_join_auto_pruned",
            "manifest_merge_roundtrip",
            "manifest_segmented_lifecycle",
            "orders_snapshot_diff",
            "parquet_zorder_roundtrip",
            "profile_orders_columns",
            "q11_important_stock",
            "q15_top_supplier",
            "q16_supplier_count",
            "q17_small_qty_revenue",
            "q20_part_promotion",
            "q21_waiting_supplier",
            "q22_global_sales",
            "q8_market_share",
            "q9_product_profit",
            "salted_join_priority_revenue",
            "semantic_dedup_by_label",
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
