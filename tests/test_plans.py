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
        assert missing <= {
            "ann_lsh_pairs",
            "ann_ivf_top10",
            "mp_pca_coords",
            "mp_pca_coords_distributed",  # same basis-sign rationale
            "doc_vocab_approx",  # HLL estimate is impl-defined
            "doc_bpe_merges",  # iterative greedy merges: not SQL
            "doc_bpe_encoded",  # trained-tokenizer segmentation: not SQL
            "doc_unigram_pieces",  # iterative Viterbi-EM: not SQL
            "doc_unigram_encoded",  # trained-tokenizer segmentation: not SQL
            "semantic_dedup_kmeans",  # model-defined cells; anchored by
            # semantic_dedup_by_label (same pruning rule, deterministic
            # clustering)
            "ann_ivfpq_top10",  # probe/shortlist approximation; anchored
            # by ann_ivfpq_exhaustive_top10 (probe-all + rerank-all ==
            # brute force, oracle-paired)
        }, missing


def test_hll_vocab_within_rsd(spark):
    """The approximate vocabulary must sit within ~3x the configured rsd of
    the exact distinct count (HLL++ accuracy contract)."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.catalog import load_table
    from pspcz_analyzer_spark.functions.text import normalize_text

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(
        "lang", F.explode(F.split(normalize_text("text"), " ")).alias("tok")
    )
    exact = {
        r["lang"]: r["n"]
        for r in toks.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()
    }
    approx = {
        r["lang"]: r["a"]
        for r in toks.groupBy("lang")
        .agg(F.approx_count_distinct("tok", 0.01).alias("a"))
        .collect()
    }
    for lang, n in exact.items():
        assert abs(approx[lang] - n) <= max(3, 0.03 * n), (lang, n, approx[lang])


def test_oracles_bind_in_duckdb():
    """Every oracle must at least bind/plan on the real tables (the
    round-1 failure mode: lateral range() unsupported by DuckDB 1.0).
    (Was accidentally nested inside another test — never collected.)"""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, sql in oracle_sqls().items():
        con.execute(f"EXPLAIN {sql}")  # binder + planner, no execution


def test_oracle_paired_output_is_driver_hashable(all_built):
    """Registry-wide authoring lint (the r7 lesson, both classes): every
    oracle-paired query's RESULT REPRESENTATION must survive the driver's
    dtype-sensitive pandas hash — no top-level Array/Struct/Map column on
    either side (the canonicalizer crashes on list cells:
    `doc_inverted_postings` r7), and no int-vs-float kind drift between the
    Spark schema and the oracle's DESCRIBE types, where HUGEINT counts as
    float because that is what the driver's pandas frame holds
    (`votes_browser_page` r7). Uses the same checker the local gate runs."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "check_correctness.py",
        ),
    )
    checker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(checker)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = {}
    for name, sql in oracle_sqls().items():
        plan, schema = all_built[name]
        if schema is None:
            offenders[name] = plan  # build error, reported elsewhere too
            continue
        duck_types = dict(
            (r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
        )
        errs = checker._representation_errors(schema, duck_types)
        if errs:
            offenders[name] = errs
    assert not offenders, offenders


# Queries where a nested-loop join is the DOCUMENTED, intentionally bounded
# plan: exact pairwise baselines over an explicitly capped side (<=200
# vectors) or a broadcast-small theta join. Everything else must be
# hash/sort-merge joins only — this is the 100 TB regression gate.
_NESTED_LOOP_OK = {
    "embedding_pairs_cross_label",  # exact baseline, vec_id < 200 cap
    "embedding_near_dup",  # exact oracle twin, vec_id < 1000 cap; scale
    # path is LSH candidates + exact rescore (ann_lsh_pairs)
    "embedding_hard_negatives",  # exact all-pairs oracle twin, vec_id < 150
    # cap; scale path rescoring LSH/IVF candidates (same windows)
    "embedding_knn_graph",  # exact k-NN twin, vec_id < 200 cap; scale path
    # is knn_graph(block_col=IVF cell/LSH bucket) = equi-join on the block
    "fuzzy_match_supplier_customer",  # cross join vs broadcast-small dim
    "prefix_match_parts",  # startswith theta join vs broadcast prefix list
    "ann_bruteforce_top10",  # 1-row broadcast query vector (crossJoin)
    "q11_important_stock",  # 1-row broadcast scalar threshold (> compare)
    "q22_global_sales",  # 1-row broadcast scalar average (> compare)
    "events_hot_users",  # 1-row broadcast scalar total (share divisor)
    "laws_listing_page",  # 1-row broadcast scalar total-hit count
    "docs_browser_page",  # 1-row broadcast scalar total-hit count
    "votes_browser_page",  # same 1-row broadcast scalar total-hit count
    "doc_bm25_topk",  # 1-row broadcast corpus stats (N, avgdl, df)
    "events_funnel",  # 1-row broadcast stage counts (3-row summary)
    "corpus_temperature_mix",  # 1-row broadcast weight total (rate table)
    "corpus_quality_calibrated",  # 1-row broadcast percentile threshold
    "events_value_histogram",  # 1-row broadcast (min,max) range scalar
    "events_decayed_value",  # 1-row broadcast max-timestamp anchor
    "events_value_equidepth",  # 1-row broadcast decile-boundary array
    "corpus_embedding_decontaminate",  # broadcast-eval theta anti-join
    # (exact baseline; LSH blocking is the beyond-broadcast path)
    "doc_lm_perplexity",  # 1-row broadcast corpus stats (T, V)
    "corpus_dsir_scores",  # two 1-row broadcast feature totals (the
    # 1024-row log tables themselves join hash-equi on bucket)
    "corpus_extend_semantic",  # n_centroids-row broadcast cross for cell
    # assignment (same shape as extend_ivf_index); the history comparison
    # itself is a cell equi-join
    "doc_bigram_perplexity",  # 1-row broadcast vocab size (V) — the
    # model/context tables themselves join hash-equi on (w1, w2)/w1
    "corpus_ppl_buckets",  # inherits the unigram 1-row (T, V) broadcast
    "events_value_trend_ols",  # 1-row broadcast min-timestamp anchor
    # (same shape as events_decayed_value's max anchor)
    "hits_trade_graph",  # 1-row broadcast L1 norm per half-step; the
    # edge joins themselves are node-keyed hash joins
    "customer_rfm_segments",  # 1-row broadcast quintile boundaries
    # (same shape as events_value_equidepth, already listed)
    "events_value_psi",  # 1-row broadcast combined-range span + per-side
    # totals (the equi-width binning scalars)
    "frequent_part_pairs",  # 1-row broadcast basket-count denominator
    "part_association_rules",  # same 1-row basket-count denominator
    "doc_hybrid_rrf_topk",  # inherits doc_bm25_topk's 1-row broadcast
    # corpus stats + ann_bruteforce's 1-row broadcast query vector; the
    # rank/fusion path itself is join-free (sort_array + posexplode
    # over the k-row candidate lists)
}


@pytest.fixture(scope="module")
def all_built(spark) -> dict[str, tuple[str, object]]:
    """(executed-plan text, result schema) for every registered query
    (compiled once; schema extraction is free once the DF is built)."""
    built = {}
    for qname, fn in query_fns().items():
        try:
            df = fn(spark, SF_DIR)
            built[qname] = (_plan(df), df.schema)
        except Exception as e:  # pragma: no cover - plan build must not fail
            built[qname] = (f"PLAN BUILD ERROR: {e}", None)
    return built


@pytest.fixture(scope="module")
def all_plans(all_built) -> dict[str, str]:
    return {qname: plan for qname, (plan, _schema) in all_built.items()}


def test_no_nested_loop_joins_anywhere(all_plans):
    offenders = {}
    for qname, plan in all_plans.items():
        if qname in _NESTED_LOOP_OK:
            continue
        if plan.startswith("PLAN BUILD ERROR"):
            offenders[qname] = plan
        elif "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            offenders[qname] = "nested-loop/cartesian join in plan"
    assert not offenders, offenders


# Expression constructors that are catastrophic to re-evaluate inside an
# inferred Generate filter (see PLANS.md "the explode inferred-filter trap"
# and partitioning.explode_notnull). A Filter condition applying size() to a
# CONSTRUCTED array (rather than an attribute) means InferFiltersFromGenerate
# duplicated the construction — the round-3 13x regression signature.
_TRAP_SIGNATURES = ("size(array_distinct(", "size(transform(", "size(split(")


def test_no_inferred_filter_trap(all_plans):
    offenders = {}
    for qname, plan in all_plans.items():
        # Only FILTER nodes matter: size(<constructor>) in a Project is the
        # intended single evaluation (e.g. token counts); the same text in a
        # Filter condition means the constructor runs an extra 2x per row.
        hits = [
            s
            for line in plan.splitlines()
            if "Filter" in line
            for s in _TRAP_SIGNATURES
            if s in line
        ]
        if hits:
            offenders[qname] = sorted(set(hits))
    assert not offenders, (
        "explode over a constructed array re-evaluates the constructor in an "
        f"inferred filter; route it through partitioning.explode_notnull: {offenders}"
    )


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


def test_profile_table_nulls_and_approx(spark):
    """Null accounting is exact; the HLL cardinality path (the 100 TB
    default — no EXPAND in the plan) stays within rsd of exact."""
    import pyspark.sql.functions as F

    from pspcz_analyzer_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")], "id long, v string"
    )
    exact = {r["col_name"]: r.asDict() for r in profile_table(df, approx=False).collect()}
    assert exact["v"]["n_nulls"] == 2 and exact["v"]["n_distinct"] == 2
    assert exact["id"]["n_nulls"] == 0 and exact["id"]["n_distinct"] == 5
    assert exact["id"]["min_val"] == "1" and exact["id"]["max_val"] == "5"

    approx = {r["col_name"]: r.asDict() for r in profile_table(df).collect()}
    for c in ("id", "v"):
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= 1
    # The approx plan must NOT expand the input (that is its point).
    assert "Expand" not in _plan(profile_table(df))
    assert "Expand" in _plan(profile_table(df, approx=False))


def test_no_unpartitioned_windows(all_plans):
    """No query may run a window over Window.partitionBy() (or orderBy-only):
    a global window funnels the ENTIRE input through one task — the
    single-task count bug class (fixed in laws_listing_page by a broadcast
    scalar; this net keeps it from coming back anywhere).

    Detector: in `windowspecdefinition(<prefix> specifiedwindowframe...)`,
    partition columns appear in the prefix as bare attributes while order
    columns carry ASC/DESC — a prefix that is empty or all-sort means no
    partitioning."""
    import re

    offenders = {}
    for qname, plan in all_plans.items():
        if plan.startswith("PLAN BUILD ERROR"):
            continue  # reported by test_no_nested_loop_joins_anywhere
        for m in re.finditer(r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan):
            prefix = [p.strip() for p in m.group(1).split(",") if p.strip()]
            if not any(" ASC" not in p and " DESC" not in p for p in prefix):
                offenders.setdefault(qname, m.group(1)[:80])
    assert not offenders, (
        f"global (unpartitioned) window in plan — single-task funnel: {offenders}"
    )
