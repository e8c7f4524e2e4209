"""Ranked-retrieval evaluation: recall@k, MRR, nDCG@k.

The measurement half of the retrieval surface (BM25 in
``plans/behavior.py``, ANN in ``operators/ann.py``): given a ranked
result list per query and graded relevance judgments, compute the
standard offline metrics — the harness a retrieval pipeline runs after
every index/ranker change (TREC-style evaluation; nDCG per
Järvelin & Kekäläinen 2002).

All metrics are per-query rows (macro-average downstream with one tiny
aggregate); everything is built-in column expressions over two keyed
shuffles — judgment sets and result lists are top-k/benchmark-sized per
query, so cost tracks queries x k, never the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    query_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
    k: int = 10,
) -> DataFrame:
    """Per-query recall@k, MRR, and nDCG@k.

    ``results``: one row per (query, doc) with a 1-based ``rank_col``
    (ties already broken by the ranker — ranks must be unique per query).
    ``truth``: graded judgments, ``grade_col`` > 0 meaning relevant;
    (query, doc) pairs absent from ``truth`` count as grade 0.

    * recall@k  = |top-k results with grade > 0| / |relevant judgments|
    * MRR       = 1 / rank of the first relevant result (0 when none)
    * nDCG@k    = DCG@k / IDCG@k with gain (2^grade - 1) / log2(rank+1);
                  IDCG ranks the judgment grades descending
                  (doc-id tiebreak, so both engines agree exactly).

    Queries with judgments but NO result rows still appear (zero
    metrics) — silently dropping them would inflate every macro average.
    Plan: results left-join judgments on (query, doc) — both sides
    top-k/benchmark-sized — one per-query aggregate each side, one
    per-query window for IDCG. Metrics round to 6 (engine-stable log2).
    """
    q, d, r, g = query_col, doc_col, rank_col, grade_col
    graded = results.join(truth, [q, d], "left").select(
        q, d, r, F.coalesce(F.col(g), F.lit(0)).alias(g)
    )
    gain = (F.pow(F.lit(2.0), F.col(g)) - 1) / F.log2(F.col(r) + 1)
    per_q = graded.groupBy(q).agg(
        F.sum(
            F.when((F.col(r) <= k) & (F.col(g) > 0), 1).otherwise(0)
        ).alias("__hits"),
        F.max(
            F.when(F.col(g) > 0, 1.0 / F.col(r)).otherwise(0.0)
        ).alias("mrr"),
        F.sum(F.when(F.col(r) <= k, gain).otherwise(F.lit(0.0))).alias("__dcg"),
    )
    w = Window.partitionBy(q).orderBy(F.desc(g), F.asc(d))
    ideal = (
        truth.filter(F.col(g) > 0)
        .withColumn("__rn", F.row_number().over(w))
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).alias("n_relevant"),
            F.sum(
                F.when(
                    F.col("__rn") <= k,
                    (F.pow(F.lit(2.0), F.col(g)) - 1) / F.log2(F.col("__rn") + 1),
                ).otherwise(F.lit(0.0))
            ).alias("__idcg"),
        )
    )
    return (
        ideal.join(per_q, q, "left")
        .select(
            q,
            "n_relevant",
            F.round(
                F.coalesce(F.col("__hits"), F.lit(0)) / F.col("n_relevant"), 6
            ).alias("recall_at_k"),
            F.round(F.coalesce(F.col("mrr"), F.lit(0.0)), 6).alias("mrr"),
            F.round(
                F.when(
                    F.col("__idcg") > 0,
                    F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 3,
    min_df: int = 2,
    postings_cap: int = 20,
) -> DataFrame:
    """Capped inverted-index postings: (term, df, postings) with the
    first ``postings_cap`` doc ids per term in ascending order — the
    classic MapReduce construction (term -> sorted posting list) that
    feeds candidate generation for BM25/boolean retrieval.

    Scale shape: the naive ``collect_list then slice`` holds EVERY doc
    id of a term in one aggregation buffer before truncating — a
    stopword's postings are corpus-sized, so the hot groups OOM exactly
    when the index is most needed. Instead a row_number window
    (partitioned by term, ordered by doc id) keeps only the cap's worth
    of rows BEFORE the list aggregate, so per-group state is bounded at
    ``postings_cap`` no matter how hot the term; ``df`` comes from a
    plain count on the same term key (AQE reuses the exchange — the
    window, the count, and the final join all shuffle on ``term``).
    First-k-by-id is a deterministic truncation POLICY, stated in the
    schema rather than hidden: real deployments swap the order-by for a
    quality/recency score and keep the same bounded shape.
    """
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    from pyspark import StorageLevel

    # Persisted: the distinct (doc, term) explode feeds both the df count
    # and the postings window; without it the tokenize+distinct subtree
    # executes twice (repo convention: persist shared subtrees).
    terms = (
        explode_notnull(
            df, F.split(normalize_text(text_col), " "), "term", keep=(id_col,)
        )
        .filter(F.length("term") >= min_term_len)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= min_df
    )
    ranked = terms.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("term").orderBy(F.asc(id_col))),
    )
    postings = (
        ranked.filter(F.col("__rn") <= postings_cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
    )
    return dfreq.join(postings, "term").select("term", "df", "postings")


def rank_topk(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """(id, score, rank 1..k) for the top ``k`` of a scored frame,
    deterministic under ties (score DESC, id ASC) — with NEITHER a
    global window (single-task funnel over the INPUT, banned by
    test_plans.py::test_no_unpartitioned_windows) NOR a theta self-join
    (BroadcastNestedLoopJoin, banned by the nested-loop net): the top-k
    itself is a ``TakeOrderedAndProject`` (per-partition heads merged,
    never a full sort), and ranks are then positions in ONE k-element
    collected array — ``sort_array`` over ``struct(-score, id)`` makes
    ascending order mean (score DESC, id ASC), and ``posexplode`` hands
    back rank = position + 1. The only single-task work is over k rows,
    which a top-k is by definition."""
    top = scored.select(
        F.col(id_col).alias("__id"), F.col(score_col).alias("__s")
    ).orderBy(F.desc("__s"), F.asc("__id")).limit(k)
    arr = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("__s")).alias("negs"),
                    F.col("__id").alias("i"),
                    F.col("__s").alias("s"),
                )
            )
        ).alias("__arr")
    )
    return arr.select(F.posexplode("__arr").alias("__pos", "__st")).select(
        F.col("__st.i").alias(id_col),
        F.col("__st.s").alias(score_col),
        (F.col("__pos") + 1).cast("long").alias("rank"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 60,
    topn: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009, SIGIR)
    of two ranked lists: ``score(d) = sum_i 1 / (k + rank_i(d))`` over
    the lists containing ``d``. The standard zero-tuning way to combine
    a LEXICAL ranking (BM25) with a SEMANTIC one (embedding cosine) —
    hybrid retrieval for RAG corpora — robust because it consumes only
    RANKS, so the two scoring scales never need calibration.

    Inputs are (id, rank) frames (1-based, from :func:`rank_topk`);
    cost is the two candidate lists' sizes, never the corpus. Output:
    (id, rrf_score, rank_a, rank_b) top ``topn``, ranks NULL where a
    list didn't surface the id."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    return (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            "rank_a",
            "rank_b",
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topn)
    )
