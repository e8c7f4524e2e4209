"""User-behavior analytics over events + ranked retrieval over documents.

Three composites a training-data / product-analytics pipeline runs at
scale, each with a DuckDB oracle:

* events_funnel — ordered conversion funnel (signup -> first view after
  signup -> first purchase after that view). Every stage is a keyed
  equi-join + min-aggregate on user_id, so the whole funnel is a handful
  of shuffles on the SAME key (AQE reuses the exchange); nothing driver-
  side until the final 3-row summary.
* events_retention_cohorts — classic cohort retention: users grouped by
  first-active date, counted per day-offset. Two shuffles (user_id, then
  the tiny cohort/offset grid).
* doc_bm25_topk — Okapi BM25 scoring of a fixed query-term set over the
  corpus. With a small term list the whole thing is ONE scan: per-term
  term frequencies come from array ops on the token split (no explode of
  the full token stream), corpus stats (N, avgdl, per-term df) are a
  scalar aggregate broadcast back, and the final top-k is
  TakeOrderedAndProject. The classic explode->groupBy formulation
  shuffles every token in the corpus; this shape shuffles nothing but a
  one-row stats frame and the k winners, which is what you want when
  "corpus" means 100 TB.

The funnel/retention shapes have no reference twin (the reference's user
analytics is parliament-specific); they fill the SURVEY's training-
pipeline mandate alongside dedup/ANN/corpus-prep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.plans import register

_FUNNEL_STAGES = ("signup", "view", "purchase")


@register(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage_num, 'signup' AS stage,
             n1 AS users, CAST(100 AS DOUBLE) AS pct_of_prev FROM n
      UNION ALL
      SELECT 2, 'view', n2, round(n2 * 100.0 / n1, 6) FROM n
      UNION ALL
      SELECT 3, 'purchase', n3, round(n3 * 100.0 / n2, 6) FROM n
    ) ORDER BY stage_num
    """,
    tags=("funnel", "behavior", "events"),
    doc="Ordered conversion funnel: first signup, first view AFTER it, "
    "first purchase after THAT — strict event ordering per user, not "
    "mere per-type existence.",
    priority=18,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def first_after(stage: str, prev: DataFrame | None, t_prev: str, t_out: str):
        staged = events.filter(F.col("event_type") == stage)
        if prev is not None:
            staged = staged.join(prev, "user_id").filter(F.col("ts") > F.col(t_prev))
        return staged.groupBy("user_id").agg(F.min("ts").alias(t_out))

    s1 = first_after("signup", None, "", "t1")
    s2 = first_after("view", s1, "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
    )
    n1, n2, n3 = F.col("n1"), F.col("n2"), F.col("n3")

    def row(num: int, stage: str, users, pct):
        return F.struct(
            F.lit(num).cast("long").alias("stage_num"),
            F.lit(stage).alias("stage"),
            users.alias("users"),
            pct.cast("double").alias("pct_of_prev"),
        )

    return (
        counts.select(
            F.explode(
                F.array(
                    row(1, "signup", n1, F.lit(100.0)),
                    row(2, "view", n2, F.round(n2 * 100.0 / n1, 6)),
                    row(3, "purchase", n3, F.round(n3 * 100.0 / n2, 6)),
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("stage_num")
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (
      SELECT user_id, min(d) AS cohort_date FROM activity GROUP BY user_id
    )
    SELECT c.cohort_date,
           datediff('day', c.cohort_date, a.d) AS day_offset,
           count(*) AS users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("retention", "behavior", "events"),
    doc="Cohort retention grid: users bucketed by first-active date, "
    "active-user counts per day offset. Distinct-day activity first so a "
    "chatty user counts once per day.",
    priority=18,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort_date", "day_offset")
    )


_BM25_TERMS = ("spark", "vector", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 15


def _bm25_oracle() -> str:
    tf_cols = ",\n           ".join(
        "len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"x -> x = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(
        f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5)) * tf_{t} * {_BM25_K1 + 1} "
        f"/ (tf_{t} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for t in _BM25_TERMS
    )
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS dl,
           {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM base
    )
    SELECT doc_id, round({score}, 6) AS bm25
    FROM base, stats
    WHERE {any_tf} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_K}
    """


@register(
    "doc_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("bm25", "retrieval", "text-analysis"),
    doc="Okapi BM25 top-k for a fixed query-term set: one corpus scan "
    "(array-op term frequencies, no token explode), scalar stats "
    "broadcast, TakeOrderedAndProject top-k.",
    priority=18,
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_K)
    )


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25 rounded to 6) for every document matching any of
    ``_BM25_TERMS`` — the scoring shared by :func:`doc_bm25_topk` and the
    hybrid-RRF query."""
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def tf(term: str):
        # NB: the lambda must take exactly one parameter — F.filter treats a
        # two-parameter lambda as (value, index).
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .alias("dl"),
        *[tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    parts = [
        F.log(
            1.0
            + (F.col("n") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        * F.col(f"tf_{t}")
        * (_BM25_K1 + 1)
        / (
            F.col(f"tf_{t}")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        for t in _BM25_TERMS
    ]
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    any_tf = sum((F.col(f"tf_{t}") for t in _BM25_TERMS[1:]), F.col(f"tf_{_BM25_TERMS[0]}"))
    return scored.filter(any_tf > 0).select(
        "doc_id", F.round(total, 6).alias("bm25")
    )


_RRF_K = 60
_RRF_TOPN = 10
_RRF_LIST = 20


def _rrf_oracle() -> str:
    tf_cols = ",\n           ".join(
        "len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"x -> x = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(
        f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5)) * tf_{t} * {_BM25_K1 + 1} "
        f"/ (tf_{t} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for t in _BM25_TERMS
    )
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS dl,
           {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM base
    ),
    bm AS (
      SELECT doc_id, round({score}, 6) AS bm25
      FROM base, stats
      WHERE {any_tf} > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT {_RRF_LIST}
    ),
    bmr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
      FROM bm
    ),
    q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    ),
    cs AS (
      SELECT e.vec_id AS doc_id,
             round(
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS c
      FROM embeddings e, q
      ORDER BY c DESC, doc_id
      LIMIT {_RRF_LIST}
    ),
    csr AS (
      SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS rank_cos
      FROM cs
    )
    SELECT coalesce(bmr.doc_id, csr.doc_id) AS doc_id,
           round(coalesce(1.0 / ({_RRF_K} + bmr.rank_bm25), 0)
                 + coalesce(1.0 / ({_RRF_K} + csr.rank_cos), 0), 6)
             AS rrf_score,
           bmr.rank_bm25, csr.rank_cos
    FROM bmr FULL JOIN csr ON bmr.doc_id = csr.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_TOPN}
    """


@register(
    "doc_hybrid_rrf_topk",
    oracle=_rrf_oracle(),
    tags=("retrieval", "rrf", "hybrid", "rag", "new-surface"),
    priority=18,
    doc="Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke & "
    "Buettcher 2009): the BM25 lexical top-20 (one corpus scan, shared "
    "scoring with doc_bm25_topk) fuses with the embedding-cosine "
    "semantic top-20 (one broadcast-query scan) by rank only — "
    "score(d) = sum 1/(60+rank_i) — the zero-calibration combiner RAG "
    "stacks use when lexical and vector scores live on different "
    "scales. Ranks assigned on the 20-row candidate lists by self-join "
    "count (operators/ranking.py::rank_topk) so NO global window ever "
    "touches corpus-sized data; fusion cost is the candidate lists, "
    "never the corpus. The synthetic doc_id<->vec_id alignment stands "
    "in for a real text+embedding corpus; the machinery (and the "
    "oracle, which replays BOTH rankings and the fusion in SQL) is "
    "id-space-agnostic.",
)
def doc_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import cosine
    from pspcz_analyzer_spark.operators.ranking import rank_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    bm_rank = rank_topk(_bm25_scored(docs), "doc_id", "bm25", _RRF_LIST)

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__query")
    )
    cos_scored = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.col("__query").cast("array<double>"),
            ),
            6,
        ).alias("c"),
    )
    cos_rank = rank_topk(cos_scored, "doc_id", "c", _RRF_LIST)
    return rrf_fuse(
        bm_rank, cos_rank, "doc_id", k=_RRF_K, topn=_RRF_TOPN
    ).select(
        "doc_id",
        "rrf_score",
        F.col("rank_a").alias("rank_bm25"),
        F.col("rank_b").alias("rank_cos"),
    )


@register(
    "events_range_join_windows",
    oracle="""
    WITH w AS (
      SELECT ts AS lo, ts + INTERVAL 6 HOUR AS hi
      FROM events WHERE event_type = 'purchase' AND value >= 200
    )
    SELECT e.event_id, count(*) AS n_windows
    FROM events e JOIN w ON e.ts BETWEEN w.lo AND w.hi
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
    tags=("events", "range-join", "new-surface"),
    priority=18,
    doc="Keyless point-in-interval RANGE JOIN (events inside 6-hour "
    "windows opened by big purchases) via domain bucketing "
    "(operators/joins.py::range_join): a raw BETWEEN join has no "
    "equi-key and Catalyst would plan BroadcastNestedLoopJoin; gridding "
    "event time into interval-width cells turns it into a hash "
    "equi-join on the cell id (intervals explode to <= 2 cells, points "
    "to exactly 1 — each qualifying pair meets once, no dedup). The "
    "oracle computes the same pairs with a plain BETWEEN over "
    "timestamps, proving the microsecond-domain bucketing loses "
    "nothing.",
)
def events_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.joins import range_join

    events = load_table(spark, sf_dir, "events")
    usec = F.timestamp_diff(
        "MICROSECOND", F.to_timestamp(F.lit("1970-01-01")), F.col("ts")
    )
    six_h = 6 * 3600 * 1_000_000
    pts = events.select("event_id", usec.alias("p_us"))
    wins = events.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 200)
    ).select(usec.alias("lo_us"), (usec + six_h).alias("hi_us"))
    pairs = range_join(pts, wins, "p_us", "lo_us", "hi_us", bucket_width=six_h)
    return (
        pairs.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .orderBy("event_id")
    )


_EVAL_QUERIES = (("q1", ("spark", "vector")), ("q2", ("merge", "scan")))


def _retrieval_eval_oracle() -> str:
    arms = []
    for qid, terms in _EVAL_QUERIES:
        occ = " + ".join(
            f"len(list_filter(t, x -> x = '{t}'))" for t in terms
        )
        grade = " + ".join(
            f"(CASE WHEN list_contains(t, '{t}') THEN 1 ELSE 0 END)"
            for t in terms
        )
        arms.append(
            f"SELECT '{qid}' AS q_id, doc_id, {occ} AS occ, {grade} AS grade "
            "FROM toks"
        )
    union = " UNION ALL ".join(arms)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    scored AS ({union}),
    results AS (
      SELECT q_id, doc_id,
             row_number() OVER (
               PARTITION BY q_id ORDER BY occ DESC, doc_id
             ) AS rank
      FROM scored WHERE occ > 0
      QUALIFY rank <= 10
    ),
    truth AS (SELECT q_id, doc_id, grade FROM scored WHERE grade > 0),
    joined AS (
      SELECT r.q_id, r.rank, coalesce(t.grade, 0) AS grade
      FROM results r
      LEFT JOIN truth t ON r.q_id = t.q_id AND r.doc_id = t.doc_id
    ),
    perq AS (
      SELECT q_id,
             sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
             max(CASE WHEN grade > 0 THEN 1.0 / rank ELSE 0.0 END) AS mrr,
             sum((pow(2, grade) - 1) / log2(rank + 1)) AS dcg
      FROM joined GROUP BY q_id
    ),
    ideal AS (
      SELECT q_id, count(*) AS n_relevant,
             sum(CASE WHEN rn <= 10
                      THEN (pow(2, grade) - 1) / log2(rn + 1)
                      ELSE 0.0 END) AS idcg
      FROM (
        SELECT q_id, grade,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY grade DESC, doc_id
               ) AS rn
        FROM truth
      ) GROUP BY q_id
    )
    SELECT i.q_id,
           CAST(i.n_relevant AS BIGINT) AS n_relevant,
           round(coalesce(p.hits, 0) / i.n_relevant, 6) AS recall_at_k,
           round(coalesce(p.mrr, 0.0), 6) AS mrr,
           round(CASE WHEN i.idcg > 0
                      THEN coalesce(p.dcg, 0.0) / i.idcg ELSE 0.0 END, 6)
             AS ndcg_at_k
    FROM ideal i LEFT JOIN perq p ON i.q_id = p.q_id
    ORDER BY i.q_id
    """


@register(
    "doc_retrieval_eval",
    oracle=_retrieval_eval_oracle(),
    tags=("retrieval", "eval", "metrics", "new-surface"),
    priority=18,
    doc="Offline retrieval evaluation (operators/ranking.py::"
    "ranking_metrics): recall@10, MRR, nDCG@10 per query for a "
    "deterministic term-occurrence ranker against term-presence graded "
    "judgments — the measurement harness the BM25/ANN surface needs "
    "after every ranker change. The oracle replays ranking, judgments, "
    "and ALL THREE metrics in SQL (shared log2/pow arithmetic, round-6). "
    "Judgment sets are per-query bounded; cost tracks queries x k, "
    "never the corpus.",
)
def doc_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pspcz_analyzer_spark.operators.ranking import ranking_metrics

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    def tf(term: str):
        # One-parameter lambda only: F.filter treats a two-parameter
        # lambda as (value, index) — see doc_bm25_topk's note.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    arms = []
    for qid, terms in _EVAL_QUERIES:
        occ = None
        grade = None
        for t in terms:
            o = tf(t)
            g = F.when(F.array_contains(toks, t), 1).otherwise(0)
            occ = o if occ is None else occ + o
            grade = g if grade is None else grade + g
        arms.append(
            docs.select(
                F.lit(qid).alias("q_id"),
                "doc_id",
                occ.alias("occ"),
                grade.alias("grade"),
            )
        )
    scored = arms[0]
    for a in arms[1:]:
        scored = scored.unionByName(a)
    w = Window.partitionBy("q_id").orderBy(F.desc("occ"), F.asc("doc_id"))
    results = (
        scored.filter(F.col("occ") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "doc_id", "rank")
    )
    truth = scored.filter(F.col("grade") > 0).select("q_id", "doc_id", "grade")
    return ranking_metrics(results, truth, k=10).orderBy("q_id")


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tots AS (
      SELECT event_type, sum(n) AS t FROM pairs GROUP BY event_type
    )
    SELECT p.event_type, p.next_type,
           CAST(p.n AS BIGINT) AS n,
           round(p.n / t.t, 6) AS p_next
    FROM pairs p JOIN tots t ON p.event_type = t.event_type
    ORDER BY p.event_type, p.next_type
    """,
    tags=("behavior", "sequence", "markov", "new-surface"),
    priority=18,
    doc="First-order event-transition matrix (Markov counts): per-user "
    "event streams ordered by (ts, event_id), each consecutive pair "
    "counted and normalized into P(next | current) — the "
    "sequence-mining primitive behind next-action prediction features "
    "and funnel-drop diagnostics. One user-keyed shuffle for the lead "
    "window, one pair aggregate (map-side combined), per-state totals "
    "broadcast back; cost tracks events, state is |types|^2.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tots = pairs.groupBy("event_type").agg(F.sum("n").alias("__t"))
    return (
        pairs.join(F.broadcast(tots), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("p_next"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "events_top_user_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3
      GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    tags=("behavior", "sequence", "path-analysis", "new-surface"),
    priority=18,
    doc="Top onboarding paths: each user's FIRST THREE events (ordered by "
    "ts, event_id) joined into a path string, counted across users — the "
    "path-analysis primitive behind 'how do users actually start'. One "
    "user-keyed shuffle for the rank window, ordered array_agg per user "
    "(no cross-partition ordering assumptions — the order lives IN the "
    "aggregate), tiny path-counts aggregate, TakeOrderedAndProject "
    "top-20.",
)
def events_top_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        events.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    from pspcz_analyzer_spark.operators.pagination import top_k

    return top_k(counted, [F.desc("n_users"), F.asc("path")], 20)


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH scored AS (
      SELECT event_id, user_id,
             count(value) OVER w AS n_prev,
             (value - avg(value) OVER w) / (stddev_samp(value) OVER w) AS z
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_id, user_id,
           round(z, 6) + 0.0 AS z,
           CASE WHEN abs(round(z, 6)) > 2.5 THEN TRUE ELSE FALSE END
             AS is_anomaly
    FROM scored
    WHERE n_prev >= 10 AND z IS NOT NULL
    ORDER BY event_id
    """,
    tags=("anomaly", "behavior", "events", "window", "new-surface"),
    priority=18,
    doc="Rolling z-score anomaly detection: each event scored against the "
    "mean/stddev of its user's previous 20 events (warm-up of 10 "
    "required), flagged at |z| > 2.5 — the telemetry outlier / data-"
    "quality tripwire. ONE shuffle on user_id serves both window "
    "aggregates (same partition+order+frame); no self-join, no global "
    "sort — at 100 TB the cost is the events shuffle, same as any "
    "sessionization. The flag tests the ROUNDED z on both sides so the "
    "threshold cannot flip on engine float noise; -0.0 normalized via "
    "+ 0.0 (see plans/__init__ parity notes).",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    scored = events.select(
        "event_id",
        "user_id",
        F.count("value").over(w).alias("n_prev"),
        z.alias("z_raw"),
    )
    return (
        scored.filter((F.col("n_prev") >= 10) & F.col("z_raw").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.round("z_raw", 6) + F.lit(0.0)).alias("z"),
            (F.abs(F.round("z_raw", 6)) > 2.5).alias("is_anomaly"),
        )
        .orderBy("event_id")
    )


@register(
    "events_decayed_value",
    oracle="""
    WITH mx AS (SELECT max(ts) AS tmax FROM events)
    SELECT user_id,
           round(sum(value * exp(-(datediff('microseconds', ts, tmax))
                                 / 604800e6)), 6) AS decayed_value,
           count(*) AS n_events
    FROM events, mx
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("behavior", "feature-engineering", "decay", "new-surface"),
    priority=18,
    doc="Exponentially time-decayed per-user value (half-life machinery "
    "for recency-weighted engagement / churn features; tau = 7 days "
    "anchored at the corpus max timestamp): one scalar-max broadcast + "
    "one user-keyed aggregate with map-side partials — the scan-shaped "
    "feature pass, no window, no self-join. The decay is computed "
    "inside the sum (a pure codegen expression), so the whole feature "
    "is one shuffle at any event volume.",
)
def events_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    mx = F.broadcast(events.agg(F.max("ts").alias("tmax")))
    return (
        events.crossJoin(mx)
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.col("value")
                    * F.exp(
                        -F.expr("timestampdiff(MICROSECOND, ts, tmax)")
                        / 604800e6
                    )
                ),
                6,
            ).alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_value_trend_ols",
    oracle="""
    WITH mn AS (SELECT min(ts) AS tmin FROM events),
    x AS (
      SELECT event_type,
             datediff('microseconds', tmin, ts) / 86400e6 AS xd,
             value
      FROM events, mn
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(regr_slope(value, xd), 6) AS slope_per_day,
           round(regr_intercept(value, xd), 6) AS intercept,
           round(regr_r2(value, xd), 6) AS r2
    FROM x
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("behavior", "regression", "profile", "new-surface"),
    priority=18,
    doc="Per-event-type OLS trend of value over time (drift/seasonality "
    "probe for metric monitoring): slope and intercept from the "
    "closed-form population moments (covar_pop / var_pop), r-squared "
    "as corr^2 — all built-in JVM aggregates with map-side partials, "
    "ONE type-keyed shuffle total, no window and no iteration. The "
    "regression aggregate family (regr_slope / regr_intercept / "
    "regr_r2 in the SQL standard) distributes exactly like avg: "
    "each partial carries five running sums. x is days since the "
    "corpus min timestamp (microsecond-exact), broadcast as a scalar.",
)
def events_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    mn = F.broadcast(events.agg(F.min("ts").alias("tmin")))
    xd = (
        F.expr("timestampdiff(MICROSECOND, tmin, ts)").cast("double")
        / F.lit(86400e6)
    ).alias("xd")
    x = events.crossJoin(mn).select("event_type", xd, "value")
    slope = F.covar_pop("value", "xd") / F.var_pop("xd")
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(slope, 6).alias("slope_per_day"),
            F.round(F.avg("value") - slope * F.avg("xd"), 6).alias(
                "intercept"
            ),
            F.round(F.pow(F.corr("value", "xd"), 2), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


@register(
    "events_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(any_value(d.med), 6) AS median_value,
           round(any_value(m.mad), 6) AS mad,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN round(0.6745 * d.adev / m.mad, 6) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("behavior", "robust-stats", "profile", "new-surface"),
    priority=18,
    doc="Robust outlier detection per event type via median/MAD "
    "(Iglewicz-Hoaglin modified z-score, |0.6745*(x-med)/MAD| > 3.5): "
    "the heavy-tail-safe complement of events_anomaly_zscore — mean/"
    "stddev are themselves dragged by the outliers they're meant to "
    "find. Two type-keyed aggregates (exact interpolated percentile, "
    "Spark's percentile == DuckDB's quantile_cont) + one flagging "
    "pass; the flag tests the ROUNDED score so the threshold can't "
    "flip on engine float noise. Per-group state is one number per "
    "aggregate — no window, no sort of the fact table.",
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("median_value"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.round(
                        F.lit(0.6745) * F.col("adev") / F.col("mad"), 6
                    )
                    > 3.5,
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "events_value_psi",
    oracle="""
    WITH a AS (SELECT value FROM events WHERE event_type = 'view'),
    b AS (SELECT value FROM events WHERE event_type = 'purchase'),
    span AS (
      SELECT min(lo) AS lo, max(hi) AS hi FROM (
        SELECT min(value) AS lo, max(value) AS hi FROM a
        UNION ALL
        SELECT min(value), max(value) FROM b
      )
    ),
    sa AS (
      SELECT bucket, count(*) * 1.0 / (SELECT count(*) FROM a) AS s
      FROM (
        SELECT least(10, greatest(1,
          CAST(floor((value - span.lo) / ((span.hi - span.lo) / 10))
               AS INTEGER) + 1)) AS bucket
        FROM a, span
      ) GROUP BY bucket
    ),
    sb AS (
      SELECT bucket, count(*) * 1.0 / (SELECT count(*) FROM b) AS s
      FROM (
        SELECT least(10, greatest(1,
          CAST(floor((value - span.lo) / ((span.hi - span.lo) / 10))
               AS INTEGER) + 1)) AS bucket
        FROM b, span
      ) GROUP BY bucket
    )
    SELECT g.bucket,
           round(greatest(coalesce(sa.s, 0), 1e-6), 6) AS share_a,
           round(greatest(coalesce(sb.s, 0), 1e-6), 6) AS share_b,
           round((greatest(coalesce(sa.s, 0), 1e-6)
                  - greatest(coalesce(sb.s, 0), 1e-6))
                 * ln(greatest(coalesce(sa.s, 0), 1e-6)
                      / greatest(coalesce(sb.s, 0), 1e-6)), 6) AS psi_term
    FROM (SELECT unnest(generate_series(1, 10)) AS bucket) g
    LEFT JOIN sa ON g.bucket = sa.bucket
    LEFT JOIN sb ON g.bucket = sb.bucket
    ORDER BY g.bucket
    """,
    tags=("drift", "psi", "monitoring", "new-surface"),
    priority=18,
    doc="Population Stability Index drift detection (operators/"
    "profile.py::population_stability): the standard train-vs-serve "
    "distribution monitor (<0.1 stable, >0.25 retrain), here between "
    "view-event and purchase-event value distributions. Equi-width "
    "buckets over the COMBINED range (scalar broadcast) so both sides "
    "bin identically; per-bucket shares floored at 1e-6 (the empty-"
    "bucket ln guard); per-bucket terms kept so the output shows WHERE "
    "the distribution moved, not just that it did. Two scans + two "
    "bucket aggregates; everything else is 1-row broadcasts. The "
    "oracle replays binning, flooring, and every ln term.",
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.profile import population_stability

    ev = load_table(spark, sf_dir, "events")
    return population_stability(
        ev.filter(F.col("event_type") == "view").select("value"),
        ev.filter(F.col("event_type") == "purchase").select("value"),
        "value",
        buckets=10,
    )


@register(
    "events_weekly_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS INTEGER) AS weekday,
           CAST(extract(hour FROM ts) AS INTEGER) AS hour,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("seasonality", "behavior", "events", "new-surface"),
    priority=18,
    doc="Weekly seasonality profile: the (weekday x hour) activity grid "
    "— counts and mean value per cell — the first chart every "
    "traffic/load analysis draws and the input to seasonal baselining "
    "(anomaly scores against the cell mean rather than a global one). "
    "ONE map-side-combined aggregate to a fixed <=168-row output at any "
    "volume. Weekday convention pinned cross-engine: Spark weekday() "
    "(Mon=0) == DuckDB isodow-1.",
)
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.weekday("ts").alias("weekday"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("weekday", "hour")
    )
