"""Embedding similarity search + MP vote-similarity coverage (SURVEY M1-M3).

Brute-force cosine is the exact baseline (single scan + top-k merge); the
LSH-bucketed variant is the scale path and gets a rows-only check (its
bucketing planes are deterministic but not reasonably SQL-expressible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.operators.ann import (
    brute_force_topk,
    cosine,
    ivf_topk,
    lsh_bucketed_pairs,
)
from pspcz_analyzer_spark.plans import register
from pspcz_analyzer_spark.plans.voting import (
    _SQL_MP_INFO,
    _SQL_MP_VOTES,
    _SQL_VOID,
    derive_mp_info,
    derive_mp_votes,
    derive_void_votes,
)


@register(
    "ann_bruteforce_top10",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           round(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine_sim
    FROM embeddings e, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    tags=("ann", "M3", "similarity-search"),
    doc="Exact cosine top-k to a query vector: one scan, codegen'd "
    "zip_with dot product, TakeOrderedAndProject merge.",
)
def ann_bruteforce_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("__query"))
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.col("__query").cast("array<double>"),
            ),
            6,
        ).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(10)


@register(
    "ann_lsh_pairs",
    oracle=None,  # LSH planes are deterministic but not SQL-expressible
    tags=("ann", "lsh", "scale-path"),
    doc="Approximate similar pairs via random-hyperplane LSH: 16 sign bits "
    "per table (bucket population ~ n/2^16) OR-amplified over 8 "
    "independent tables — candidate equi-join on (table, bucket), each "
    "survivor scored once (rows-only check; recall vs brute force is "
    "asserted in tests/test_similarity.py).",
)
def ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_pairs(emb, dim=64, num_planes=16, num_tables=8, k=50)


@register(
    "ann_lsh_exact_recall",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM corpus a JOIN corpus b
      ON a.embedding = b.embedding AND a.vec_id < b.vec_id
    ORDER BY id_a, id_b
    """,
    tags=("ann", "lsh", "oracle-paired"),
    priority=36,
    doc="Hyperplane-LSH recall anchor (the embedding twin of "
    "minhash_lsh_exact_recall): over a corpus with planted IDENTICAL "
    "vectors, every identical pair shares all sign bits and must surface "
    "as an LSH candidate in every table; candidates verified by exact "
    "vector equality must equal the full identical-vector pair set the "
    "oracle computes directly. Proves bucketing is content-determined "
    "and the banding join loses no exact duplicate — the correctness "
    "anchor for the approximate ann_lsh_pairs.",
)
def ann_lsh_exact_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import lsh_candidate_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    cand = lsh_candidate_pairs(corpus, dim=64, num_planes=16, num_tables=8)
    va = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    vb = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(F.col("__va") == F.col("__vb"))
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


@register(
    "ann_ivf_top10",
    oracle=None,  # k-means cell boundaries are model-defined; rows-only
    tags=("ann", "ivf", "scale-path"),
    doc="IVF approximate top-k: k-means coarse cells, query probes the 4 "
    "nearest of 16 — scans n_probe/n_centroids of the corpus instead of "
    "all of it (recall vs brute force asserted in tests).",
)
def ann_ivf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_topk(emb, [float(x) for x in q], k=10, n_centroids=16, n_probe=4)


@register(
    "ann_ivf_exhaustive_top10",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           round(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine_sim
    FROM embeddings e, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    tags=("ann", "ivf", "oracle-paired"),
    doc="IVF with n_probe == n_centroids: probing every cell must return "
    "EXACTLY the brute-force answer, so the full IVF machinery (k-means "
    "training, cell assignment, centroid ranking, probe filter, exact "
    "rescore) is verified against the brute-force SQL oracle — the "
    "correctness anchor for the approximate ann_ivf_top10 next to it.",
)
def ann_ivf_exhaustive_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_topk(
        emb, [float(x) for x in q], k=10, n_centroids=16, n_probe=16
    )


@register(
    "embedding_pairs_cross_label",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 200
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
             6) AS cosine_sim
    FROM sub a
    JOIN sub b ON a.vec_id < b.vec_id AND a.label <> b.label
    ORDER BY cosine_sim DESC, id_a, id_b
    LIMIT 20
    """,
    tags=("ann", "M3", "cross-group"),
    doc="Exact top-k most-similar cross-label pairs (the reference's "
    "cross-party cosine top-20, similarity_service.py:93-108).",
)
def embedding_pairs_cross_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import pairwise_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return pairwise_topk(
        emb, k=20, id_col="vec_id", vec_col="embedding", group_col="label"
    ).select("id_a", "id_b", "cosine_sim")


@register(
    "embedding_near_dup",
    oracle="""
    WITH sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 1000
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
             6) AS cosine_sim
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
          >= 0.35
    ORDER BY id_a, id_b
    """,
    tags=("ann", "dedup-embedding", "new-surface"),
    priority=30,
    doc="Embedding-cosine near-duplicate pairs above a similarity "
    "threshold — the semantic-dedup primitive of an LLM data pipeline. "
    "Exact all-pairs formulation on a bounded id range (the oracle-"
    "checkable twin); at corpus scale generate candidates with "
    "lsh_bucketed_pairs (ann_lsh_pairs) and exact-rescore only bucket "
    "collisions, which this same scoring expression verifies.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import pairwise_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    pairs = pairwise_topk(
        emb, k=None, id_col="vec_id", vec_col="embedding", round_to=None
    )
    return (
        pairs.filter(F.col("cosine_sim") >= 0.35)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
        .orderBy("id_a", "id_b")
    )


@register(
    "mp_vote_similarity",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    void_votes AS ({_SQL_VOID}),
    mp_info AS ({_SQL_MP_INFO}),
    clean AS (
      SELECT * FROM mp_votes
      WHERE id_hlasovani NOT IN (SELECT id_hlasovani FROM void_votes)
    ),
    enc AS (
      SELECT id_poslanec, id_hlasovani,
             max(CASE vysledek WHEN 'A' THEN 1.0 WHEN 'B' THEN -1.0 ELSE 0.0 END) AS v
      FROM clean GROUP BY id_poslanec, id_hlasovani
    ),
    norms AS (SELECT id_poslanec, sqrt(sum(v * v)) AS nrm FROM enc GROUP BY 1),
    dots AS (
      SELECT a.id_poslanec AS id_a, b.id_poslanec AS id_b, sum(a.v * b.v) AS dot
      FROM enc a JOIN enc b
        ON a.id_hlasovani = b.id_hlasovani AND a.id_poslanec < b.id_poslanec
      GROUP BY 1, 2
    )
    SELECT d.id_a, d.id_b, ia.party AS group_a, ib.party AS group_b,
           round(CASE WHEN na.nrm * nb.nrm = 0 THEN 0.0
                      ELSE d.dot / (na.nrm * nb.nrm) END, 6) AS cosine_sim
    FROM dots d
    JOIN norms na ON na.id_poslanec = d.id_a
    JOIN norms nb ON nb.id_poslanec = d.id_b
    JOIN mp_info ia ON ia.id_poslanec = d.id_a
    JOIN mp_info ib ON ib.id_poslanec = d.id_b
    WHERE ia.party <> ib.party
    ORDER BY id_a, id_b
    """,
    tags=("M1", "M3", "voting", "similarity"),
    doc="Cross-party MP vote-vector cosine pairs (similarity_service.py:75-108) "
    "— vectors assembled via collect_list, NOT pivot (scale-safe).",
)
def mp_vote_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.similarity import mp_cosine_pairs

    pairs = mp_cosine_pairs(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
        k=None,  # no limit: full deterministic pair list
    )
    return pairs.orderBy("id_a", "id_b")


@register(
    "mp_similarity_top20",
    oracle=f"""
    WITH mp_votes AS ({_SQL_MP_VOTES}),
    void_votes AS ({_SQL_VOID}),
    mp_info AS ({_SQL_MP_INFO}),
    clean AS (
      SELECT * FROM mp_votes
      WHERE id_hlasovani NOT IN (SELECT id_hlasovani FROM void_votes)
    ),
    enc AS (
      SELECT id_poslanec, id_hlasovani,
             max(CASE vysledek WHEN 'A' THEN 1.0 WHEN 'B' THEN -1.0 ELSE 0.0 END) AS v
      FROM clean GROUP BY id_poslanec, id_hlasovani
    ),
    norms AS (SELECT id_poslanec, sqrt(sum(v * v)) AS nrm FROM enc GROUP BY 1),
    dots AS (
      SELECT a.id_poslanec AS id_a, b.id_poslanec AS id_b, sum(a.v * b.v) AS dot
      FROM enc a JOIN enc b
        ON a.id_hlasovani = b.id_hlasovani AND a.id_poslanec < b.id_poslanec
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.id_a, d.id_b, ia.party AS group_a, ib.party AS group_b,
             round(CASE WHEN na.nrm * nb.nrm = 0 THEN 0.0
                        ELSE d.dot / (na.nrm * nb.nrm) END, 6) AS cosine_sim
      FROM dots d
      JOIN norms na ON na.id_poslanec = d.id_a
      JOIN norms nb ON nb.id_poslanec = d.id_b
      JOIN mp_info ia ON ia.id_poslanec = d.id_a
      JOIN mp_info ib ON ib.id_poslanec = d.id_b
      WHERE ia.party <> ib.party
    )
    SELECT * FROM scored
    ORDER BY cosine_sim DESC, id_a, id_b
    LIMIT 20
    """,
    tags=("M3", "voting", "similarity", "serving"),
    doc="The reference's actual similarity endpoint shape: top-20 cross-"
    "party MP pairs (similarity_service.py:75-108) — same sparse-join "
    "cosine as mp_vote_similarity with a TakeOrderedAndProject top-k, "
    "which is what serving returns (the full pair list is the gate twin).",
)
def mp_similarity_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.similarity import mp_cosine_pairs

    return mp_cosine_pairs(
        derive_mp_votes(spark, sf_dir),
        derive_void_votes(spark, sf_dir),
        derive_mp_info(spark, sf_dir),
        k=20,
    )


@register(
    "mp_pca_coords",
    oracle=None,  # SVD basis signs are implementation-defined; rows-only
    tags=("M2", "pca", "voting"),
    doc="2-D PCA of the MP x vote matrix via pyspark.ml (distributed "
    "centering + PCA; replaces np.linalg.svd, similarity_service.py:47-72).",
)
def mp_pca_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.similarity import pca_coords

    return pca_coords(
        derive_mp_votes(spark, sf_dir), derive_void_votes(spark, sf_dir)
    ).orderBy("id_poslanec")


@register(
    "mp_pca_coords_distributed",
    oracle=None,  # same rows-only rationale as mp_pca_coords (basis signs)
    tags=("M2", "pca", "voting", "scale"),
    doc="O(n*k)-driver PCA twin of mp_pca_coords: randomized subspace "
    "iteration applying the centered Gram via sparse-entry joins — the "
    "path for when the sample axis outgrows the driver-side n x n Gram. "
    "Exact-parity + NumPy-parity tests in test_similarity.py (parity "
    "requires an eigengap; on the driver's gapless synthetic votes the "
    "component basis is non-identifiable for any method).",
)
def mp_pca_coords_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.similarity import pca_coords_distributed

    return pca_coords_distributed(
        derive_mp_votes(spark, sf_dir), derive_void_votes(spark, sf_dir)
    ).orderBy("id_poslanec")


@register(
    "ann_ivf_index_roundtrip",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           round(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine_sim
    FROM embeddings e, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    tags=("ann", "ivf", "sink", "oracle-paired", "new-surface"),
    priority=18,
    doc="PERSISTED IVF index round-trip: build the cell-partitioned index "
    "(operators/ann.py::build_ivf_index), query it back with "
    "n_probe == n_centroids — exhaustive probing over the stored layout "
    "must return exactly the brute-force answer, anchoring the "
    "build/extend/query persistence path the same way "
    "ann_ivf_exhaustive_top10 anchors the in-memory one. Partition "
    "pruning at n_probe < n_centroids is plan-asserted in "
    "test_similarity.py::TestIVFIndex.",
)
def ann_ivf_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil as _shutil

    from pspcz_analyzer_spark.operators.ann import build_ivf_index, ivf_index_topk

    emb = load_table(spark, sf_dir, "embeddings")
    from pspcz_analyzer_spark.scratch import scratch_path

    idx = scratch_path(sf_dir, "ivf_idx")
    if os.path.exists(idx):
        _shutil.rmtree(idx)
    build_ivf_index(spark, emb, idx, n_centroids=16)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_index_topk(spark, idx, [float(x) for x in q], k=10, n_probe=16)


@register(
    "corpus_embedding_decontaminate",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 2000
    ),
    ev AS (SELECT e FROM sub WHERE vec_id % 101 = 0)
    SELECT s.vec_id, s.label
    FROM sub s
    WHERE NOT EXISTS (
      SELECT 1 FROM ev
      WHERE list_dot_product(s.e, ev.e)
            / (sqrt(list_dot_product(s.e, s.e))
               * sqrt(list_dot_product(ev.e, ev.e))) >= 0.95
    )
    ORDER BY s.vec_id
    """,
    tags=("pipeline", "decontamination", "ann", "new-surface"),
    priority=18,
    doc="Embedding-space benchmark decontamination: drop corpus vectors "
    "cosine >= 0.95 to ANY planted eval vector (every 101st id) — the "
    "semantic twin of the n-gram decontamination, catching paraphrases "
    "that share no shingle. Eval side broadcasts; the corpus scans once "
    "with codegen'd dot products; LSH blocking is the documented path "
    "beyond broadcast-size eval sets "
    "(operators/ann.py::embedding_decontaminate).",
)
def corpus_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import embedding_decontaminate

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    ev = emb.filter(F.col("vec_id") % 101 == 0)
    return (
        embedding_decontaminate(emb, ev, threshold=0.95)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


@register(
    "semantic_dedup_by_label",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id, a.label AS cluster, MIN(b.vec_id) AS dup_of,
           round(MAX(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e)))), 6) AS max_sim
    FROM sub a JOIN sub b
      ON a.label = b.label AND b.vec_id < a.vec_id
     AND list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e))
            * sqrt(list_dot_product(b.e, b.e))) >= 0.3
    GROUP BY a.vec_id, a.label
    ORDER BY a.vec_id
    """,
    tags=("pipeline", "dedup-embedding", "semdedup", "new-surface"),
    priority=18,
    doc="SemDeDup (cluster-then-prune semantic dedup, arXiv:2303.09540) "
    "with the deterministic `label` column as the clustering — the "
    "oracle-paired anchor proving the within-cluster min-id pruning rule "
    "exactly: removed docs, their surviving dup_of partner, and the max "
    "qualifying cosine all hash-match a brute-force SQL twin. The "
    "k-means production path (semantic_dedup_kmeans) reuses this exact "
    "pruning machinery with model-defined cells.",
)
def semantic_dedup_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, cluster_col="label", threshold=0.3).orderBy("vec_id")


@register(
    "semantic_dedup_farthest",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    elem AS (
      SELECT label, dim, avg(e[dim]) AS m
      FROM sub, unnest(generate_series(1, len(e))) AS t(dim)
      GROUP BY label, dim
    ),
    cent AS (
      SELECT label, list(m ORDER BY dim) AS c FROM elem GROUP BY label
    ),
    scored AS (
      SELECT s.vec_id, s.label, s.e,
             round(list_dot_product(s.e, c.c)
               / (sqrt(list_dot_product(s.e, s.e))
                  * sqrt(list_dot_product(c.c, c.c))), 6) AS csim
      FROM sub s JOIN cent c USING (label)
    )
    SELECT a.vec_id, a.label AS cluster,
           MIN(b.vec_id) AS dup_of,
           round(MAX(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e)))), 6) AS max_sim,
           a.csim AS centroid_sim
    FROM scored a JOIN scored b
      ON a.label = b.label AND b.vec_id != a.vec_id
     AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
     AND list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e))
            * sqrt(list_dot_product(b.e, b.e))) >= 0.3
    GROUP BY a.vec_id, a.label, a.csim
    ORDER BY a.vec_id
    """,
    tags=("pipeline", "dedup-embedding", "semdedup", "new-surface"),
    priority=18,
    doc="SemDeDup with the PAPER'S survivor rule (arXiv:2303.09540 §2: "
    "within each duplicate relation keep the document farthest from its "
    "cluster centroid — the least-prototypical, diversity-preserving "
    "member), deterministic via 6-decimal-rounded centroid cosines with "
    "id tie-breaks. The min-id greedy twin (semantic_dedup_by_label) "
    "shares all pair machinery; this adds one n_clusters-row centroid "
    "aggregate, broadcast back (operators/dedup.py::semantic_dedup, "
    "keep='farthest').",
)
def semantic_dedup_farthest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, cluster_col="label", threshold=0.3, keep="farthest"
    ).orderBy("vec_id")


@register(
    "semantic_dedup_kmeans",
    oracle=None,  # k-means cell boundaries are model-defined; rows-only.
    # Anchored by semantic_dedup_by_label (same pruning machinery,
    # deterministic clustering) + soundness/recall tests in test_dedup.py.
    tags=("pipeline", "dedup-embedding", "semdedup", "scale-path"),
    priority=52,
    doc="SemDeDup production path: k-means cells sized to the corpus "
    "(target_cell_size=128 -> k = ceil(n/128), seeded, same builder as "
    "the IVF index), near-duplicates pruned within cells only — "
    "sum(|cell|^2) pair cost, one cluster-keyed shuffle. The cell count "
    "GROWING with the corpus is what makes total work O(n): the r9 "
    "decade measurement caught the previous fixed k=16 running 66x "
    "slower on 10x data (SCALING.md round-9, the exact failure the "
    "SemDeDup paper's constant-cell-size rule exists to prevent).",
)
def semantic_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, target_cell_size=128, threshold=0.3
    ).orderBy("vec_id")


@register(
    "corpus_extend_semantic",
    oracle="""
    WITH hist AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 400
    ),
    batch AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id >= 400
    )
    SELECT b.vec_id, b.label
    FROM batch b
    WHERE NOT EXISTS (
      SELECT 1 FROM hist h
      WHERE list_dot_product(b.e, h.e)
            / (sqrt(list_dot_product(b.e, b.e))
               * sqrt(list_dot_product(h.e, h.e))) >= 0.35
    )
    ORDER BY b.vec_id
    """,
    tags=("pipeline", "dedup-embedding", "semdedup", "incremental", "new-surface"),
    priority=18,
    doc="Incremental SemDeDup ingestion: history persisted as the "
    "cell-partitioned IVF layout, a new batch assigned to cells and "
    "compared against same-cell history only "
    "(operators/dedup.py::semantic_dedup_extend) — the embedding twin "
    "of the MinHash sidecar (corpus_extend_near_dup). Probed "
    "exhaustively here (n_probe = n_centroids), so the survivors must "
    "equal the brute-force anti-join the oracle computes — anchoring "
    "the index round-trip + cell comparison machinery; the n_probe=1 "
    "production path's recall is asserted in test_dedup.py.",
)
def corpus_extend_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil as _shutil

    from pspcz_analyzer_spark.operators.ann import build_ivf_index
    from pspcz_analyzer_spark.operators.dedup import semantic_dedup_extend

    emb = load_table(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    from pspcz_analyzer_spark.scratch import scratch_path

    idx = scratch_path(sf_dir, "semext_idx")
    if os.path.exists(idx):
        _shutil.rmtree(idx)
    build_ivf_index(spark, hist, idx, n_centroids=8)
    return (
        semantic_dedup_extend(
            spark, batch, idx, threshold=0.35, n_probe=8
        )
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


@register(
    "embedding_matryoshka_prefix",
    oracle="""
    WITH p AS (
      SELECT vec_id,
             list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS pre
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, pre,
             sqrt(list_sum(list_transform(pre, x -> x * x))) AS nrm
      FROM p
    )
    SELECT vec_id,
           CAST(len(pre) AS INTEGER) AS n_dims,
           round(nrm, 6) AS prefix_norm,
           round(CASE WHEN nrm = 0 THEN list_sum(pre)
                      ELSE list_sum(list_transform(pre, x -> x / nrm))
                 END, 6) AS renormed_sum
    FROM n
    ORDER BY vec_id
    """,
    tags=("pipeline", "embedding", "matryoshka", "new-surface"),
    priority=18,
    doc="Matryoshka embedding truncation (MRL, arXiv:2205.13147 — "
    "operators/ann.py::matryoshka_truncate): keep the first 8 dims and "
    "L2-renormalize, THE storage/FLOPs knob for ANN at scale (bucket on "
    "the prefix, rerank on the full vector). Pure codegen'd slice + "
    "aggregate norm, no UDF/shuffle; the oracle pins slice bounds, the "
    "zero-vector guard, and renormalization to 6 decimals.",
)
def embedding_matryoshka_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import matryoshka_truncate

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pre = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    nrm = F.sqrt(F.aggregate(pre, F.lit(0.0), lambda a, x: a + x * x))
    out = matryoshka_truncate(emb, dim=8, out_col="prefix")
    return out.select(
        "vec_id",
        F.size("prefix").alias("n_dims"),
        F.round(nrm, 6).alias("prefix_norm"),
        F.round(
            F.aggregate("prefix", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("renormed_sum"),
    ).orderBy("vec_id")


@register(
    "embedding_hard_negatives",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 150
    ),
    pairs AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS pair_id,
             (a.label = b.label) AS same,
             list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))) AS sim
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT anchor_id, pair_id, same, sim,
             row_number() OVER (
               PARTITION BY anchor_id, same ORDER BY sim DESC, pair_id
             ) AS rank
      FROM pairs
    )
    SELECT anchor_id,
           CASE WHEN same THEN 'positive' ELSE 'negative' END AS role,
           CAST(rank AS BIGINT) AS rank,
           pair_id,
           round(sim, 6) AS cosine_sim
    FROM ranked
    WHERE (same AND rank = 1) OR (NOT same AND rank <= 2)
    ORDER BY anchor_id, role, rank
    """,
    tags=("ann", "contrastive", "training-pairs", "new-surface"),
    priority=18,
    doc="Contrastive training-pair mining (operators/ann.py::"
    "hard_negative_mine): per anchor, the best same-label positive and "
    "the 2 hardest cross-label negatives by exact cosine — the data-prep "
    "step for InfoNCE/triplet embedding training where boundary-adjacent "
    "negatives carry the gradient. Exact all-pairs on a bounded id range "
    "(the oracle twin, same contract as embedding_near_dup); at corpus "
    "scale the same windows rescore LSH/IVF candidate sets. Ranks "
    "compare UNROUNDED sims in both engines; output rounds to 6.",
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import hard_negative_mine

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    return hard_negative_mine(emb, k_neg=2).orderBy("anchor_id", "role", "rank")


@register(
    "semantic_dedup_salted",
    oracle="""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id, a.label AS cluster, MIN(b.vec_id) AS dup_of,
           round(MAX(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e)))), 6) AS max_sim
    FROM sub a JOIN sub b
      ON a.label = b.label AND b.vec_id < a.vec_id
     AND list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e))
            * sqrt(list_dot_product(b.e, b.e))) >= 0.3
    GROUP BY a.vec_id, a.label
    ORDER BY a.vec_id
    """,
    tags=("pipeline", "dedup-embedding", "semdedup", "skew", "new-surface"),
    priority=18,
    doc="SemDeDup's mega-cluster skew escape (operators/dedup.py::"
    "semantic_dedup(salt_cells=8)): the within-cell self-join keyed on "
    "(cluster, salt) — probe side id-hash-salted, build side replicated "
    "8x — so one hot cell's pair generation spreads over 8 tasks instead "
    "of serializing in a straggler. Same oracle as semantic_dedup_by_label "
    "BY DESIGN: every pair still meets exactly once, salting changes the "
    "physical distribution and nothing else. The 80%-hot-cell recovery "
    "is measured in SCALING.md.",
)
def semantic_dedup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, cluster_col="label", threshold=0.3, salt_cells=8
    ).orderBy("vec_id")


@register(
    "ann_ivfpq_exhaustive_top10",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           round(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine_sim
    FROM embeddings e, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    tags=("ann", "ivfpq", "oracle-paired", "new-surface"),
    priority=18,
    doc="IVF-PQ (Jegou et al. 2011) with n_probe == n_centroids and "
    "rerank covering the corpus: the full pipeline — coarse k-means, "
    "residual product-quantization codebooks, 8-byte code words, "
    "ADC broadcast-join scoring, exact rescore from stored vectors — "
    "must recover EXACTLY the brute-force answer, anchoring the "
    "approximate ann_ivfpq_top10 next to it (operators/ann.py::"
    "build_ivfpq_index, ivfpq_topk).",
)
def ann_ivfpq_exhaustive_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import build_ivfpq_index, ivfpq_topk
    from pspcz_analyzer_spark.scratch import scratch_path

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    idx = scratch_path(sf_dir, "ivfpq_idx")
    build_ivfpq_index(spark, emb, idx, n_centroids=8, m_sub=8, k_codes=16)
    return ivfpq_topk(
        spark, idx, [float(x) for x in q], k=10, n_probe=8, rerank=1_000_000
    )


@register(
    "ann_ivfpq_top10",
    oracle=None,  # approximation-defined (probe subset + ADC shortlist);
    # exactness anchored by ann_ivfpq_exhaustive_top10 above.
    tags=("ann", "ivfpq", "rows-only", "new-surface"),
    priority=18,
    doc="Production IVF-PQ query: coarse quantizer and PQ codebooks on "
    "the 32-dim Matryoshka prefix (arXiv:2205.13147 composition — "
    "quarter the residual/codebook cost), candidates scored from 8-byte "
    "codes via the broadcast ADC table over 4 probed cells, top-50 "
    "shortlist exact-rescored from the stored FULL 64-dim vectors. "
    "Bytes touched per candidate: 8 vs 512 — the billion-vector memory "
    "knob. Rows-only by design; the exhaustive twin is the oracle anchor.",
)
def ann_ivfpq_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import build_ivfpq_index, ivfpq_topk
    from pspcz_analyzer_spark.scratch import scratch_path

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    idx = scratch_path(sf_dir, "ivfpq_idx_mrl")
    build_ivfpq_index(
        spark, emb, idx, n_centroids=8, m_sub=8, k_codes=16, prefix_dim=32
    )
    return ivfpq_topk(
        spark, idx, [float(x) for x in q], k=10, n_probe=4, rerank=50,
        prefix_dim=32,
    )


@register(
    "embedding_knn_graph",
    oracle="""
    WITH sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 200
    ),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))),
               6) AS cosine_sim
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT src, dst, cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY src ORDER BY cosine_sim DESC, dst
             ) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT src, dst, cosine_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY src, rank
    """,
    tags=("ann", "knn-graph", "new-surface"),
    priority=18,
    doc="Exact 5-NN graph over a bounded embedding slice (operators/"
    "ann.py::knn_graph): every vector's top-5 cosine neighbors as "
    "directed (src, dst, sim, rank) edges — the substrate for "
    "graph-based ANN, SemDeDup diagnostics, and embedding label "
    "propagation. Ranking on the ROUNDED similarity + id tiebreak keeps "
    "edge membership float-stable across engines. This exact twin "
    "anchors the blocked variant (block_col = IVF cell / LSH bucket), "
    "which swaps the O(n^2) theta-join for an equi-join on the block — "
    "the cluster-then-knn scale path.",
)
def embedding_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.ann import knn_graph

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return knn_graph(emb, k=5).orderBy("src", "rank")
