"""MP voting-similarity operators (SURVEY M1-M3, A9).

The reference pivots MPs x votes into a NumPy matrix, then does SVD-PCA and
an O(n^2) Python cosine loop (similarity_service.py:10-108). Here:

* the "matrix" is assembled per-MP as a dense vector via sorted
  collect_list — NOT a pivot: pivot column count = distinct votes (~10^4+)
  breaks at scale, while vectors shuffle once on id_poslanec;
* PCA runs on pyspark.ml (distributed covariance/SVD);
* all-pairs cosine reuses operators.ann.pairwise_topk (cross-group filter =
  cross-party).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pspcz_analyzer_spark.operators.ann import pairwise_topk

# Vote encoding (similarity_service.py:20-28): YES=+1, NO=-1, other 0.
_ENCODE = {"A": 1.0, "B": -1.0}


def encode_votes(mp_votes: DataFrame) -> DataFrame:
    """(id_poslanec, id_hlasovani, vote_num in {+1,-1,0})."""
    return mp_votes.select(
        "id_poslanec",
        "id_hlasovani",
        F.when(F.col("vysledek") == "A", 1.0)
        .when(F.col("vysledek") == "B", -1.0)
        .otherwise(0.0)
        .alias("vote_num"),
    )


def vote_vectors(mp_votes: DataFrame, void_votes: DataFrame | None = None) -> DataFrame:
    """Dense per-MP vote vector over the global ordered vote-id axis.

    Missing (MP, vote) cells become 0.0 exactly like the reference's
    pivot + fill_null(0) (similarity_service.py:30-36), but assembled as
    map -> lookup per ordered vote id: one groupBy per side, no pivot.
    """
    if void_votes is not None:
        from pspcz_analyzer_spark.operators.voting import exclude_void

        mp_votes = exclude_void(mp_votes, void_votes)
    # One cell per (MP, vote): max(vote_num) — the reference's pivot used
    # agg "first" (row-order dependent); max is the deterministic choice.
    enc = (
        encode_votes(mp_votes)
        .groupBy("id_poslanec", "id_hlasovani")
        .agg(F.max("vote_num").alias("vote_num"))
    )
    # Global ordered vote axis, broadcast to every MP row.
    axis = (
        enc.select("id_hlasovani")
        .distinct()
        .agg(F.sort_array(F.collect_list("id_hlasovani")).alias("axis"))
    )
    per_mp = enc.groupBy("id_poslanec").agg(
        F.map_from_entries(
            F.collect_list(F.struct("id_hlasovani", "vote_num"))
        ).alias("vote_map")
    )
    return per_mp.crossJoin(F.broadcast(axis)).select(
        "id_poslanec",
        F.transform(
            F.col("axis"), lambda vid: F.coalesce(F.col("vote_map")[vid], F.lit(0.0))
        ).alias("embedding"),
    )


def mp_cosine_pairs(
    mp_votes: DataFrame,
    void_votes: DataFrame,
    mp_info: DataFrame,
    k: int | None = 20,
    cross_party_only: bool = True,
) -> DataFrame:
    """Top-k most-similar MP pairs by vote-vector cosine, cross-party only
    (similarity_service.py:75-108)."""
    vecs = vote_vectors(mp_votes, void_votes).join(
        F.broadcast(mp_info.select("id_poslanec", "party")), "id_poslanec"
    )
    return pairwise_topk(
        vecs,
        k=k,
        id_col="id_poslanec",
        vec_col="embedding",
        group_col="party" if cross_party_only else None,
    )


def pca_coords(mp_votes: DataFrame, void_votes: DataFrame, n_components: int = 2) -> DataFrame:
    """2-D PCA coordinates per MP from the vote matrix via pyspark.ml
    (distributed; replaces np.linalg.svd at similarity_service.py:47-72).

    Column means are subtracted by PCA's internal centering?  No — Spark ML
    PCA does not center; we center explicitly to match the reference.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = vote_vectors(mp_votes, void_votes)
    # Center per-dimension (reference centers before SVD; Spark ML PCA does
    # not center for us). explode/groupBy = one shuffle on dimension index.
    exploded = vecs.select(
        "id_poslanec", F.posexplode("embedding").alias("dim_idx", "v")
    )
    mu = exploded.groupBy("dim_idx").agg(F.avg("v").alias("mu"))
    centered = (
        exploded.join(F.broadcast(mu), "dim_idx")
        .withColumn("cv", F.col("v") - F.col("mu"))
        .groupBy("id_poslanec")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim_idx", "cv"))
            ).alias("entries")
        )
        .select(
            "id_poslanec",
            F.transform(F.col("entries"), lambda e: e["cv"]).alias("centered"),
        )
    )
    with_vec = centered.withColumn("features", array_to_vector("centered"))
    model = PCA(k=n_components, inputCol="features", outputCol="pca").fit(with_vec)
    out = model.transform(with_vec)
    return out.select(
        "id_poslanec",
        vector_to_array("pca").alias("coords"),
    ).select(
        "id_poslanec",
        F.round(F.col("coords")[0], 6).alias("x"),
        F.round(F.col("coords")[1], 6).alias("y"),
    )
