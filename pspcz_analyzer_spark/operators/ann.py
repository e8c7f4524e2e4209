"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with pure column expressions
(F.zip_with dot products — JVM-side, no Python). Scale path: LSH bucketing
(random-hyperplane signs with deterministic pseudo-random planes) so
candidate generation joins on buckets instead of crossing n x n.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from pspcz_analyzer_spark.operators.pagination import top_k


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns; null-safe
    zero-norm guard (the reference zero-fills: similarity_service.py:75-80)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with both operand norms supplied by the caller.

    For pair-fanout plans (self-joins, candidate joins) the norm of each
    vector is a per-ROW quantity: computing it once per row with
    :func:`_norm` and carrying it through the join replaces two of the
    three per-PAIR array aggregates with a scalar multiply. The arithmetic
    is unchanged — same aggregate expression per operand, same
    ``na * nb == 0`` guard — so scores are bit-identical to cosine()."""
    denom = na * nb
    return F.when(denom == 0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k nearest (cosine) to a constant query vector.

    One scan + TakeOrderedAndProject: the per-row score is codegen'd; no
    shuffle except the final top-k merge. This is the correct *exact* plan
    at any scale — it reads everything once, which is the lower bound.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(F.col(vec_col).cast("array<double>"), q)
    if round_to is not None:
        score = F.round(score, round_to)
    scored = df.select(F.col(id_col), score.alias("cosine_sim"))
    return top_k(scored, [F.desc("cosine_sim"), F.asc(id_col)], k)


def pairwise_topk(
    df: DataFrame,
    k: int | None = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k most-similar pairs (optionally only cross-group pairs,
    the reference's cross-party constraint, similarity_service.py:93-105).

    O(n^2/2) — correct for dims in the thousands (the reference's ~200 MPs);
    use lsh_bucketed_pairs at corpus scale.
    """
    # Cast + norm once per ROW before the O(n^2) fanout (guide §2.3) —
    # per pair only the dot product remains; scores are bit-identical
    # (see cosine_prenormed).
    cols = [id_col, vec_col] + ([group_col] if group_col else [])

    def side(suffix: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        return df.select(
            *[F.col(c).alias(f"{c}_{suffix}") for c in cols if c != vec_col],
            v.alias(f"{vec_col}_{suffix}"),
            _norm(v).alias(f"__n_{suffix}"),
        )

    a, b = side("a"), side("b")
    pairs = a.join(b, F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    if group_col:
        pairs = pairs.filter(F.col(f"{group_col}_a") != F.col(f"{group_col}_b"))
    score = cosine_prenormed(
        F.col(f"{vec_col}_a"),
        F.col(f"{vec_col}_b"),
        F.col("__n_a"),
        F.col("__n_b"),
    )
    if round_to is not None:
        score = F.round(score, round_to)
    out_cols = [F.col(f"{id_col}_a").alias("id_a"), F.col(f"{id_col}_b").alias("id_b")]
    if group_col:
        out_cols += [
            F.col(f"{group_col}_a").alias("group_a"),
            F.col(f"{group_col}_b").alias("group_b"),
        ]
    scored = pairs.select(*out_cols, score.alias("cosine_sim"))
    if not k:
        return scored
    return top_k(scored, [F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")], k)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means cells as the coarse
    index, query probes only the ``n_probe`` nearest cells.

    The second scale path next to LSH: cluster once (sample-trained at
    corpus scale via ``train_fraction``; production persists the model and
    the cell assignment as an indexed table), then a query scans
    n_probe/n_centroids of the data — cell pruning is a plain ``isin``
    filter, so it pushes into the storage scan when the assignment is a
    partition/bucket column. Deterministic: fixed k-means seed, driver-side
    centroid ranking, id tiebreaks in the final top-k.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv"),
    )
    train = feat if train_fraction >= 1.0 else feat.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="__fv", predictionCol="__cell"
    ).fit(train)
    assigned = model.transform(feat)
    q = np.asarray(query_vec, dtype="float64")
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for ci, c in enumerate(model.clusterCenters()):
        cn = np.linalg.norm(c) or 1.0
        sims.append((float(np.dot(q, c) / (qn * cn)), ci))
    probe = [ci for _, ci in sorted(sims, reverse=True)[:n_probe]]
    cells = assigned.filter(F.col("__cell").isin(probe)).select(id_col, vec_col)
    return brute_force_topk(cells, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _plane(dim: int, plane_idx: int, table_idx: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane from a tiny splitmix-style PRNG
    (no Date.now/np.random — reproducible across runs and machines). Each
    (table, plane) pair gets an independent seed."""
    out = []
    state = ((table_idx << 20) + plane_idx + 1) * 0x9E3779B97F4A7C15 & (1 << 64) - 1
    for _ in range(dim):
        state = (state ^ (state >> 30)) * 0xBF58476D1CE4E5B9 & (1 << 64) - 1
        state = (state ^ (state >> 27)) * 0x94D049BB133111EB & (1 << 64) - 1
        v = ((state >> 11) / float(1 << 53)) * 2.0 - 1.0
        out.append(v)
    return out


def _bucket_expr(vec_col: str, dim: int, num_planes: int, table_idx: int) -> F.Column:
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _plane(dim, i, table_idx)])
        bit = F.when(
            _dot(v, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    vec_col: str = "embedding",
    table_idx: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row: sign bits of <v, plane_i>.

    Rows in the same bucket are cosine-close with high probability; bucket
    id is a deterministic function of the vector, so candidate joins are
    plain equi-joins on `lsh_bucket` (shuffle keyed by bucket — the 100 TB
    path for similarity self-join).
    """
    return df.withColumn("lsh_bucket", _bucket_expr(vec_col, dim, num_planes, table_idx))


def _lsh_tags(
    df: DataFrame,
    dim: int,
    num_planes: int,
    num_tables: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, table, bucket) tags for every vector x table, computed as ONE
    NumPy matmul per Arrow batch: V (n x dim) @ planes (dim x T*P) ->
    sign bits -> bucket ids. The same math as _bucket_expr (asserted equal
    in tests), but vectorized — interpreted higher-order-function dot
    products cost ~100x more per element."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [[_plane(dim, i, t) for i in range(num_planes)] for t in range(num_tables)]
    )  # (T, P, dim)
    flat = planes.reshape(num_tables * num_planes, dim).T  # (dim, T*P)
    weights = (1 << np.arange(num_planes)).astype("int64")

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            V = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            S = (V @ flat) >= 0  # (n, T*P) sign bits
            B = (S.reshape(n, num_tables, num_planes) * weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), num_tables),
                    "t": np.tile(np.arange(num_tables, dtype="int32"), n),
                    "b": B.reshape(-1),
                }
            )

    from pspcz_analyzer_spark.operators.dedup import _spread

    src = _spread(df.select(id_col, vec_col), scan_shaped=True)
    return src.mapInPandas(run, schema=f"{id_col} long, t int, b long")


def lsh_candidate_pairs(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct LSH candidate pairs (id_a < id_b): one equi-join on
    (table, bucket), duplicates across tables collapsed before any
    scoring. Identical vectors share every sign bit, so they collide in
    EVERY table — exact duplicates are structurally guaranteed
    candidates, which is what the recall gate query verifies."""
    tagged = _lsh_tags(df, dim, num_planes, num_tables, id_col, vec_col)
    a = tagged.select(F.col(id_col).alias("id_a"), "t", "b")
    b = tagged.select(F.col(id_col).alias("id_b"), "t", "b")
    return (
        a.join(b, ["t", "b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_bucketed_pairs(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    num_tables: int = 8,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k similar pairs: exact cosine, only within LSH
    buckets, OR-amplified across ``num_tables`` independent hash tables.

    AND within a table (num_planes sign bits agree => per-bucket population
    ~ n / 2^planes, killing the n^2/buckets blowup) x OR across tables
    (a close pair is a candidate if ANY table collides => recall
    1 - (1 - p^planes)^tables). Candidates meet via one equi-join on
    (table, bucket); duplicates across tables collapse before scoring, so
    each surviving pair is scored once.
    """
    cand = lsh_candidate_pairs(df, dim, num_planes, num_tables, id_col, vec_col)
    # Cast + norm once per row on each vector side (guide §2.3); the
    # candidate join then pays one dot product per surviving pair.
    vcast = F.col(vec_col).cast("array<double>")
    va = df.select(
        F.col(id_col).alias("id_a"), vcast.alias("vec_a"), _norm(vcast).alias("__n_a")
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), vcast.alias("vec_b"), _norm(vcast).alias("__n_b")
    )
    score = cosine_prenormed(
        F.col("vec_a"), F.col("vec_b"), F.col("__n_a"), F.col("__n_b")
    )
    if round_to is not None:
        score = F.round(score, round_to)
    pairs = cand.join(va, "id_a").join(vb, "id_b").select(
        "id_a", "id_b", score.alias("cosine_sim")
    )
    return top_k(pairs, [F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")], k)


def build_ivf_index(
    spark,
    df: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
    seed: int = 42,
) -> None:
    """Persist an IVF index: the build-once half of :func:`ivf_topk`'s
    "production persists the model" contract.

    Layout under ``index_dir``:
      ``centroids/``  (cell int, centroid array<double>) — n_centroids rows
      ``vectors/``    the corpus PARTITIONED BY its cell assignment

    Cell-partitioning is the point: a query's n_probe ``isin`` filter
    becomes a PARTITION filter, so the scan physically reads only
    n_probe/n_centroids of the files (directory-level pruning — verified
    by plan in tests) instead of filtering rows after reading everything.
    Train on a sample at corpus scale (`train_fraction`); k-means cost is
    O(sample * n_centroids * iters), assignment is one scan.
    """
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv"),
    )
    train = feat if train_fraction >= 1.0 else feat.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="__fv", predictionCol="__cell"
    ).fit(train)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    centroids.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    (
        model.transform(feat)
        .select(id_col, vec_col, F.col("__cell").cast("int").alias("cell"))
        # one producing task per cell partition => no small-file fanout
        .repartition(n_centroids, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "vectors"))
    )


def extend_ivf_index(
    spark,
    new_vecs: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted IVF index WITHOUT retraining:
    assign each to its nearest stored centroid (tiny broadcast cross of
    n_centroids rows, argmin by cosine) and append into that cell's
    partition. Centroids drift as data grows — rebuild on a schedule; the
    standard IVF trade (FAISS add() does the same).

    Assignment is EUCLIDEAN argmin — the metric k-means trained with —
    not cosine: for near-collinear centroids (clusters differing in
    magnitude) cosine would pick the wrong cell and split a cluster
    across partitions.
    """
    import os

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        new_vecs.crossJoin(F.broadcast(cents))
        .withColumn("__d2", d2)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("cell"))
            ),
        )
        .filter(F.col("__rk") == 1)
        .select(id_col, vec_col, "cell")
    )
    ranked.write.mode("append").partitionBy("cell").parquet(
        os.path.join(index_dir, "vectors")
    )


def ivf_index_topk(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: rank the stored centroids driver-side
    (n_centroids rows — metadata scale), then scan ONLY the n_probe
    nearest cell partitions and exact-rescore.

    The cell predicate is `isin` over a partition column, so Parquet
    directory pruning applies before any IO; with n_probe=n_centroids the
    result is EXACTLY brute force (the oracle anchor).
    """
    import os

    import numpy as np

    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    q = np.asarray(query_vec, dtype="float64")
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for r in cents:
        c = np.asarray(r["centroid"], dtype="float64")
        cn = np.linalg.norm(c) or 1.0
        sims.append((float(np.dot(q, c) / (qn * cn)), r["cell"]))
    probe = [cell for _, cell in sorted(sims, reverse=True)[:n_probe]]
    vecs = (
        spark.read.parquet(os.path.join(index_dir, "vectors"))
        .filter(F.col("cell").isin(probe))
        .select(id_col, vec_col)
    )
    return brute_force_topk(vecs, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def embedding_decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drop corpus rows whose embedding is cosine-close to ANY eval/benchmark
    vector — semantic decontamination, the embedding twin of the n-gram
    `corpusprep.decontaminate` (catches paraphrases that share no 5-gram).

    Eval sets are tiny at any corpus scale, so the eval side BROADCASTS
    and the corpus is scanned once with a codegen'd per-pair cosine — an
    exact-baseline theta anti-join costing |corpus| x |eval| dot products
    with no shuffle. At eval sets beyond broadcast size, block first with
    `lsh_bucket` and rescore candidates (the documented LSH scale path).
    """
    # Norms are per-row quantities: compute the eval-vector norm once per
    # (broadcast) eval row and the corpus norm once per corpus row, so the
    # |corpus| x |eval| theta condition pays one dot product per pair
    # instead of three array aggregates (guide §2.3; scores bit-identical
    # per cosine_prenormed). The corpus norm rides on a projected column —
    # dropped after the anti-join, which preserves the corpus schema.
    evc = F.col(vec_col).cast("array<double>")
    ev = evalset.select(evc.alias("__ev"), _norm(evc).alias("__evn"))
    withn = corpus.withColumn(
        "__cn", _norm(F.col(vec_col).cast("array<double>"))
    )
    close = (
        cosine_prenormed(
            F.col(vec_col).cast("array<double>"),
            F.col("__ev"),
            F.col("__cn"),
            F.col("__evn"),
        )
        >= F.lit(threshold)
    )
    return withn.join(F.broadcast(ev), on=close, how="left_anti").drop("__cn")


def matryoshka_truncate(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    out_col: str | None = None,
    renormalize: bool = True,
) -> DataFrame:
    """Matryoshka embedding truncation (Kusupati et al. 2022,
    arXiv:2205.13147): keep the first ``dim`` coordinates and L2-renormalize
    — the standard storage/compute trade for MRL-trained embedding columns,
    where prefixes are themselves valid lower-capacity embeddings. At
    100 TB this is THE knob for ANN index cost: a 4x-shorter prefix
    quarters index bytes and distance FLOPs at a small recall cost, and
    the coarse-quantize/rerank pattern (bucket on the prefix, rescore
    survivors on the full vector) composes directly with the IVF/LSH ops
    here.

    Pure codegen'd projection (slice + aggregate-based norm), no UDF, no
    shuffle. Zero vectors stay zero rather than dividing by 0.
    """
    c = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
    if renormalize:
        nrm = F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))
        c = F.when(nrm == 0.0, c).otherwise(
            F.transform(c, lambda x: x / nrm)
        )
    return df.withColumn(out_col or vec_col, c)


def hard_negative_mine(
    emb: DataFrame,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive training-pair mining: for every anchor, its best
    positive (most-similar SAME-label vector) and its ``k_neg`` hardest
    negatives (most-similar OTHER-label vectors) — the standard data-prep
    step for training embedding models with InfoNCE/triplet losses, where
    in-batch random negatives are too easy and the hard ones near the
    decision boundary carry the gradient signal.

    Output: one row per (anchor, mined pair) — ``role`` 'positive'
    (rank 1) or 'negative' (rank 1..k_neg), with the exact cosine
    rounded to 6; deterministic ties by pair id. Anchors lacking a
    same-label partner simply have no positive row.

    Exact all-pairs formulation — the oracle-checkable twin, same
    contract as ``embedding_near_dup``: cap the id range for the gate;
    at corpus scale generate candidates with ``lsh_bucketed_pairs`` (or
    the IVF index) per anchor and rescore with this same cosine — the
    windows here apply unchanged to the candidate set. One shuffle per
    window key (the anchor id).
    """
    from pyspark.sql import Window

    # Norm once per row before the n^2 fanout (guide §2.3; bit-identical
    # per cosine_prenormed) — per pair only the dot product remains.
    vcast = F.col(vec_col).cast("array<double>")
    a = emb.select(
        F.col(id_col).alias("anchor_id"),
        vcast.alias("__va"),
        _norm(vcast).alias("__na"),
        F.col(label_col).alias("__la"),
    )
    b = emb.select(
        F.col(id_col).alias("pair_id"),
        vcast.alias("__vb"),
        _norm(vcast).alias("__nb"),
        F.col(label_col).alias("__lb"),
    )
    pairs = a.join(b, F.col("anchor_id") != F.col("pair_id")).withColumn(
        "__sim",
        cosine_prenormed(
            F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
        ),
    )
    same = F.col("__la") == F.col("__lb")
    w_pos = Window.partitionBy("anchor_id", same.cast("int")).orderBy(
        F.desc("__sim"), F.asc("pair_id")
    )
    ranked = pairs.withColumn("rank", F.row_number().over(w_pos))
    keep = (same & (F.col("rank") == 1)) | (~same & (F.col("rank") <= k_neg))
    return (
        ranked.filter(keep)
        .select(
            "anchor_id",
            F.when(same, F.lit("positive")).otherwise(F.lit("negative")).alias(
                "role"
            ),
            F.col("rank").cast("long").alias("rank"),
            "pair_id",
            F.round("__sim", 6).alias("cosine_sim"),
        )
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_encode(df: DataFrame, slices: Column, cb_rows, id_col: str) -> DataFrame:
    """Nearest code per (vector, subspace) as ONE codegen'd expression.

    The previous shape — posexplode to (id, m) rows, broadcast-join the
    codebook (k_codes-way fanout), min-struct aggregate, regroup — paid
    two shuffles and a join stage to argmin over a table that is
    kilobytes. The codebook embeds as a literal nested array instead and
    the argmin runs inline per row: zero shuffles, zero joins, identical
    values (same ``_sqdist`` fold, and ``array_sort`` on
    ``struct(d2, code)`` breaks ties exactly like
    ``min(struct(d2, code))`` — smallest distance, then smallest code).
    """
    by_m: dict = {}
    for m, c, cc in cb_rows:
        by_m.setdefault(m, {})[c] = cc
    cb_lit = F.array(*[
        F.array(*[
            F.array(*[F.lit(float(x)) for x in by_m[m][c]])
            for c in sorted(by_m[m])
        ])
        for m in sorted(by_m)
    ])
    codes = F.transform(
        slices,
        lambda s, i: F.array_sort(
            F.transform(
                F.element_at(cb_lit, i + F.lit(1)),
                lambda cb, c: F.struct(
                    _sqdist(s, cb).alias("d"), c.alias("c")
                ),
            )
        )[0]["c"],
    )
    return df.select(id_col, "cell", codes.alias("codes"))


def _lloyd(X, k: int, iters: int = 20, seed: int = 0):
    """Deterministic driver-side Lloyd k-means for PQ codebooks (the
    sample is capped, so this clusters kilobytes). Seeded random-point
    init; empty clusters re-seeded from the farthest points; if fewer
    distinct points than k, the codebook repeats points (harmless: codes
    just never map there)."""
    import numpy as np

    if len(X) == 0:
        return np.zeros((k, 1))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(X), size=min(k, len(X)), replace=False)
    C = X[idx].copy()
    while len(C) < k:
        C = np.vstack([C, X[rng.integers(0, len(X))]])
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
            else:
                C[c] = X[d2.min(axis=1).argmax()]
    return C


def build_ivfpq_index(
    spark,
    df: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    m_sub: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix_dim: int | None = None,
    train_fraction: float = 1.0,
    seed: int = 42,
) -> None:
    """Persist an IVF-PQ index (Jegou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): coarse IVF cells + per-subspace
    residual codebooks + per-vector code words — the standard
    billion-vector memory knob. Candidate scoring reads ``m_sub`` small
    ints per vector (here 8 bytes) instead of the full float vector
    (64 dims x 8 = 512 bytes): a 64x scan-cost reduction at query time,
    with survivors exact-rescored from the stored full vectors.

    Layout under ``index_dir``:
      ``centroids/``  (cell, centroid)             — n_centroids rows
      ``codebooks/``  (m, code, cb array<double>)  — m_sub*k_codes rows
      ``codes/``      (id, cell, codes array<int>) partitioned by cell
      ``vectors/``    (id, vec) partitioned by cell — exact-rerank source

    ``prefix_dim`` composes with :func:`matryoshka_truncate`: the coarse
    quantizer, residuals, and codebooks operate on the MRL prefix
    (quartering index build cost and code error for prefix-trained
    embeddings) while ``vectors/`` keeps the FULL vector so the rerank
    stays exact — the coarse-quantize-on-prefix / rescore-on-full
    pattern from the Matryoshka paper (arXiv:2205.13147 §4.3).

    Plan shape: one KMeans coarse fit (sampled), one residual pass
    (broadcast centroid join, codegen'd zip_with), per-subspace code
    assignment as ONE posexplode + broadcast-codebook join + min-struct
    aggregate (no per-subspace scans), everything partitioned by cell on
    write. Encoding never shuffles the corpus by more than (id, m) rows.
    """
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    work_vec = (
        F.slice(F.col(vec_col).cast("array<double>"), 1, prefix_dim)
        if prefix_dim
        else F.col(vec_col).cast("array<double>")
    )
    feat = df.select(
        F.col(id_col), F.col(vec_col), work_vec.alias("__wv")
    ).withColumn("__fv", array_to_vector(F.col("__wv")))
    train = feat if train_fraction >= 1.0 else feat.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="__fv", predictionCol="__cell"
    ).fit(train)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    centroids.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    assigned = (
        model.transform(feat)
        .select(
            id_col, vec_col, "__wv", F.col("__cell").cast("int").alias("cell")
        )
        .join(F.broadcast(centroids), "cell")
        .withColumn(
            "__res", F.zip_with("__wv", "centroid", lambda a, b: a - b)
        )
        .drop("centroid")
    )
    # The assignment pass feeds three consumers (vectors write, codebook
    # sample, code encode) — persist so the k-means transform + residual
    # join run once, not three times.
    assigned.persist()
    # Full vectors, cell-partitioned: the exact-rerank source (and the
    # plain-IVF fallback reader).
    (
        assigned.select(id_col, vec_col, "cell")
        .repartition(n_centroids, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "vectors"))
    )

    # __res = __wv - centroid, so its length is the centroid's — already
    # on the driver from the fit; no probe action needed.
    dim = len(model.clusterCenters()[0])
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub_d = dim // m_sub
    slices = F.array(
        *[F.slice("__res", m * sub_d + 1, sub_d) for m in range(m_sub)]
    )
    # (id, cell, m, sub-residual): one pass, m_sub rows per vector.
    sub = assigned.select(
        id_col, "cell", F.posexplode(slices).alias("m", "__sub")
    )
    # Per-subspace codebooks: FAISS-style sample-trained — a bounded
    # hash-sampled collect (<= ~sample_cap vectors regardless of corpus
    # size) fitted driver-side with a deterministic Lloyd loop. Fitting
    # m_sub separate Spark ML jobs here would pay m_sub job overheads to
    # cluster kilobytes; the sample IS the standard practice (FAISS
    # trains PQ on a capped sample too) and the resulting codebook is
    # broadcast metadata either way. Residual/code ASSIGNMENT below is
    # still one full distributed pass.
    sample_cap = 4096
    n = assigned.count()
    stride = max(1, n // sample_cap)
    samp = sub if stride == 1 else sub.filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
    )
    rows = samp.select(id_col, "m", "__sub").collect()
    rows.sort(key=lambda r: (r["m"], r[0]))  # collect order -> deterministic
    import numpy as np

    cb_rows = []
    for m in range(m_sub):
        X = np.array([r["__sub"] for r in rows if r["m"] == m], dtype="float64")
        for c, cc in enumerate(_lloyd(X, k_codes, seed=seed + m)):
            cb_rows.append((m, c, [float(x) for x in cc]))
    codebooks = spark.createDataFrame(
        cb_rows, "m int, code int, cb array<double>"
    )
    codebooks.write.mode("overwrite").parquet(
        os.path.join(index_dir, "codebooks")
    )
    # Encode: nearest code per (vector, subspace) — literal-codebook
    # argmin expression straight off the cached assignment pass
    # (:func:`_pq_encode`): no explode fanout, no join, no shuffle.
    codes = _pq_encode(assigned, slices, cb_rows, id_col)
    (
        codes.repartition(n_centroids, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "codes"))
    )
    assigned.unpersist()


def extend_ivfpq_index(
    spark,
    new_vecs: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted IVF-PQ index WITHOUT retraining
    — the PQ twin of :func:`extend_ivf_index` (FAISS ``add()``): coarse
    cell by Euclidean argmin against the STORED centroids, residual
    encoded against the STORED codebooks, and both the code word and the
    full vector appended into the cell's partition. Centroids and
    codebooks are frozen, so per-batch cost is one broadcast-join encode
    pass over the batch — flat as the index grows; quantization error
    drifts as the data distribution moves (rebuild on a schedule, the
    standard IVF-PQ trade).

    The working dimensionality (MRL prefix or full) is recovered from
    the stored centroid length, so the caller needs no prefix_dim —
    build-time layout decisions live in the index, not the call site.
    """
    import os

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    codebooks = spark.read.parquet(os.path.join(index_dir, "codebooks"))
    first = cents.first()
    work_dim = len(first["centroid"])
    m_sub = 1 + codebooks.agg(F.max("m")).first()[0]
    sub_d = work_dim // m_sub
    n_centroids = cents.count()
    feat = new_vecs.select(
        F.col(id_col),
        F.col(vec_col),
        F.slice(F.col(vec_col).cast("array<double>"), 1, work_dim).alias(
            "__wv"
        ),
    )
    assigned = (
        feat.crossJoin(F.broadcast(cents))
        .withColumn("__d2", _sqdist(F.col("__wv"), F.col("centroid")))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("cell"))
            ),
        )
        .filter(F.col("__rk") == 1)
        .withColumn(
            "__res", F.zip_with("__wv", "centroid", lambda a, b: a - b)
        )
        .select(id_col, vec_col, "cell", "__res")
    )
    assigned.persist()
    (
        assigned.select(id_col, vec_col, "cell")
        .repartition(n_centroids, "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "vectors"))
    )
    slices = F.array(
        *[F.slice("__res", m * sub_d + 1, sub_d) for m in range(m_sub)]
    )
    cb_rows = [
        (r["m"], r["code"], r["cb"]) for r in codebooks.collect()
    ]
    codes = _pq_encode(assigned, slices, cb_rows, id_col)
    (
        codes.repartition(n_centroids, "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "codes"))
    )
    assigned.unpersist()


def ivfpq_topk(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix_dim: int | None = None,
) -> DataFrame:
    """Query an IVF-PQ index: rank centroids driver-side, build the ADC
    distance table for the probed cells (n_probe * m_sub * k_codes
    entries — metadata scale, broadcast), score candidates by summing
    m_sub table lookups over their stored codes, keep the best
    ``rerank``, and exact-rescore those from the stored FULL vectors.

    The scan over ``codes/`` is partition-pruned to the probed cells and
    reads only (id, codes) — bytes per candidate = m_sub codes, not the
    vector; the asymmetric-distance join is a broadcast equi-join on
    (cell, m, code) followed by a sum aggregate, all codegen'd. With
    ``n_probe = n_centroids`` and ``rerank >= corpus`` the result is
    EXACTLY brute force (the oracle anchor, like ann_ivf_exhaustive)."""
    import os

    import numpy as np

    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    cbs = spark.read.parquet(os.path.join(index_dir, "codebooks")).collect()
    q_full = np.asarray(query_vec, dtype="float64")
    q = q_full[:prefix_dim] if prefix_dim else q_full
    qn = np.linalg.norm(q) or 1.0
    ranked = sorted(
        (
            (
                float(
                    np.dot(q, np.asarray(r["centroid"])) /
                    (qn * (np.linalg.norm(r["centroid"]) or 1.0))
                ),
                r["cell"],
            )
            for r in cents
        ),
        reverse=True,
    )
    probe = [cell for _, cell in ranked[:n_probe]]
    cent_by_cell = {r["cell"]: np.asarray(r["centroid"]) for r in cents}
    m_sub = 1 + max(r["m"] for r in cbs)
    sub_d = len(q) // m_sub
    # ADC table: ||q_residual_slice - codebook_entry||^2 per (cell, m, code).
    table = []
    for cell in probe:
        rq = q - cent_by_cell[cell]
        for r in cbs:
            s = rq[r["m"] * sub_d : (r["m"] + 1) * sub_d]
            d2 = float(np.sum((s - np.asarray(r["cb"])) ** 2))
            table.append((cell, r["m"], r["code"], d2))
    adc = spark.createDataFrame(table, "cell int, m int, code int, d2 double")
    cand = (
        spark.read.parquet(os.path.join(index_dir, "codes"))
        .filter(F.col("cell").isin(probe))
        .select(id_col, "cell", F.posexplode("codes").alias("m", "code"))
        .join(F.broadcast(adc), ["cell", "m", "code"])
        .groupBy(id_col)
        .agg(F.sum("d2").alias("__adc"))
    )
    shortlist = top_k(cand, [F.asc("__adc"), F.asc(id_col)], rerank).select(id_col)
    vecs = (
        spark.read.parquet(os.path.join(index_dir, "vectors"))
        .filter(F.col("cell").isin(probe))
        .join(F.broadcast(shortlist), id_col)
        .select(id_col, vec_col)
    )
    return brute_force_topk(
        vecs, [float(x) for x in query_vec], k=k, id_col=id_col, vec_col=vec_col
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """k-nearest-neighbor GRAPH: for every vector, its top-``k`` cosine
    neighbors as directed edges (src, dst, cosine_sim, rank) — the
    substrate for graph-based ANN serving, SemDeDup-style diagnostics,
    label propagation over embeddings, and kNN-classifier features.

    Exact mode (``block_col=None``) scores all ordered pairs — the
    oracle-checkable twin, O(n^2), for bounded slices. At corpus scale
    pass a blocking column (an IVF cell from ``build_ivf_index`` or an
    LSH bucket from ``lsh_bucket``): pairing becomes an EQUI-join on the
    block and each node ranks only in-block neighbors — the standard
    cluster-then-knn approximation whose recall the exact twin measures
    (same contract as ann_ivf_exhaustive_top10 anchoring ann_ivf_top10).

    Ranking uses the ROUNDED similarity with an id tiebreak, so edge
    membership is stable under engine float noise (see plans/__init__
    parity notes). Per-node state is one window partition — never a
    global sort.
    """
    from pyspark.sql import Window

    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    a = df.select(*[F.col(c).alias(f"{c}_a") for c in cols])
    b = df.select(*[F.col(c).alias(f"{c}_b") for c in cols])
    if block_col:
        pairs = a.join(
            b, F.col(f"{block_col}_a") == F.col(f"{block_col}_b")
        ).filter(F.col(f"{id_col}_a") != F.col(f"{id_col}_b"))
    else:
        pairs = a.join(b, F.col(f"{id_col}_a") != F.col(f"{id_col}_b"))
    score = F.round(
        cosine(
            F.col(f"{vec_col}_a").cast("array<double>"),
            F.col(f"{vec_col}_b").cast("array<double>"),
        ),
        round_to,
    )
    scored = pairs.select(
        F.col(f"{id_col}_a").alias("src"),
        F.col(f"{id_col}_b").alias("dst"),
        score.alias("cosine_sim"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine_sim"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cosine_sim", "rank")
    )
