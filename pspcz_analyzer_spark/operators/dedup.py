"""Deduplication operators for large text corpora.

Five tiers, cheapest to most robust, all expressed as DataFrame plans:

  exact_dedup          hash-groupBy on a content fingerprint (one shuffle)
  ngram_jaccard_pairs  token/shingle Jaccard via explode + self-join on the
                       shingle — exact pairwise similarity, band-limited by
                       requiring at least one shared shingle
  minhash_lsh_pairs    MinHash signatures + banding: candidate pairs only
                       bucket-join on (band, band_hash) — the 100 TB path
                       (pair cost ~ duplicates, not n^2)
  simhash              64-bit SimHash fingerprint per doc; near-dups share
                       fingerprints at small Hamming distance
  semantic_dedup       SemDeDup: k-means cells over an embedding column,
                       near-dups pruned within cells — catches paraphrases
                       no surface-form tier sees; O(n) with cell count
                       grown alongside the corpus (semantic_dedup_extend:
                       the incremental variant against a stored
                       cell-partitioned index)

Plus the SPAN granularity (ExactSubstr, Lee et al. 2022): document-level
tiers drop whole documents; duplicate_span_stats / remove_duplicate_spans
find and excise verbatim token runs repeated ACROSS documents (license
blocks, boilerplate headers, syndicated passages) while each document's
unique prose survives.

Determinism: every hash is Spark's xxhash64/crc32 with fixed seeds — stable
across runs and partitionings, so signatures are reproducible (required for
incremental dedup at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pspcz_analyzer_spark.functions.text import fingerprint, normalize_text

# Large Mersenne prime bounding hash values.
_MERSENNE = (1 << 61) - 1


# Shared CPU-stage widening helper (kept under the old private name for
# existing imports).
from pspcz_analyzer_spark.operators.partitioning import (
    explode_notnull,
    posexplode_notnull,
    spread as _spread,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per identical normalized text.

    One shuffle on the md5 fingerprint; survivors keep their full row via a
    semi-join back (so arbitrarily wide rows never ride the shuffle).
    """
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


def _shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, word n-gram shingle array) — one row per doc; de-duplicated
    per doc by default (``distinct=False`` keeps every occurrence, for
    repetition statistics).

    Formulation note (measured, not guessed): the obvious
    ``transform(sequence(...), i -> concat_ws(' ', slice(__t, i+1, n)))``
    is quadratic per document — ``slice`` copies an O(n) sub-array per
    element — and naive per-element access ``__t[i + k]`` is worse in real
    plans, because CollapseProject inlines the tokenizing ``split(...)``
    into the lambda and re-evaluates it PER ELEMENT. Instead, zip the token
    array with its k-shifted slices (``arrays_zip`` of per-ROW slices, so
    the tokenizer is referenced a bounded n+1 times per row no matter how
    the optimizer inlines it) and emit one concat per zipped struct.
    Short documents (< n tokens) produce one partial shingle, matching the
    slice semantics and the SQL oracles.
    """
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__t")
    )
    if n == 1:
        arr = "array_distinct(__t)" if distinct else "__t"
        return toks.select(id_col, F.expr(arr).alias("__sh"))
    shifted = ", ".join(
        f"slice(__t, {k + 1}, greatest(size(__t) - {k}, 0))" for k in range(n)
    )
    zipped = f"slice(arrays_zip({shifted}), 1, greatest(size(__t) - {n - 1}, 1))"
    fields = ", ".join(f"s['{k}']" for k in range(n))
    gram = f"transform({zipped}, s -> concat_ws(' ', {fields}))"
    if distinct:
        gram = f"array_distinct({gram})"
    return toks.select(id_col, F.expr(gram).alias("__sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    scan_shaped: bool = True,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word n-gram shingle sets.

    explode(shingles) -> self-join on shingle -> count intersections ->
    |A ∪ B| = |A| + |B| - |A ∩ B|. Only docs sharing >= 1 shingle ever meet,
    so cost tracks true overlap, not n^2. Shuffles: explode join on shingle
    + final pair aggregation.

    ``max_shingle_df`` caps shingle document frequency: shingles appearing
    in more than that many docs (stopword n-grams) are dropped BEFORE the
    self-join — they dominate join fanout (df^2 pairs each) while carrying
    no discriminative signal. Jaccard is then computed over the reduced
    shingle universe (set sizes counted after the cap), a standard
    approximation for corpus-scale near-dup mining; leave None for the
    exact oracle-checkable semantics.

    ``scan_shaped`` declares the INPUT's plan shape for the parallelism
    guard (see operators/partitioning.spread): leave True for a projected
    table scan (the normal corpus case); pass False when feeding the
    output of a join/aggregate, where the partition probe would double-
    execute the upstream stages.

    Plan notes: shingle arrays are materialized once per row (not re-derived
    per plan branch — set sizes come from array length, no second explode),
    and the two self-join sides share one shuffle via exchange reuse.
    """
    arrays = _shingle_arrays(_spread(df, scan_shaped=scan_shaped), id_col, text_col, n)
    # Join/shuffle on the 8-byte shingle hash, not the string — same pair
    # semantics (xxhash64 collisions are ~2^-64 per candidate pair), far
    # less shuffle volume.
    sh = explode_notnull(arrays, "__sh", "__s", keep=(id_col,)).select(
        F.col(id_col), F.xxhash64("__s").alias("shingle")
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    else:
        # Distinct-shingle count straight from the array: no explode, no
        # extra shuffle on doc id.
        sizes = arrays.select(F.col(id_col), F.size("__sh").alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "__raw_jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("__raw_jaccard") >= threshold)  # raw, not rounded: keeps
        # the cutoff identical to any SQL oracle computing the same ratio
        .select("id_a", "id_b", F.round("__raw_jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_df: int | None = None,
    scan_shaped: bool = True,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: ``c(A->B) = |A ∩ B| / |A|``
    (Broder 1997's directional resemblance twin), keeping pairs where
    either direction reaches ``threshold``.

    The case Jaccard structurally misses: a document quoted, excerpted,
    or extended inside a longer one. A half-length prefix of a doc has
    Jaccard ~0.5 against its source no matter how verbatim the copy —
    resemblance penalizes the size GAP — while its containment in the
    source is ~1.0. Near-superset mining (press-release laundering,
    boilerplate-wrapped reposts, train/eval contamination where the eval
    snippet hides inside a long page) filters on containment, not
    resemblance.

    Same candidate machinery and scale shape as
    :func:`ngram_jaccard_pairs` (docs only meet via shared shingle
    hashes; ``max_shingle_df`` caps stopword-shingle fanout; set sizes
    from the capped universe when capped): one explode self-join + one
    pair aggregate. The threshold is applied to the RAW max-direction
    ratio so any SQL oracle computing the same division agrees on pair
    membership; both directions are returned rounded.
    """
    arrays = _shingle_arrays(_spread(df, scan_shaped=scan_shaped), id_col, text_col, n)
    sh = explode_notnull(arrays, "__sh", "__s", keep=(id_col,)).select(
        F.col(id_col), F.xxhash64("__s").alias("shingle")
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    else:
        sizes = arrays.select(F.col(id_col), F.size("__sh").alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    ca = F.col("intersection") / F.col("size_a")
    cb = F.col("intersection") / F.col("size_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.greatest(ca, cb) >= threshold)
        .select(
            "id_a",
            "id_b",
            "intersection",
            "size_a",
            "size_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    scan_shaped: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature as array<bigint>.

    h_i(x) = xxhash64(x, i) mod M over the shingle set; min per hash. Each
    hash gets an INDEPENDENT seed (the hash index is mixed into xxhash64's
    input), not an affine rehash of one value — affine families share
    collision structure, which correlates the permutations and biases the
    Jaccard estimate. Deterministic, so signatures are stable across
    runs/partitions (incremental-dedup safe).
    """
    sh = explode_notnull(
        _shingle_arrays(_spread(df, scan_shaped=scan_shaped), id_col, text_col, shingle_n),
        "__sh",
        "shingle",
        keep=(id_col,),
    )
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.abs(F.xxhash64("shingle", F.lit(i))) % _MERSENNE).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        id_col, F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("signature")
    )


def bands_from_signatures(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band_idx, band_hash) LSH band table from a signature frame.

    A pure projection+explode over the signatures — bands are DERIVED from
    the signature, never stored: a persisted signature sidecar (see
    pipeline.build_minhash_index) regenerates its band table at join time
    for 16 xxhash64 calls per row, which is free next to the scan IO and
    keeps the index one table.
    """
    rows_per_band = num_hashes // bands
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("signature")[i].cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return posexplode_notnull(sig, band_arr, "band_idx", "band_hash", keep=(id_col,))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    scan_shaped: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Split the signature into ``bands`` rows-per-band groups; docs colliding
    on any (band_idx, band_hash) become candidates. This is the scale path:
    the only join key is the band hash, so work is proportional to true
    collisions. Verify candidates downstream with ngram_jaccard_pairs on
    the candidate set (or estimated Jaccard from signature agreement).
    """
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, scan_shaped=scan_shaped
    )
    banded = bands_from_signatures(sig, id_col, num_hashes, bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    scan_shaped: bool = True,
) -> DataFrame:
    """64-bit SimHash per document over unigram tokens.

    Bit k of the fingerprint is the sign of sum over tokens of
    (+1 if bit k of xxhash64(token) else -1). Near-duplicate docs differ in
    few bits (compare with bit_count(a XOR b) downstream).
    """
    toks = explode_notnull(
        _spread(df, scan_shaped=scan_shaped),
        F.split(normalize_text(text_col), " "),
        "tok",
        keep=(id_col,),
    ).withColumn("h", F.xxhash64("tok"))
    contribs = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return contribs.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: block the 64-bit space into ``blocks``
    16-bit chunks (pigeonhole: pairs within max_hamming <= blocks-1 share at
    least one exact chunk), join on (block_idx, chunk), verify Hamming."""
    sig = simhash(df, text_col, id_col)
    chunk_width = 64 // blocks
    mask = (1 << chunk_width) - 1
    chunk_arr = F.array(
        *[
            (F.shiftrightunsigned(F.col("simhash"), i * chunk_width).bitwiseAND(F.lit(mask)))
            for i in range(blocks)
        ]
    )
    chunked = posexplode_notnull(
        sig, chunk_arr, "block_idx", "chunk", keep=(id_col, "simhash")
    )
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "block_idx", "chunk"
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "block_idx", "chunk"
    )
    return (
        a.join(b, ["block_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    cluster_col: str | None = None,
    n_clusters: int = 16,
    seed: int = 42,
    train_fraction: float = 1.0,
    keep: str = "min_id",
    salt_cells: int | None = None,
    target_cell_size: int | None = None,
    fit_sample_cap: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then prune
    near-duplicates WITHIN each cluster only, so pairwise cost is
    sum(|cluster|^2) instead of n^2 — grow ``n_clusters`` with the corpus
    (constant expected cluster size) and total work is O(n), which is the
    paper's point and the 100 TB path. Pass ``target_cell_size`` to make
    that automatic: k derives as ceil(n / target_cell_size) from one
    count, and the k-means fit sample caps at ``fit_sample_cap`` so fit
    cost stays O(cap * k * iters) instead of O(n * k * iters) (both
    growing = quadratic). The fifth dedup tier: catches
    paraphrase-level duplicates that shingle/MinHash/SimHash (surface-form
    tiers) cannot see, at the price of needing an embedding column.

    Survivor rule, per ``keep``:

    * ``"min_id"`` (default): a document is REMOVED when a same-cluster
      neighbour with a smaller id has cosine >= threshold — a greedy,
      content-determined simplification that is trivially oracle-checkable.
      Returns (id_col, cluster, dup_of = smallest qualifying neighbour id,
      max_sim = highest qualifying cosine, rounded to 6).
    * ``"farthest"``: the paper's own rule — within each duplicate
      relation keep the document FARTHEST from its cluster centroid (the
      duplicate set's least-prototypical, most-diversity-preserving
      member). A document is removed when some qualifying neighbour
      strictly dominates it: lower centroid-cosine, ties broken by
      smaller id — deterministic given the clustering, so the
      label-clustered variant stays oracle-checkable (centroid cosines
      are rounded to 6 decimals on both engines before comparing, so
      sub-1e-6 differences resolve by id on both sides). Adds a
      ``centroid_sim`` column; ``dup_of`` is the smallest dominating
      neighbour id. Costs one extra (tiny) aggregate: per-cluster
      centroids — n_clusters rows, broadcast back.

    Plan shape: one assignment pass, then a single equi-join keyed on the
    cluster id — one shuffle of (id, vector, cluster) tuples, hash/merge
    join, the id inequality and cosine threshold evaluated inside it; no
    cross-cluster pair ever materialises. The per-cluster pair blow-up is
    the quantity ``n_clusters`` controls; a skewed (mega-)cluster is the
    same hazard as a hot join key and the same ``hot_keys`` probe applies.

    ``salt_cells`` is the mega-cluster escape hatch: the probe side gets a
    deterministic id-hash salt in [0, salt_cells) and the build side is
    replicated once per salt, so the join key becomes (cluster, salt) and
    one hot cell's pair generation spreads across ``salt_cells`` tasks
    instead of serializing in one straggler (the self-join form of
    ``operators/skew.py::salted_join``; every pair still meets exactly
    once, so results are bit-identical — asserted in test_dedup.py).
    Total pair work is unchanged — that is ``n_clusters``'s job — salting
    only fixes the parallelism. Measured on a deliberately 80 %-hot
    clustering in SCALING.md.

    With ``cluster_col`` given, that column IS the partitioning
    (deterministic; the oracle-paired anchor). Otherwise k-means fits
    ``n_clusters`` cells exactly like the IVF index build
    (``operators/ann.py::build_ivf_index``) — model-defined boundaries,
    hence rows-only attestation for that variant.
    """
    from pspcz_analyzer_spark.operators.ann import (
        _norm as _l2norm,
        cosine,
        cosine_prenormed,
    )

    if cluster_col is None and target_cell_size is not None:
        # The paper's O(n) contract made operational: per-cell pair cost
        # is sum(|cell|^2), so a FIXED k on a growing corpus is
        # quadratic (measured: fixed k=16 ran 66x slower on 10x data —
        # SCALING.md round-9). Derive k = ceil(n / target_cell_size)
        # (constant expected cell size -> linear total pair work) and,
        # since the k-means FIT is O(sample * k * iters) = O(n^2) when
        # both grow, cap the training sample at ``fit_sample_cap`` —
        # cell QUALITY needs a representative sample, not every row.
        n = df.count()
        n_clusters = max(2, -(-n // target_cell_size))
        if train_fraction >= 1.0 and n > fit_sample_cap:
            train_fraction = fit_sample_cap / n

    if cluster_col is None and n_clusters <= 1:
        # Degenerate single cell == exact global dedup (no model to fit;
        # Spark ML's KMeans requires k >= 2 anyway). Only for small-n
        # baselines — this is the n^2 path.
        assigned = df.select(id_col, vec_col, F.lit(0).alias("cluster"))
    elif cluster_col is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = df.select(
            id_col,
            vec_col,
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__fv"),
        )
        # Fit on a sample at corpus scale (same knob as the IVF build:
        # k-means cost is O(sample * k * iters), removed from the scan
        # path); assignment below is still one full pass.
        train = (
            feat
            if train_fraction >= 1.0
            else feat.sample(train_fraction, seed=seed)
        )
        model = KMeans(
            k=n_clusters, seed=seed, featuresCol="__fv", predictionCol="__cell"
        ).fit(train)
        assigned = model.transform(feat).select(
            id_col, vec_col, F.col("__cell").cast("int").alias("cluster")
        )
    else:
        assigned = df.select(
            id_col, vec_col, F.col(cluster_col).cast("int").alias("cluster")
        )

    if keep not in ("min_id", "farthest"):
        raise ValueError(f"keep must be 'min_id' or 'farthest', got {keep!r}")

    if keep == "farthest":
        # Per-cluster centroid: element-wise mean — one map-side-combined
        # aggregate producing n_clusters rows, broadcast back. Dimension
        # probed from one row (bounded driver payload).
        probe = df.select(vec_col).first()
        dim = len(probe[0]) if probe and probe[0] is not None else 0
        cent = assigned.groupBy("cluster").agg(
            F.array(
                *[
                    F.avg(F.col(vec_col).getItem(i).cast("double"))
                    for i in range(dim)
                ]
            ).alias("__centroid")
        )
        assigned = assigned.join(F.broadcast(cent), "cluster").withColumn(
            "__csim",
            F.round(
                cosine(
                    F.col(vec_col).cast("array<double>"), F.col("__centroid")
                ),
                6,
            ),
        )

    # r11: cast float->double and compute the L2 norm ONCE per row before
    # the self-join — both are per-row quantities, so evaluating them
    # after the join paid an array allocation + two array aggregates per
    # PAIR per side (sum(|cell|^2) of them) instead of per row (guide
    # §2.3: project before the exchange). The cast is exact and
    # cosine_prenormed keeps the arithmetic, so results are bit-identical.
    vcast = F.col(vec_col).cast("array<double>")
    x = assigned.select(
        F.col(id_col).alias("__xid"),
        vcast.alias("__xv"),
        _l2norm(vcast).alias("__xn"),
        "cluster",
        *([F.col("__csim").alias("__xcsim")] if keep == "farthest" else []),
    )
    y = assigned.select(
        F.col(id_col).alias("__yid"),
        vcast.alias("__yv"),
        _l2norm(vcast).alias("__yn"),
        "cluster",
        *([F.col("__csim").alias("__ycsim")] if keep == "farthest" else []),
    )
    sim = cosine_prenormed(
        F.col("__xv"), F.col("__yv"), F.col("__xn"), F.col("__yn")
    )
    if salt_cells and salt_cells > 1:
        # The explicit repartition is the point, not just the join key:
        # when the replicated build side broadcasts (the common case —
        # it's cluster-sized), the probe side keeps its SCAN partitioning
        # and a hot cell's pairs would still all be generated by whatever
        # single task holds that cell's rows. Hashing the probe out on
        # (cluster, salt) forces the distribution the salt exists for;
        # the EXPLICIT partition count matters too — pair generation is
        # compute-heavy but byte-light, so AQE's size-based coalescing
        # would merge a column-only repartition straight back into one
        # partition (measured: zero recovery without the number).
        target = max(
            salt_cells, df.sparkSession.sparkContext.defaultParallelism
        )
        x = x.withColumn(
            "__salt", F.pmod(F.xxhash64("__xid"), F.lit(salt_cells))
        ).repartition(target, F.col("cluster"), F.col("__salt"))
        y = y.withColumn(
            "__salt",
            F.explode(
                F.array(*[F.lit(i).cast("long") for i in range(salt_cells)])
            ),
        )
        pairs = x.join(y, ["cluster", "__salt"]).drop("__salt")
    else:
        pairs = x.join(y, "cluster")
    pairs = pairs.filter(F.col("__yid") != F.col("__xid"))
    if keep == "min_id":
        dominates = F.col("__yid") < F.col("__xid")
    else:
        dominates = (F.col("__ycsim") < F.col("__xcsim")) | (
            (F.col("__ycsim") == F.col("__xcsim"))
            & (F.col("__yid") < F.col("__xid"))
        )
    grouped = (
        pairs.filter(dominates)
        .withColumn("__sim", sim)
        .filter(F.col("__sim") >= F.lit(threshold))
        .groupBy(
            F.col("__xid").alias(id_col),
            "cluster",
            *(["__xcsim"] if keep == "farthest" else []),
        )
        .agg(
            F.min("__yid").alias("dup_of"),
            F.round(F.max("__sim"), 6).alias("max_sim"),
        )
    )
    if keep == "farthest":
        grouped = grouped.withColumnRenamed("__xcsim", "centroid_sim").select(
            id_col, "cluster", "dup_of", "max_sim", "centroid_sim"
        )
    return grouped


def _window_hashes(
    df: DataFrame, text_col: str, id_col: str, window: int
) -> DataFrame:
    """(id, start, whash) for every ``window``-token sliding window of the
    normalized text (stride 1, 1-based start). Docs shorter than the window
    emit nothing. One row per token position — the shuffled payload is a
    (long, int, long) triple regardless of window width, so cost tracks
    token count, never token count x window.

    Window identity is the 64-bit xxhash of the window string, with no
    string-confirmation pass — unlike the suffix-array ExactSubstr method
    this approximates, DISTINCT windows can collide and be falsely flagged
    as duplicates. Expected false positives ~ n_windows^2 / 2^65 (birthday
    bound): negligible below ~10^8 distinct windows (<0.1 expected
    collisions), and at a 10^12-window corpus ~10^4 token positions out of
    10^12 would be spuriously excised — an acceptable loss rate for
    training-data cleaning; callers needing exactness pass ``verify=True``
    to the span ops, which adds the string-confirmation pass
    (:func:`_dup_window_rows`)."""
    toks = F.split(normalize_text(text_col), " ")
    proj = _spread(
        df.select(F.col(id_col), toks.alias("__t")), scan_shaped=True
    )
    # Same zipped-slices formulation as _shingle_arrays (see its docstring:
    # per-element `slice` inside the lambda is quadratic per doc, and
    # CollapseProject re-inlines the tokenizer per element) — except the
    # final slice length floors at 0, so sub-window docs emit NO window
    # rather than one partial shingle.
    shifted = ", ".join(
        f"slice(__t, {k + 1}, greatest(size(__t) - {k}, 0))"
        for k in range(window)
    )
    zipped = (
        f"slice(arrays_zip({shifted}), 1, greatest(size(__t) - {window - 1}, 0))"
    )
    fields = ", ".join(f"s['{k}']" for k in range(window))
    win_expr = f"transform({zipped}, s -> xxhash64(concat_ws(' ', {fields})))"
    wins = proj.select(F.col(id_col), F.expr(win_expr).alias("__wins"))
    return posexplode_notnull(
        wins, "__wins", "__pos0", "whash", keep=(id_col,)
    ).select(id_col, (F.col("__pos0") + 1).alias("start"), "whash")


def _dup_window_rows(
    df: DataFrame,
    wins: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    min_docs: int,
    verify: bool,
) -> DataFrame:
    """The (id, start, whash) rows belonging to cross-document duplicated
    windows. Without ``verify``, duplicate = hash seen in >= min_docs
    distinct docs (64-bit xxhash identity — the documented ~n^2/2^65
    false-positive bound). With ``verify``, flagged rows are joined back
    to their actual window STRINGS and a hash survives only where some
    single string occurs in >= min_docs distinct docs — exact, at the
    cost of one extra join against the corpus whose expansion is bounded
    by the flagged rows (tiny unless the corpus is mostly duplicated)."""
    dup_hashes = (
        wins.groupBy("whash")
        .agg(F.countDistinct(id_col).alias("__n_docs"))
        .filter(F.col("__n_docs") >= min_docs)
        .select("whash")
    )
    flagged = wins.join(dup_hashes, "whash")
    if not verify:
        return flagged
    toks = F.split(normalize_text(text_col), " ")
    docs = df.select(F.col(id_col), toks.alias("__t"))
    with_str = flagged.join(docs, id_col).select(
        id_col,
        "start",
        "whash",
        F.array_join(F.slice("__t", F.col("start"), window), " ").alias("__w"),
    )
    verified = (
        with_str.groupBy("whash", "__w")
        .agg(F.countDistinct(id_col).alias("__n"))
        .filter(F.col("__n") >= min_docs)
        .select("whash", "__w")
    )
    return with_str.join(verified, ["whash", "__w"]).select(
        id_col, "start", "whash"
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_docs: int = 2,
    verify: bool = False,
) -> DataFrame:
    """Cross-document duplicated-span statistics — the ExactSubstr signal
    of Lee et al. 2022 (arXiv:2107.06499: verbatim token runs repeated
    across training documents), re-expressed as DataFrame plans instead of
    a suffix array: every ``window``-token sliding window is hashed
    (xxhash64, deterministic), a window is a duplicate when it occurs in
    at least ``min_docs`` DISTINCT documents, and each long verbatim
    overlap shows up as a run of consecutive duplicated windows. Internal
    (within-doc) repetition is deliberately excluded — that is
    ``corpusprep.dup_ngram_stats``'s job.

    Returns one row per document with >= 1 window: (id, n_windows,
    n_dup_windows, dup_frac).

    Scale shape: the window stream is one row per token position (fixed
    12-byte payload); finding duplicated hashes is ONE hash-keyed shuffle
    with partial aggregation, and the flag-back is a hash equi-join of the
    window stream against the (typically tiny) duplicated-hash set. The
    window stream feeds three consumers (the dup-hash aggregate, the
    per-doc window count, and the probe side), so it is persisted
    MEMORY_AND_DISK — the tokenizing corpus scan runs ONCE and the
    consumers read the cached (id, start, whash) triples; spill-safe
    because the payload is fixed-width. Same no-unpersist-point trade-off
    as the letters side of the amendments merge
    (operators/amendments.py:43-49): results return lazily, LRU eviction
    reclaims the cache.

    ``verify=True`` adds the exact string-confirmation pass
    (:func:`_dup_window_rows`) for callers that cannot accept the 64-bit
    hash-collision bound.
    """
    from pyspark import StorageLevel

    wins = _window_hashes(df, text_col, id_col, window).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    per_doc = wins.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    dup_per_doc = (
        _dup_window_rows(df, wins, text_col, id_col, window, min_docs, verify)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n_dup"))
    )
    return (
        per_doc.join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce(F.col("__n_dup"), F.lit(0).cast("long")).alias(
                "n_dup_windows"
            ),
            F.round(
                F.coalesce(F.col("__n_dup"), F.lit(0).cast("long"))
                / F.col("n_windows"),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_docs: int = 2,
    verify: bool = False,
) -> DataFrame:
    """Drop every token covered by a cross-document duplicated window —
    the removal half of ExactSubstr dedup (Lee et al. 2022): boilerplate
    headers, license blocks, and syndicated passages vanish from every
    copy while each document's unique prose survives.

    Returns (id, text_clean, n_tokens_removed). Docs shorter than the
    window pass through unchanged.

    Plan: duplicated window STARTS per doc come from the same hash-keyed
    machinery as :func:`duplicate_span_stats`, collected per doc into an
    array (bounded by windows-per-doc, not corpus size); the covered-token
    mask is a codegen'd higher-order ``filter`` with the element index —
    token j survives unless some start s covers it (s <= j < s+window).
    Per-doc cost is tokens x dup-spans, zero Python. The window stream is
    persisted (MEMORY_AND_DISK) so its tokenizing corpus scan runs once
    for the dup-hash aggregate and the start-collection probe; the final
    reassembly scan over ``df`` itself is separate and unavoidable (it
    needs the full token arrays, which the 12-byte window stream
    deliberately does not carry).

    ``verify=True`` adds the exact string-confirmation pass
    (:func:`_dup_window_rows`) for callers that cannot accept the 64-bit
    hash-collision bound.
    """
    from pyspark import StorageLevel

    toks = F.split(normalize_text(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("__t"))
    wins = _window_hashes(df, text_col, id_col, window).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    starts = (
        _dup_window_rows(df, wins, text_col, id_col, window, min_docs, verify)
        .groupBy(id_col)
        .agg(F.collect_list("start").alias("__starts"))
    )
    joined = base.join(starts, id_col, "left").select(
        F.col(id_col),
        F.col("__t"),
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")).alias(
            "__starts"
        ),
    )
    # Token index j (0-based) is covered iff some 1-based start s satisfies
    # s <= j+1 <= s+window-1.
    kept = F.filter(
        "__t",
        lambda x, j: ~F.exists(
            "__starts",
            lambda s: (s <= j + 1) & (j + 1 <= s + F.lit(window) - 1),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("text_clean"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def semantic_dedup_extend(
    spark,
    new_vecs: DataFrame,
    index_dir: str,
    threshold: float = 0.35,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup: survivors of a NEW batch against ALL indexed
    history — the embedding twin of the MinHash sidecar
    (``pipeline.py::extend_near_dup``): history lives as the persisted
    cell-partitioned IVF layout (``operators/ann.py::build_ivf_index``),
    so each ingestion batch compares against |cell| history vectors per
    probe instead of the whole archive, and the archive is never
    re-shuffled.

    Each new vector is assigned its ``n_probe`` nearest stored centroids
    (euclidean argmin over a broadcast of n_centroids rows — the metric
    k-means trained with, see ``extend_ivf_index``), then compared
    against history in those cells only via a cell equi-join; a new
    vector with ANY history cosine >= threshold is dropped. With
    ``n_probe = n_centroids`` the comparison is exhaustive and the
    result is EXACTLY the brute-force anti-join (the oracle anchor,
    same anchoring move as ``ann_ivf_exhaustive_top10``); ``n_probe=1``
    is the production path — boundary-straddling near-dups can escape a
    single probe, the standard IVF recall trade.

    Returns surviving ``new_vecs`` rows (full width). Append survivors
    to the index with ``extend_ivf_index`` to complete the ingestion
    step; batch-internal duplicates are :func:`semantic_dedup`'s job
    before or after this call.
    """
    import os

    from pyspark.sql import Window

    from pspcz_analyzer_spark.operators.ann import cosine

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
    probed = (
        new_vecs.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("__d2", d2)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("cell"))
            ),
        )
        .filter(F.col("__rk") <= n_probe)
        .select(F.col(id_col).alias("__nid"), F.col(vec_col).alias("__nv"), "cell")
    )
    hist = spark.read.parquet(os.path.join(index_dir, "vectors")).select(
        F.col(vec_col).alias("__hv"), "cell"
    )
    dup_ids = (
        probed.join(hist, "cell")
        .filter(
            cosine(
                F.col("__nv").cast("array<double>"),
                F.col("__hv").cast("array<double>"),
            )
            >= F.lit(threshold)
        )
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    return new_vecs.join(dup_ids, id_col, "left_anti")


def contamination_stats(
    train: DataFrame,
    evalset: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    text_col: str = "text",
) -> DataFrame:
    """Eval-set contamination against a training corpus — the exact
    n-gram-overlap decontamination check of GPT-3 (Brown et al. 2020,
    appendix C) and PaLM: for every eval document, the fraction of its
    ``window``-token sliding windows that appear ANYWHERE in the train
    corpus. A high fraction means the benchmark leaked into training
    data; downstream either drops the eval doc from reporting or routes
    the matching train docs to :func:`decontaminate_exact_substr`.

    Plan shape (the 100 TB asymmetry is the point): eval sets are tiny,
    so their distinct window hashes BROADCAST; the train corpus is
    scanned ONCE, its windows probed against the broadcast map-side, and
    only the matching hashes (bounded by the eval window count) survive
    into the distinct + the final stats join. The corpus never shuffles
    by window — cost is one scan plus eval-sized aggregates. Window
    identity is the same xxhash64 as :func:`_window_hashes` (collision
    bound documented there); eval docs shorter than the window emit no
    row. Returns (eval_id, n_windows, n_contaminated, contaminated_frac
    rounded to 6)."""
    tw = _window_hashes(train, text_col, id_col, window).select("whash")
    ew = _window_hashes(evalset, text_col, eval_id_col, window).select(
        eval_id_col, "whash"
    )
    found = (
        tw.join(F.broadcast(ew.select("whash").distinct()), "whash")
        .select("whash")
        .distinct()
    )
    per = ew.groupBy(eval_id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    hits = (
        ew.join(found, "whash")
        .groupBy(eval_id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        per.join(hits, eval_id_col, "left")
        .select(
            eval_id_col,
            "n_windows",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_windows"), 6
            ).alias("contaminated_frac"),
        )
    )


def decontaminate_exact_substr(
    train: DataFrame,
    evalset: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop train documents sharing ANY ``window``-token span with the
    eval set — the removal half of exact-substring decontamination
    (the train-side twin of :func:`contamination_stats`; the n-gram
    Jaccard `corpusprep.decontaminate` catches fuzzier overlap, this
    catches verbatim spans regardless of the rest of the document).

    Same asymmetric plan: eval window hashes broadcast, train scanned
    once, contaminated ids are the (small) semi-join survivors, removed
    with one anti-join. Returns the surviving train rows unchanged."""
    ev = evalset.select(F.lit(0).alias("__eid"), F.col(text_col))
    ew = _window_hashes(ev, text_col, "__eid", window).select("whash")
    tw = _window_hashes(train, text_col, id_col, window)
    bad = (
        tw.join(F.broadcast(ew.distinct()), "whash")
        .select(id_col)
        .distinct()
    )
    return train.join(bad, id_col, "left_anti")
