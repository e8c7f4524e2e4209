"""Training-corpus preparation operators: split, pack, decontaminate.

Three steps every large-scale LLM training-data pipeline runs after
filtering/dedup (the `operators/dedup.py` + `operators/textual.py` stages):

  train_val_test_split   deterministic hash bucketing into train/val/test —
                         stable across runs and cluster layouts, so a doc
                         never migrates between splits when data is re-read
  pack_sequences         assign docs to fixed-token-budget packs (sequence
                         packing for training batches) within shards
  decontaminate          drop corpus docs sharing any word n-gram with a
                         benchmark/eval set (the n-gram-overlap
                         decontamination step made standard by GPT-3/PaLM
                         data cards)

All three are pure DataFrame plans: no UDFs, one shuffle each (none for the
split, which is a projection). Scale notes per function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from pspcz_analyzer_spark.functions.text import token_count
from pspcz_analyzer_spark.operators.dedup import _shingle_arrays

# Knuth's multiplicative constant (2^32 / phi). The gate uses this portable
# integer hash so a DuckDB oracle can replicate bucket assignment bit-for-bit;
# swap `bucket_expr` for xxhash64 when oracle portability isn't needed.
_KNUTH = 2654435761


def bucket_expr(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from an integer id.

    Multiplicative hashing mod 2^32 — portable arithmetic (same result in
    any engine with 64-bit integers), stable across runs/partitionings.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c.cast("long") * F.lit(_KNUTH)) % F.lit(1 << 32)) % F.lit(buckets)


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Add `bucket` (0-99) and `split` (train/val/test) columns.

    A projection — no shuffle, no sampling action, no state. Determinism is
    the point: re-running the pipeline on grown data keeps every existing
    doc in its split (random_split() would reshuffle docs between splits on
    every run, leaking eval docs into training).
    """
    b = bucket_expr(id_col)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", b.cast("int")).withColumn("split", split)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str = "shard",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-token-budget packs within each shard.

    Contiguous-fill packing: docs are laid end-to-end in `order_col` order
    within a shard; `pack_id` = which budget-sized block the doc STARTS in,
    `pack_offset` = its token offset inside that block. A doc longer than
    the remaining block straddles the boundary (standard
    concat-then-chunk sequence packing, where document boundaries are
    attention-masked, not padded).

    One shuffle on `shard_col`; the running sum is a within-shard window.
    Scale: the window sorts per shard, so shard count bounds parallelism
    and shard size bounds memory — at 100 TB use O(10^4-10^5) shards
    (hash of doc id) so each shard is a few GB. Never call with a single
    shard at scale (single-partition window).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("__cum", cum_before).select(
        "*",
        F.floor(F.col("__cum") / budget).cast("int").alias("pack_id"),
        (F.col("__cum") % budget).cast("int").alias("pack_offset"),
    ).drop("__cum")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Corpus docs sharing >= 1 word n-gram with any benchmark doc, with
    the count of distinct shared shingles.

    Shingle both sides (normalized word n-grams, `_shingle_arrays`), join
    on the 8-byte xxhash64 of the shingle, count distinct shared shingles
    per corpus doc. Only docs sharing a shingle ever meet — cost tracks
    true overlap, not |corpus| x |benchmark|. The benchmark side is tiny
    relative to the corpus (eval sets are KBs-MBs at any corpus scale), so
    its shingle set is broadcast: the corpus side never shuffles.

    Returns (id_col, n_shared_shingles), one row per contaminated doc.
    """
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull, spread

    # Shingling + explode is CPU-bound per row: widen few-split inputs so
    # they can't starve the executors (no-op when file splits already
    # saturate the cluster — the 100 TB case).
    c_sh = explode_notnull(
        _shingle_arrays(
            spread(corpus.select(id_col, text_col), scan_shaped=True),
            id_col,
            text_col,
            n,
        ),
        "__sh",
        "__shingle",
        keep=(id_col,),
    ).withColumn("__h", F.xxhash64("__shingle"))
    b_sh = (
        explode_notnull(
            _shingle_arrays(benchmark.select(id_col, text_col), id_col, text_col, n),
            "__sh",
            "__shingle",
        )
        .select(F.xxhash64("__shingle").alias("__h"))
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "__h")
        .groupBy(id_col)
        .agg(F.count_distinct("__h").alias("n_shared_shingles"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Corpus rows with every benchmark-overlapping doc removed.

    Anti-join against `contamination_report` ids — full rows never ride a
    shuffle (only (id, count) pairs do), mirroring `exact_dedup`'s
    semi-join-back shape.
    """
    flagged = contamination_report(corpus, benchmark, text_col, id_col, n).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """Top-k vocabulary terms by document frequency (vocabulary/tokenizer
    prep: the heavy-hitter scan before BPE merges are trained).

    explode(normalized tokens) -> distinct (doc, term) -> one groupBy term
    counting docs + occurrences -> global top-k (TakeOrderedAndProject, no
    full sort). Two shuffles (distinct + agg) both keyed on the term, so
    AQE coalesces them; skewed stopword terms are single-key aggregates
    (combiner handles them map-side), not join fanout.

    Ties broken (doc_freq desc, total_occurrences desc, term asc) so top-k
    is deterministic.
    """
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    terms = explode_notnull(
        df, F.split(normalize_text(text_col), " "), "term", keep=(id_col,)
    ).filter(F.col("term") != "")
    counted = (
        terms.groupBy("term")
        .agg(
            F.count_distinct(id_col).alias("doc_freq"),
            F.count(F.lit(1)).alias("total_occurrences"),
        )
    )
    return counted.orderBy(
        F.desc("doc_freq"), F.desc("total_occurrences"), F.asc("term")
    ).limit(k)


def top_terms_per_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-group top-k vocabulary terms (per-language / per-source heavy
    hitters — the mixture-aware variant of ``top_terms`` for training
    tokenizers per domain).

    Same term-keyed aggregation, then a rank window partitioned by the
    group: the window shuffles the (group, term) AGGREGATE — bounded by
    vocabulary size per group, never by corpus rows. Deterministic ties
    as in top_terms.
    """
    from pyspark.sql import Window

    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    terms = explode_notnull(
        df, F.split(normalize_text(text_col), " "), "term", keep=(id_col, group_col)
    ).filter(F.col("term") != "")
    counted = terms.groupBy(group_col, "term").agg(
        F.count_distinct(id_col).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_occurrences"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("doc_freq"), F.desc("total_occurrences"), F.asc("term")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# A second multiplicative-hash constant (xxHash's PRIME32_2) so sampling
# buckets are decorrelated from the train/val/test split buckets.
_KNUTH2 = 2246822519


def exact_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, deterministically
    ("give me 10k docs per language" — quota sampling, where the
    rate-based ``stratified_hash_sample`` only hits its target in
    expectation).

    Rows rank inside their stratum by a multiplicative id hash (so the
    sample is id-order-free but replayable), and the first n keep. One
    shuffle on the stratum; per-stratum data must fit a partition's
    window — salt-split oversized strata upstream if one dominates.
    """
    from pyspark.sql import Window

    order = ((F.col(id_col).cast("long") * F.lit(_KNUTH2)) % F.lit(1 << 32)).alias(
        "__order"
    )
    w = Window.partitionBy(stratum_col).orderBy(F.asc("__order"), F.asc(id_col))
    return (
        df.withColumn("__order", order)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("__order")
    )


def dup_ngram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document duplicate n-gram fraction (the Gopher-style repetition
    filter signal: templated/spammy docs repeat phrases).

    One scan, one projection — shingle occurrences and their distinct count
    both come from a single per-row array (no explode, no shuffle).
    `dup_ngram_frac` = 1 - distinct/total in [0, 1); short docs (< n
    tokens) yield one partial shingle and a 0.0 fraction.
    """
    sh = _shingle_arrays(df.select(id_col, text_col), id_col, text_col, n, distinct=False)
    total = F.size("__sh")
    ndist = F.size(F.array_distinct("__sh"))
    return sh.select(
        id_col,
        total.alias("n_ngrams"),
        ndist.alias("n_distinct_ngrams"),
        F.round(F.lit(1.0) - ndist / total, 6).alias("dup_ngram_frac"),
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 10,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below the stratum's percentage (data-mixing reweighting,
    e.g. upweight rare languages / downweight boilerplate sources).

    A pure projection+filter — no shuffle, no RNG: re-runs keep exactly the
    same rows (unlike `df.sample`, whose per-partition RNG reshuffles
    membership whenever partitioning changes), so downstream incremental
    stages stay idempotent. Buckets are decorrelated from
    `train_val_test_split`'s by a different hash constant.
    """
    c = F.col(id_col).cast("long")
    bucket = ((c * F.lit(_KNUTH2)) % F.lit(1 << 32)) % F.lit(100)
    pct = F.lit(default_pct)
    for val, p in rates.items():
        pct = F.when(F.col(stratum_col) == val, F.lit(p)).otherwise(pct)
    return df.withColumn("sample_bucket", bucket.cast("int")).filter(
        F.col("sample_bucket") < pct
    )


def cap_tokens_per_group(
    df: DataFrame,
    group_col: str,
    token_col: str,
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep each group's docs (in `order_col` order) until the group's
    running token total reaches `cap` — per-source token budgeting, the
    mixture-weight enforcement step of corpus assembly.

    A doc is kept iff the tokens BEFORE it fit the cap, so every group
    keeps at least its first doc and group token totals land in
    [cap, cap + max_doc_tokens). One shuffle on `group_col`; the running
    sum is a within-group window (same scale contract as
    `pack_sequences`: group count bounds parallelism).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("tokens_before", cum_before)
        .filter(F.col("tokens_before") < cap)
        .withColumn("tokens_before", F.col("tokens_before").cast("long"))
    )
