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


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 25,
    line_splitter: Column | None = None,
    join_sep: str = "\n",
) -> DataFrame:
    """C4-style corpus-frequency boilerplate removal: drop every line that
    occurs in >= `min_docs` DISTINCT documents (nav bars, cookie banners,
    footers — the lines that repeat across a crawl), then reassemble each
    document from its surviving lines in original order.

    Returns one row per input doc: `id_col`, `n_lines`, `n_kept`,
    `clean_text` (empty string when every line was boilerplate — the doc
    row survives for downstream length filters to judge).

    Plan shape (three stages, two shuffles):
      1. line doc-frequency — explode lines, group by an 8-byte
         `xxhash64(line)` so the shuffle carries hashes, not strings;
         partial (map-side) aggregation collapses within-partition repeats
         before the exchange.
      2. boilerplate set — `df >= min_docs` survivors. By the Zipf head
         argument this set is tiny relative to the corpus (only the most
         common lines cross a corpus-frequency threshold), so it BROADCASTS
         and marking lines costs no shuffle.
      3. reassembly — one `groupBy(id)` shuffle; per-doc order restored via
         `array_sort` on (pos, line) structs, no window needed.
    At 100 TB: stage 1 is the only wide exchange over the full corpus and
    it is hash-narrow; if the boilerplate set ever outgrew broadcast
    (pathological threshold), the marker join degrades to a shuffled
    left join without a semantics change. 64-bit line-hash collisions
    (~n^2/2^65) would merge two lines' counts; acceptable for a frequency
    filter (and the unit tests pin exact parity on real linefuls).

    Beyond-reference surface (an LLM-pipeline extra, not a port): the
    rule is the cross-document line-frequency filter of C4 (Raffel et
    al. 2020, §2.2 repeated-line / boilerplate rules).
    """
    if line_splitter is None:
        line_splitter = F.split(F.col(text_col), "\n")
    # _outer keeps zero-line docs (empty/one-word text) as a null-line row,
    # so they come back with n_lines=0 and clean_text='' instead of vanishing.
    lines = df.select(
        F.col(id_col), F.posexplode_outer(line_splitter).alias("pos", "line")
    ).withColumn("lh", F.xxhash64("line"))
    boiler = (
        lines.filter(F.col("line").isNotNull())
        .groupBy("lh")
        .agg(F.count_distinct(id_col).alias("line_doc_freq"))
        .filter(F.col("line_doc_freq") >= min_docs)
        .select("lh")
    )
    marked = lines.join(F.broadcast(boiler.withColumn("__boiler", F.lit(1))), "lh", "left")
    keep = F.col("__boiler").isNull() & F.col("line").isNotNull()
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.count("line").alias("n_lines"),
            F.count(F.when(keep, F.lit(1))).alias("n_kept"),
            F.array_sort(
                F.collect_list(F.when(keep, F.struct("pos", "line")))
            ).alias("__kept"),
        )
        .select(
            id_col,
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_kept").cast("int").alias("n_kept"),
            F.concat_ws(join_sep, F.transform("__kept", lambda s: s["line"])).alias(
                "clean_text"
            ),
        )
    )
    return rebuilt


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    shards: int = 64,
) -> DataFrame:
    """Deterministic pseudorandom training order: every doc gets a
    `shuffle_key` (multiplicative hash of its id, salted by `seed`), a
    `shard` (range-partition of the key space), and a `pos` within the
    shard — so reading shard 0..N-1 each in `pos` order replays one fixed
    global permutation of the corpus.

    Why not `df.orderBy(rand(seed))`: Spark's rand() is seeded PER
    PARTITION, so the "same seed" produces a different order whenever the
    partition layout changes (AQE, data growth, cluster size) — training
    runs become unreproducible. A pure id-hash key depends on nothing but
    the row, so the order is stable across re-reads, re-partitions, and
    incremental appends (new docs interleave into the existing permutation
    instead of reshuffling it; epoch N+1 uses a different `seed`).

    `shard = floor(key * shards / 2^32)` is a RANGE split of the key
    space, so shard-major concatenation IS the global key sort — no global
    orderBy (single range-partitioned total sort) is ever materialized.
    One shuffle (the per-shard window); `shards` bounds both parallelism
    and per-task sort memory — at 100 TB use O(10^4-10^5) shards.
    Knuth-hash key (not xxhash64) keeps the permutation portable to any
    engine with 64-bit integer arithmetic, same contract as `bucket_expr`.
    """
    key = ((F.col(id_col).cast("long") * F.lit(_KNUTH) + F.lit(seed)) % F.lit(1 << 32))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.withColumn("shuffle_key", key)
        .withColumn(
            "shard",
            F.floor(F.col("shuffle_key") * shards / F.lit(1 << 32)).cast("int"),
        )
        .withColumn("pos", F.row_number().over(w).cast("int"))
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    total_budget: int,
    alpha: float = 0.3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture sampling: downsample each group (source /
    language) toward target share ``n_g^alpha / sum(n^alpha)`` of a
    `total_budget`-doc corpus — the multinomial temperature reweighting of
    multilingual pretraining (alpha=1 keeps natural proportions, alpha->0
    approaches uniform across groups; XLM-R uses 0.3).

    Where ``stratified_hash_sample`` takes caller-supplied per-group rates,
    this SELF-TUNES them from the observed counts: per-group keep rate
    ``min(1, target_share * budget / n_g)``, rounded to 6 dp (the rounding
    is part of the contract — it makes the rate reproducible across
    engines' libm pow). Rows then keep/drop by the same deterministic
    id-hash bucket as the other samplers, so membership is replayable and
    append-stable for a fixed rate table.

    Plan shape: one tiny group-count aggregate (group cardinality rows) +
    a 1-row total, broadcast back onto the corpus — the corpus itself
    NEVER shuffles; the filter is a codegen'd projection. At 100 TB this
    is a metadata-sized side computation plus a scan.

    Returns the kept rows with `keep_rate` attached (rare groups may keep
    everything; dominant groups are cut toward their temperature share).
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    weighted = counts.withColumn("__w", F.pow("__n", F.lit(float(alpha))))
    total_w = weighted.agg(F.sum("__w").alias("__tw"))
    rates = weighted.crossJoin(F.broadcast(total_w)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.col("__w") / F.col("__tw") * F.lit(float(total_budget)) / F.col("__n"),
            ),
            6,
        ).alias("keep_rate"),
    )
    frac = ((F.col(id_col).cast("long") * F.lit(_KNUTH2)) % F.lit(1 << 32)) / F.lit(
        float(1 << 32)
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(frac < F.col("keep_rate"))
    )


def calibrate_keep_threshold(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    exact: bool = True,
) -> DataFrame:
    """Self-tuning quality cutoff: keep the top `keep_frac` of rows by
    `score_col`, with the threshold COMPUTED from the observed score
    distribution (the knob-free form of a quality filter — "keep the best
    30%" survives scorer recalibration and corpus drift, where a
    hard-coded `score >= 0.5` silently changes its keep rate).

    The threshold is the (1 - keep_frac) percentile, rounded to 6 dp (the
    rounding makes the boundary comparison reproducible across engines'
    float interpolation), broadcast back onto the corpus as a scalar.
    Rows with score exactly at the threshold are kept (>=), so the
    realized fraction is >= keep_frac under score ties.

    Cost: one full-scan percentile reduce + one filtered scan. `exact`
    uses `percentile` (true rank interpolation — a distributed sort-free
    aggregate, but state grows with distinct score count); at 100 TB with
    high-cardinality scores set `exact=False` for `approx_percentile`
    (KLL-sketch, constant memory, documented rank error 1e-4).

    Call with `score_col` as a STORED column (a table attribute), not a
    live expression: Catalyst pushes the threshold filter below the
    projection, so an expression-backed score is RE-EVALUATED inside the
    filter (2x its per-row cost). Scores produced by earlier pipeline
    stages should be materialized (the `pipeline.py` staging pattern)
    before calibrating on them.

    Returns the kept rows with `threshold` attached.
    """
    q = F.lit(1.0 - keep_frac)
    agg = (
        F.percentile(score_col, q) if exact else F.approx_percentile(score_col, q, 10_000)
    )
    thr = df.agg(F.round(agg, 6).alias("threshold"))
    return df.crossJoin(F.broadcast(thr)).filter(
        F.col(score_col) >= F.col("threshold")
    )


def word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus word-frequency table (word, n): the distributed half of
    tokenizer training. One term-keyed shuffle with map-side combine;
    output is vocabulary-sized, not corpus-sized."""
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    terms = explode_notnull(
        df.select(text_col), F.split(normalize_text(text_col), " "), "word"
    ).filter(F.col("word") != "")
    out = terms.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return out.filter(F.col("n") >= min_count) if min_count > 1 else out


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 1,
) -> DataFrame:
    """Learn a BPE merge table from the corpus (tokenizer training,
    Sennrich et al. 2016): the `n_merges` highest-count adjacent symbol
    pairs, merged greedily in order.

    The 100 TB shape is the standard BPE formulation: the CORPUS-scale
    work is exactly one word-count aggregate (:func:`word_counts` —
    vocabulary out, corpus in); the merge loop then runs over that
    vocabulary-sized (word -> count) table on the driver, which is how
    every production BPE trainer works (the loop's working set is the
    vocabulary, not the corpus — growing data 100x grows counts, not the
    table). Deterministic: ties break (count desc, pair lexicographic).

    Returns (merge_rank, left, right, pair_count) — rank 0 first. The
    end-of-word marker convention is `</w>` appended to each word's last
    symbol, so merges distinguish word-final units.
    """
    vocab_rows = word_counts(df, text_col, min_count).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in vocab_rows:
        syms = tuple(list(r["word"][:-1]) + [r["word"][-1] + "</w>"])
        vocab[syms] = vocab.get(syms, 0) + int(r["n"])

    merges = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        merged_sym = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab

    return df.sparkSession.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


# Hard bound on the per-worker distinct-word memo in bpe_encode_counts
# (module-level so tests can shrink it and prove the overflow path is
# output-transparent).
BPE_MEMO_CAP = 1 << 20


def bpe_encode_counts(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a trained BPE merge table and count the
    resulting units per doc — the apply half of :func:`bpe_merges`
    (trained-tokenizer token accounting, vs the regex estimate of
    `bpe_ish_token_count`).

    Normalization and word-splitting stay JVM-side (codegen'd
    `normalize_text` + split BEFORE the Python boundary); the Arrow batch
    carries only word arrays. Inside the UDF the greedy rank-order merge
    runs once per DISTINCT word per batch (memoized — natural corpora
    repeat words heavily), so per-batch cost tracks batch vocabulary,
    not token count. The merge table itself is vocab-sized and ships in
    the closure.

    Returns (id_col, n_words, n_bpe_units).
    """
    from pspcz_analyzer_spark.functions.text import normalize_text

    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}

    # The memo is scoped to THIS closure (rebuilt per bpe_encode_counts
    # call, so merge tables never cross-contaminate) but lives for the
    # Python-worker lifetime on reused workers — capped so a long-lived
    # executor encoding many batches cannot leak unboundedly. Natural-
    # language vocabularies fit far under the cap (Zipf: ~10^6 distinct
    # words covers web-scale corpora); on overflow the whole memo drops
    # and rebuilds, trading a rare recompute burst for a hard bound.
    memo_cap = BPE_MEMO_CAP

    def n_units(word: str, _memo: dict = {}) -> int:
        got = _memo.get(word)
        if got is not None:
            return got
        if len(_memo) >= memo_cap:
            _memo.clear()
        syms = list(word[:-1]) + [word[-1] + "</w>"]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                rk = ranks.get(pair)
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        _memo[word] = len(syms)
        return len(syms)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            counts = [
                (sum(n_units(w) for w in words if w), sum(1 for w in words if w))
                for words in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": [c[1] for c in counts],
                    "n_bpe_units": [c[0] for c in counts],
                }
            )

    src = df.select(
        id_col, F.split(normalize_text(text_col), " ").alias("__words")
    )
    return src.mapInPandas(
        encode, schema=f"{id_col} long, n_words int, n_bpe_units int"
    )


def chunk_token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows (context
    chunking for retrieval/training: `window` tokens per chunk, advancing
    `stride` tokens, so consecutive chunks overlap by window - stride).

    Pure codegen'd projection + one Generate — no UDF, no shuffle: chunk
    starts come from `sequence(0, n-1, stride)` and each chunk is an
    `array_join(slice(tokens, ...))` over the per-row token array. Cost
    is the scan plus output size (rows x ~window/stride duplication
    factor); embarrassingly parallel over file splits at any scale.

    Returns (id_col, chunk_id, start_tok, n_chunk_tokens, chunk_text);
    every token lands in at least one chunk, the last chunk may be short.
    """
    tokens = F.split(F.col(text_col), " ")
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.slice(tokens, s + 1, window).alias("toks"),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.col("c.start_tok").alias("start_tok"),
        F.size("c.toks").alias("n_chunk_tokens"),
        F.array_join("c.toks", " ").alias("chunk_text"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-probability under a unigram LM
    trained on the corpus itself — the language-model quality filter
    (CCNet-style perplexity bucketing, here with the simplest LM that
    needs no external model): outlier/spam docs use improbable words and
    score HIGH; fluent in-distribution docs score LOW.

    Add-k smoothing over the corpus vocabulary:
      p(w) = (c(w) + k) / (T + k * (V + 1)),  unseen w -> k / (T + k(V+1))

    Plan: one word-count aggregate (vocabulary out), a one-row (T, V)
    scalar broadcast, then the doc-word explode LEFT-joins the count
    table — word-keyed, map-side combined; after min-count pruning the
    vocabulary usually broadcasts, and AQE picks that automatically.
    One shuffle on doc id for the final mean. Zero-word docs drop (no
    tokens to score).

    Returns (id_col, n_words, avg_neg_logp) rounded to 6 dp.
    """
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    wc = word_counts(df.select(text_col), text_col)
    stats = wc.agg(
        F.sum("n").alias("__t"), F.count(F.lit(1)).alias("__v")
    )
    doc_words = explode_notnull(
        df.select(id_col, text_col),
        F.split(normalize_text(text_col), " "),
        "word",
        keep=(id_col,),
    ).filter(F.col("word") != "")
    k = F.lit(float(smoothing))
    p = (F.coalesce(F.col("n"), F.lit(0)) + k) / (
        F.col("__t") + k * (F.col("__v") + 1)
    )
    return (
        doc_words.join(wc, "word", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logp"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-probability under a BIGRAM LM
    trained on the corpus itself — the context-aware upgrade of
    ``unigram_logprob_scores`` and the shape of the CCNet/KenLM
    perplexity filter (Wenzek et al. 2020, arXiv:1911.00359): a doc of
    common words in improbable ORDER (shuffled text, keyword stuffing,
    boilerplate collage) scores high where the unigram model is blind.

    Add-k smoothing conditioned on the left context:

      p(w2 | w1) = (c(w1 w2) + k) / (c(w1 .) + k * (V + 1))

    with V the corpus unigram vocabulary and c(w1 .) the number of
    bigram occurrences starting with w1.

    Plan: bigram pairs are built INSIDE the token array (zip_with of the
    two shifted slices — pure codegen, no window/shuffle, no UDF); one
    pair-keyed aggregate trains the model (map-side combined, output is
    bigram-vocabulary-sized, not corpus-sized); the context totals are a
    second tiny aggregate OF the model; scoring left-joins the doc pairs
    to both (AQE broadcasts them once min-count pruning keeps them
    small) and one doc-keyed aggregate emits the mean. Docs with < 2
    tokens have no bigram and drop, exactly like the unigram op drops
    zero-word docs.

    Returns (id_col, n_bigrams, avg_neg_logp) rounded to 6 dp.
    """
    from pspcz_analyzer_spark.functions.text import normalize_text
    from pspcz_analyzer_spark.operators.partitioning import explode_notnull

    # NB no size(__t) pre-filter: CollapseProject would inline the
    # tokenizer into the Filter condition and re-run it per row (the
    # explode inferred-filter trap, PLANS.md); a short doc's pair array
    # is simply empty and explode_notnull drops it for free.
    toks = df.select(
        id_col, F.split(normalize_text(text_col), " ").alias("__t")
    )
    pairs = explode_notnull(
        toks,
        F.zip_with(
            F.slice(F.col("__t"), 1, F.size("__t") - 1),
            F.slice(F.col("__t"), 2, F.size("__t") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        "__bg",
        keep=(id_col,),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    model = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    contexts = model.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = word_counts(df.select(text_col), text_col).agg(
        F.count(F.lit(1)).alias("__v")
    )

    k = F.lit(float(smoothing))
    p = (F.coalesce(F.col("n12"), F.lit(0)) + k) / (
        F.coalesce(F.col("n1"), F.lit(0)) + k * (F.col("__v") + 1)
    )
    return (
        pairs.join(model, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logp"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement:
    key_i = u_i^(1/w_i) with u_i uniform in [0,1); the k largest keys are
    a weighted random sample without replacement (Inf. Process. Lett.
    97(5), 2006) — the principled way to draw "k docs, probability
    proportional to quality/length" for corpus curation, where the naive
    rate-based Bernoulli (``stratified_hash_sample``) cannot hit an exact
    k and rejection sampling needs global coordination.

    u_i derives from md5(salt || id) — no RNG state: deterministic,
    partition-count-independent, and engine-agreeing in practice (the
    DuckDB oracle recomputes the same 32-bit u from the same hex; the
    subsequent pow() is IEEE double math where a ULP difference between
    runtimes could in principle flip a near-boundary top-k cutoff — the
    gate comparison rounds the priority to 6 decimals and ties break on
    id, which absorbs everything observed in testing but is not a
    bit-exactness guarantee). Idempotent for reruns — the draw is a pure
    function of (salt, id, weight), so re-sampling a grown corpus keeps
    previous picks stable except where new heavy keys displace the
    boundary. Non-positive weights are floored to 1e-12 (priority ~ 0:
    effectively never sampled).

    Plan: one scan computing the key per row, then global top-k as
    TakeOrderedAndProject (per-partition heaps of k, driver merge of
    k x partitions) — the corpus itself never shuffles. Returns the
    sampled rows plus their ``__priority`` key.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    keyed = df.withColumn("__priority", F.pow(u, F.lit(1.0) / w))
    return keyed.orderBy(F.desc("__priority"), F.asc(id_col)).limit(k)


def dsir_logratio_scores(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance scores (Data Selection via Importance Resampling,
    Xie et al. 2023, arXiv:2302.03169): rank raw-corpus documents by how
    target-domain-like they are, using hashed n-gram features — the
    standard cheap alternative to a trained domain classifier for
    assembling a pretraining mixture that matches a small high-quality
    target set.

    Features are unigrams + bigrams of the normalized text, hashed into
    ``n_buckets`` buckets (md5-prefix mod — deterministic and
    engine-reproducible, same idiom as ``weighted_sample``). Bucket
    unigram models p_target / p_source get Laplace ``smoothing``; a
    document's score is  sum_b c_b(doc) * (ln p_t(b) - ln p_s(b)) —
    its log importance weight under the hashed-n-gram class of the
    paper. Select by thresholding the score or by importance
    RESAMPLING: ``weighted_sample`` over ``exp(score / n_feats)``-style
    weights (normalize by length first or long docs dominate).

    Plan shape: one explode of the corpus into (id, bucket) pairs —
    2 rows per token, 8-byte payload; both distributions are
    ``n_buckets``-row aggregates (map-side combined) BROADCAST back onto
    the per-doc bucket counts, so the corpus shuffles once on (id,
    bucket) and nothing joins corpus-sized against corpus-sized. The
    target set is benchmark-sized by assumption. Returns (id_col,
    n_feats, dsir_score) with the score rounded to 6.
    """
    from pspcz_analyzer_spark.functions.text import normalize_text

    def feats(df: DataFrame, keep_id: bool) -> DataFrame:
        toks = F.split(normalize_text(text_col), " ")
        n = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        grams = F.concat(toks, bigrams)
        out = df.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(grams).alias("__g"),
        ).filter(F.length("__g") > 0)
        return out.withColumn(
            "__b",
            F.conv(F.substring(F.md5("__g"), 1, 8), 16, 10).cast("long")
            % n_buckets,
        )

    def bucket_logprobs(counts: DataFrame, spark, name: str) -> DataFrame:
        full = (
            spark.range(n_buckets)
            .select(F.col("id").alias("__b"))
            .join(counts, "__b", "left")
            .select("__b", F.coalesce("__c", F.lit(0)).alias("__c"))
        )
        # Total as a broadcast one-row aggregate (the repo's standing
        # scalar pattern) — not a partition-less window, which the plan
        # net rejects as a single-task funnel even when bounded.
        tot = full.agg(F.sum("__c").alias("__t"))
        return full.crossJoin(F.broadcast(tot)).select(
            "__b",
            F.log(
                (F.col("__c") + F.lit(smoothing))
                / (F.col("__t") + F.lit(smoothing * n_buckets))
            ).alias(name),
        )

    # The corpus tokenizes ONCE: the source bucket distribution is the
    # per-doc bucket counts re-aggregated (sum of longs — the exact same
    # integers the dedicated corpus pass produced), so only the
    # benchmark-sized target pays its own tokenize.
    doc_buckets = (
        feats(corpus, keep_id=True)
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist()
    )
    target_counts = feats(target, keep_id=False).groupBy("__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    corpus_counts = doc_buckets.groupBy("__b").agg(F.sum("__c").alias("__c"))
    spark = corpus.sparkSession
    logs = F.broadcast(
        bucket_logprobs(target_counts, spark, "__lp_t").join(
            bucket_logprobs(corpus_counts, spark, "__lp_s"), "__b"
        )
    )
    return (
        doc_buckets.join(logs, "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_feats"),
            F.round(
                F.sum(F.col("__c") * (F.col("__lp_t") - F.col("__lp_s"))), 6
            ).alias("dsir_score"),
        )
    )


def unigram_lm_pieces(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 500,
    max_piece_len: int = 8,
    n_iter: int = 4,
    prune_fraction: float = 0.25,
    min_count: int = 1,
) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
    arXiv:1804.10959) — the second production tokenizer family beside
    :func:`bpe_merges`: pieces are scored by a unigram language model and
    a word's tokenization is its max-probability segmentation, which
    (unlike BPE's greedy merges) gives principled probabilities and
    subword regularization.

    Same 100 TB shape as BPE training: the CORPUS-scale work is exactly
    one word-count aggregate (:func:`word_counts`); seeding, EM, and
    pruning then run over that vocabulary-sized (word -> count) table on
    the driver — the loop's working set is the vocabulary, never the
    corpus. This is the Viterbi-EM variant (hard assignments; the
    forward-backward posterior variant differs by soft counts only),
    documented so the tests can pin exact outputs.

    Steps: seed = the most frequent substrings up to ``max_piece_len``
    (all single characters always kept — coverage guarantee); each EM
    round Viterbi-segments every distinct word under current piece
    log-probs, re-estimates probs from the hard counts, then prunes the
    lowest-count multi-char pieces (``prune_fraction`` per round, to
    ``vocab_size`` at the end). Deterministic: all ties break
    lexicographically, Viterbi prefers the longer piece on equal score.

    Returns (piece, count, logprob), logprob rounded to 8, ordered by
    (count desc, piece).
    """
    import math

    words = {
        r["word"]: int(r["n"])
        for r in word_counts(df, text_col, min_count).collect()
    }

    # Seed: substring counts weighted by word frequency.
    seed: dict[str, int] = {}
    for w, n in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                p = w[i:j]
                seed[p] = seed.get(p, 0) + n
    chars = {p for p in seed if len(p) == 1}
    multi = sorted(
        (p for p in seed if len(p) > 1), key=lambda p: (-seed[p], p)
    )[: max(vocab_size * 4, 0)]
    vocab = {p: seed[p] for p in chars} | {p: seed[p] for p in multi}

    def logprobs(counts: dict[str, int]) -> dict[str, float]:
        tot = sum(counts.values()) or 1
        return {p: math.log(c / tot) if c > 0 else -1e9 for p, c in counts.items()}

    def viterbi(w: str, lp: dict[str, float]) -> list[str]:
        # best[i] = (score, pieces) for w[:i]; prefer longer last piece,
        # then lexicographically smaller, on ties.
        best: list = [None] * (len(w) + 1)
        best[0] = (0.0, [])
        for i in range(1, len(w) + 1):
            cand = None
            for j in range(max(0, i - max_piece_len), i):
                if best[j] is None:
                    continue
                p = w[j:i]
                s = lp.get(p)
                if s is None:
                    continue
                score = best[j][0] + s
                key = (score, len(p), [-ord(c) for c in p])
                if cand is None or key > cand[0]:
                    cand = (key, best[j][1] + [p])
            if cand is not None:
                best[i] = (cand[0][0], cand[1])
        assert best[len(w)] is not None, f"uncovered word {w!r}"
        return best[len(w)][1]

    for it in range(n_iter):
        lp = logprobs(vocab)
        counts: dict[str, int] = {p: 0 for p in vocab}
        for w, n in sorted(words.items()):
            for p in viterbi(w, lp):
                counts[p] += n
        # Keep all single chars (coverage); prune cold multi-char pieces.
        multi_alive = sorted(
            (p for p in counts if len(p) > 1),
            key=lambda p: (-counts[p], p),
        )
        n_multi_target = max(vocab_size - len(chars), 0)
        if it < n_iter - 1:
            keep_n = max(n_multi_target, int(len(multi_alive) * (1 - prune_fraction)))
        else:
            keep_n = n_multi_target
        kept = multi_alive[:keep_n]
        vocab = {p: max(counts[p], 1) for p in chars} | {
            p: counts[p] for p in kept if counts[p] > 0
        }

    lp = logprobs(vocab)
    rows = sorted(
        ((p, vocab[p], round(lp[p], 8)) for p in vocab),
        key=lambda t: (-t[1], t[0]),
    )
    return df.sparkSession.createDataFrame(
        rows, "piece string, count long, logprob double"
    )


def unigram_encode_counts(
    df: DataFrame,
    pieces: "list[tuple[str, float]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a trained unigram-LM piece table and count
    the resulting units per doc — the apply half of
    :func:`unigram_lm_pieces` (mirrors :func:`bpe_encode_counts`:
    JVM-side normalize/split, Arrow-batched Viterbi memoized per distinct
    word, memo capped by ``BPE_MEMO_CAP``).

    ``pieces`` is [(piece, logprob)]; single-character coverage is the
    trainer's guarantee — unknown characters count 1 unit each (the
    <unk> convention). Returns (id_col, n_words, n_unigram_units).
    """
    from pspcz_analyzer_spark.functions.text import normalize_text

    lp = {p: float(s) for p, s in pieces}
    max_len = max((len(p) for p in lp), default=1)
    memo_cap = BPE_MEMO_CAP

    def n_units(word: str, _memo: dict = {}) -> int:
        got = _memo.get(word)
        if got is not None:
            return got
        if len(_memo) >= memo_cap:
            _memo.clear()
        UNK = -1e6  # per-char unknown penalty: worse than any real piece
        best: "list" = [None] * (len(word) + 1)
        best[0] = (0.0, 0)
        for i in range(1, len(word) + 1):
            cand = None
            for j in range(max(0, i - max_len), i):
                if best[j] is None:
                    continue
                s = lp.get(word[j:i], UNK if i - j == 1 else None)
                if s is None:
                    continue
                score = best[j][0] + s
                if cand is None or score > cand[0]:
                    cand = (score, best[j][1] + 1)
            best[i] = cand
        n = best[len(word)][1]
        _memo[word] = n
        return n

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            counts = [
                (sum(n_units(w) for w in ws if w), sum(1 for w in ws if w))
                for ws in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": [c[1] for c in counts],
                    "n_unigram_units": [c[0] for c in counts],
                }
            )

    src = df.select(id_col, F.split(normalize_text(text_col), " ").alias("__words"))
    return src.mapInPandas(
        encode, schema=f"{id_col} long, n_words int, n_unigram_units int"
    )


def unimax_quotas(counts: "list[tuple[str, int]]", budget: int) -> "dict[str, int]":
    """Waterfilled per-group quotas: every group gets an equal share of
    ``budget``, a group smaller than its share contributes everything, and
    its unused share redistributes uniformly among the rest — UniMax's
    language-budget allocation (Chung et al. 2023, arXiv:2304.09151)
    specialized to subset selection (epoch cap = 1: a sample cannot repeat
    rows; the >1-epoch form is a weighting, not a sampling, concern).

    Exact integer arithmetic: groups sorted by (count, name); the capped
    prefix is where ``count * remaining_groups <= remaining_budget``
    (monotone, so a prefix); the leftover splits floor-evenly among the
    uncapped with the remainder going to the first ``leftover % u`` of
    them in the same order — deterministic, Σ quotas = min(budget, total).
    Driver-side over the GROUP LIST (bounded by #languages), never rows.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    ordered = sorted(counts, key=lambda t: (t[1], t[0]))
    k = len(ordered)
    quotas: dict[str, int] = {}
    rem = budget
    uncapped: list[str] = []
    for i, (g, c) in enumerate(ordered):
        r = k - i
        # Once one group can't take its full count, no LARGER group may
        # either (the waterline is below both) — capping stops for good.
        # Without the prefix cut a later group could grab its full count
        # out of budget the waterline owes earlier groups.
        if uncapped or c * r > rem:
            uncapped.append(g)
        else:
            quotas[g] = c
            rem -= c
    u = len(uncapped)
    if u:
        base, extra = divmod(rem, u)
        for j, g in enumerate(uncapped):
            quotas[g] = base + (1 if j < extra else 0)
    return quotas


def unimax_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """UniMax-budgeted corpus subset: :func:`unimax_quotas` decides how
    many rows each group contributes, and the rows themselves are picked
    by the same replayable multiplicative-hash rank
    :func:`exact_stratified_sample` uses — so the draw is deterministic,
    engine-reproducible, and append-stable per group.

    Head-heavy mixtures (one dominant language) are exactly what this
    tames: temperature mixing still over-samples the head, UniMax gives
    every language its full uniform share first. Plan: one group-count
    aggregate (collected — bounded by #groups), quotas broadcast back as
    a tiny join, ONE row shuffle on the group for the rank window.
    """
    from pyspark.sql import Window

    counts = [
        (r[0], r[1])
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    quotas = unimax_quotas(counts, budget)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(g, q) for g, q in quotas.items()], f"{group_col} string, __quota long"
    )
    order = ((F.col(id_col).cast("long") * F.lit(_KNUTH2)) % F.lit(1 << 32)).alias(
        "__order"
    )
    w = Window.partitionBy(group_col).orderBy(F.asc("__order"), F.asc(id_col))
    return (
        df.withColumn("__order", order)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(qdf), group_col)
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__order", "__quota")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k_per_group: int,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Per-group Efraimidis-Spirakis A-ES draw: exactly
    min(k, |group|) rows per group, probability proportional to weight
    WITHIN the group — the per-language/per-source companion to the
    global :func:`weighted_sample`, completing the sampling family
    (exact-k uniform per group = ``exact_stratified_sample``; budgeted
    uniform across groups = ``unimax_sample``). "10k docs per language,
    preferring high quality" is this operator.

    The priority key u^(1/w) is THE SAME pure function of (salt, id,
    weight) as the global draw — so a row sampled here and by
    ``weighted_sample`` agrees on its key, the draw replays across runs
    and engines, and appends only displace boundary rows within their
    own group. Plan: one scan for the key, ONE shuffle on the group for
    the rank window (the global variant's TakeOrderedAndProject can't
    cap per group). Returns sampled rows + ``sample_rank`` (1 = highest
    priority in its group).
    """
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    keyed = df.withColumn("__priority", F.pow(u, F.lit(1.0) / w))
    win = Window.partitionBy(group_col).orderBy(
        F.desc("__priority"), F.asc(id_col)
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("sample_rank") <= k_per_group)
        .drop("__priority")
    )


def keep_top_frac_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
    id_col: str = "doc_id",
    rank_col: str = "pct_rank",
) -> DataFrame:
    """Per-group percentile-calibrated filter: keep the top ``keep_frac``
    of each group by score — the group-aware companion to the GLOBAL
    :func:`calibrate_keep_threshold`. The practical difference matters
    for multilingual corpora: one global threshold on a quality signal
    whose distribution differs by language silently strangles the
    low-resource languages; per-language percentiles keep the same
    FRACTION everywhere (the FineWeb-style per-language calibration).

    Ranking uses ``percent_rank`` over a TOTAL order (score, then id) so
    ties rank identically in any engine — rank rounds to 6 before the
    cut, making keep decisions engine-exact. One shuffle on the group.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.asc(score_col), F.asc(id_col))
    return (
        df.withColumn(rank_col, F.round(F.percent_rank().over(w), 6))
        .filter(F.col(rank_col) >= F.round(F.lit(1.0 - keep_frac), 6))
    )
