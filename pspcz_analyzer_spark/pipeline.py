"""End-to-end training-corpus preparation: the composition proof.

The individual LLM-data-pipeline operators (exact/near dedup, quality
scoring, language ID, token accounting — operators/dedup.py,
operators/textual.py) are each oracle-checked on their own; this module
chains them into the job a real pretraining-data team runs: raw documents
in, filtered + deduplicated + sharded Parquet corpus out, with a manifest
of what each stage dropped — plus the incremental variant that extends an
existing corpus with only-novel documents.

Reference behavior parity: the reference's enrichment pipeline stages
documents through parse -> filter -> cache the same way
(``/root/reference/pspcz_analyzer/services/llm/pipeline.py:31-88``), and
its resumable enrichment skips already-processed rows by key exactly like
``extend_training_corpus`` skips already-present fingerprints
(``services/llm/cache.py:23-61``).

Scale design (100 TB):
* ONE pass over the text for all per-doc features (fingerprint, quality,
  language, token counts are all codegen'd column expressions on the same
  scan);
* stage accounting uses ``DataFrame.observe`` — metrics accumulate inside
  the single write action, so the manifest costs ZERO extra jobs (the
  naive per-stage ``count()`` would re-execute the pipeline 5x);
* exact-dedup canonical selection shuffles only (fingerprint, id) pairs,
  never full rows;
* the corpus keeps its ``fingerprint`` column, so incremental extension
  dedups against a COLUMN-PRUNED scan of the existing corpus (Parquet
  reads one string column, not the text) — no re-hashing of old data;
* the optional near-dup stage is MinHash-LSH (equi-join on band hashes —
  work proportional to true collisions, no all-pairs anywhere);
* shard assignment is a hash of the id (uniform regardless of id
  distribution); the write repartitions by shard so each output partition
  is produced by one task instead of shards x tasks tiny files.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from pspcz_analyzer_spark.functions.text import fingerprint
from pspcz_analyzer_spark.operators.dedup import minhash_lsh_pairs
from pspcz_analyzer_spark.operators.textual import language_id, quality_score


def _score_docs(docs: DataFrame, text_col: str) -> DataFrame:
    """All per-doc features in one scan: quality features + score,
    predicted language, content fingerprint."""
    return (
        quality_score(docs, text_col)
        .withColumn("pred_lang", language_id(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def _lang_ok(keep_langs: tuple[str, ...] | None) -> F.Column:
    if keep_langs is None:
        return F.lit(True)
    return F.col("pred_lang").isin(*keep_langs)


def _manifest(obs: Observation, flags: DataFrame, metrics: list) -> dict:
    """Manifest values from the write-time observation, falling back to one
    direct aggregation when the observed row is unavailable.

    The fallback exists for one edge: a dynamic-partition write whose
    result is EMPTY (everything dropped / nothing novel) never executes
    any partition task, so the CollectMetrics row is never registered and
    ``obs.get`` raises in the JVM. The extra pass only ever runs in that
    nothing-was-written case.
    """
    try:
        vals = dict(obs.get)
    except Exception:
        vals = flags.agg(*metrics).first().asDict()
    return {k: int(v) for k, v in vals.items()}


def _write_sharded(
    final: DataFrame,
    out_dir: str,
    *,
    id_col: str,
    shards: int,
    shard_by_hash: bool,
    mode: str,
) -> None:
    shard_src = F.xxhash64(F.col(id_col)) if shard_by_hash else F.col(id_col)
    sharded = final.withColumn(
        "shard", F.pmod(shard_src, F.lit(shards)).cast("int")
    )
    # One producing task per shard (collisions still split correctly by
    # partitionBy); without this, every upstream task writes a sliver of
    # every shard -> shards x tasks small files.
    (
        sharded.repartition(shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )


def prepare_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    near_dup: bool = False,
    shards: int = 8,
    shard_by_hash: bool = True,
) -> dict:
    """Filter + dedup + shard ``docs`` into a Parquet corpus at ``out_dir``.

    Stage order (and the manifest's drop attribution): exact dedup ->
    near dedup (optional) -> language filter -> quality filter. A doc
    dropped by several criteria counts only against the FIRST stage that
    rejects it, so the manifest columns sum exactly to ``n_input``.

    Returns the manifest: per-stage drop counts, kept doc/token totals,
    and the output location. ``shard_by_hash=False`` derives the shard
    from ``id % shards`` instead of a hash — deterministic for oracle
    comparison; hash sharding is the production default (uniform even
    when ids cluster).
    """
    scored = _score_docs(docs, text_col)

    # Exact dedup: canonical = min id per fingerprint. Only (fp, id) pairs
    # ride the shuffle; the flag joins back on the id.
    canon_ids = (
        scored.select("fingerprint", id_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .withColumn("__canon", F.lit(True))
    )
    flags = scored.join(canon_ids, id_col, "left")

    if near_dup:
        # LSH candidates among exact-canonical docs; keep-first rule drops
        # the higher id of every candidate pair. This keeps the LOCAL
        # minima of the pair graph — deliberately laxer than collapsing
        # whole transitive clusters (A~B and B~C never forces dropping C
        # when C is not a near-dup of A). For the aggressive variant, run
        # operators/graph.py::cluster_pairs on these pairs and keep one
        # survivor per component.
        canon_docs = docs.join(canon_ids.select(id_col), id_col, "left_semi")
        near_ids = (
            minhash_lsh_pairs(canon_docs, text_col, id_col)
            .select(F.col("id_b").alias(id_col))
            .distinct()
            .withColumn("__near", F.lit(True))
        )
        flags = flags.join(near_ids, id_col, "left")
    else:
        flags = flags.withColumn("__near", F.lit(None).cast("boolean"))

    is_canon = F.coalesce(F.col("__canon"), F.lit(False))
    is_near = F.coalesce(F.col("__near"), F.lit(False))
    lang_ok = _lang_ok(keep_langs)
    quality_ok = F.col("quality_score") >= F.lit(min_quality)
    keep = is_canon & ~is_near & lang_ok & quality_ok

    metrics = [
        F.count(F.lit(1)).alias("n_input"),
        F.sum((~is_canon).cast("long")).alias("n_exact_dup"),
        F.sum((is_canon & is_near).cast("long")).alias("n_near_dup"),
        F.sum((is_canon & ~is_near & ~lang_ok).cast("long")).alias("n_lang_dropped"),
        F.sum((is_canon & ~is_near & lang_ok & ~quality_ok).cast("long")).alias(
            "n_quality_dropped"
        ),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(F.lit(0))).alias(
            "kept_tokens"
        ),
        F.sum(F.when(keep, F.col("n_bpe_tokens")).otherwise(F.lit(0))).alias(
            "kept_bpe_tokens"
        ),
    ]
    obs = Observation()
    observed = flags.observe(obs, *metrics)

    final = observed.filter(keep).drop("__canon", "__near")
    _write_sharded(
        final,
        out_dir,
        id_col=id_col,
        shards=shards,
        shard_by_hash=shard_by_hash,
        mode="overwrite",
    )

    manifest = _manifest(obs, flags, metrics)
    manifest["out_dir"] = out_dir
    manifest["shards"] = shards
    return manifest


def build_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    mode: str = "overwrite",
) -> int:
    """Persist the MinHash-signature sidecar index for a corpus: one row
    per doc, ``(id, signature array<bigint>)``.

    The index is what lets incremental ingestion near-dup-check a batch
    against ALL history without rescanning history's text: signatures are
    deterministic (stable hash seeds), so an index built once stays valid
    forever and extends append-only. Band hashes are NOT stored — they
    re-derive from the signature at join time
    (operators/dedup.py::bands_from_signatures), keeping the sidecar a
    single narrow table (~0.5 KB/doc at 64 hashes: ~50 GB per 100M docs,
    a footnote next to a 100 TB corpus).

    Returns the number of signatures written.
    """
    from pspcz_analyzer_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(
        docs.select(id_col, text_col), text_col, id_col, num_hashes, shingle_n
    )
    sig.write.mode(mode).parquet(index_dir)
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(index_dir, f)).metadata.num_rows
        for f in os.listdir(index_dir)
        if f.endswith(".parquet")
    )


def _near_history_ids(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_dir: str,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    threshold: float,
) -> "tuple[DataFrame, DataFrame]":
    """Batch doc ids that near-duplicate ANY indexed historical doc, plus
    the batch signature frame (reused for the index append).

    Candidate generation is an equi-join on (band_idx, band_hash) with the
    SMALL batch side broadcast — history's index is scanned (columns: id,
    signature) but never shuffled. Candidates then verify by estimated
    Jaccard = fraction of agreeing signature positions >= `threshold`,
    which kills LSH false positives without touching any text.
    """
    from pspcz_analyzer_spark.operators.dedup import (
        bands_from_signatures,
        minhash_signatures,
    )

    batch_sig = minhash_signatures(
        batch_docs.select(id_col, text_col), text_col, id_col, num_hashes, shingle_n
    )
    hist_sig = spark.read.parquet(index_dir)
    batch_bands = bands_from_signatures(batch_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__bid"), "band_idx", "band_hash"
    )
    hist_bands = bands_from_signatures(hist_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__hid"), "band_idx", "band_hash"
    )
    cands = (
        hist_bands.join(F.broadcast(batch_bands), ["band_idx", "band_hash"])
        .select("__bid", "__hid")
        .distinct()
    )
    agree = F.size(
        F.filter(
            F.zip_with("__bsig", "__hsig", lambda a, b: a == b), lambda x: x
        )
    ) / F.lit(num_hashes)
    near = (
        cands.join(
            F.broadcast(batch_sig.select(F.col(id_col).alias("__bid"),
                                         F.col("signature").alias("__bsig"))),
            "__bid",
        )
        .join(
            hist_sig.select(F.col(id_col).alias("__hid"),
                            F.col("signature").alias("__hsig")),
            "__hid",
        )
        .filter(agree >= F.lit(threshold))
        .select(F.col("__bid").alias(id_col))
        .distinct()
        .withColumn("__near_hist", F.lit(True))
    )
    return near, batch_sig


def extend_training_corpus(
    spark: SparkSession,
    new_docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    shards: int = 8,
    shard_by_hash: bool = True,
    near_dup_index: str | None = None,
    near_dup_threshold: float = 0.5,
    num_hashes: int = 64,
    lsh_bands: int = 16,
    shingle_n: int = 3,
) -> dict:
    """Append only-novel documents to the corpus ``prepare_training_corpus``
    wrote (SURVEY T4's resumable-increment shape, applied to the corpus).

    New docs are exact-deduplicated against the EXISTING corpus (its
    ``fingerprint`` column — a column-pruned Parquet scan, no text re-hash)
    and against each other, then pass the same language/quality rules and
    append shard-wise with the same shard function (pass the prepare-time
    ``shards``/``shard_by_hash``). Idempotent: re-extending with the same
    batch appends nothing.

    With ``near_dup_index`` set (a :func:`build_minhash_index` sidecar),
    batch docs are ALSO checked against all historical signatures:
    LSH-band candidates (batch side broadcast — history never shuffles)
    verified by signature-agreement Jaccard >= ``near_dup_threshold``.
    Surviving docs' signatures append to the index (id-anti-joined, so
    crash/replay cannot double-insert), keeping it current for the next
    batch. Cold start bootstraps: a missing index means nothing to check,
    and the first batch seeds it.

    Drop attribution order: already-present -> exact dup within the batch
    -> near-dup vs history -> language -> quality; columns sum to
    ``n_input``.
    """
    if os.path.exists(out_dir):
        existing_fp = (
            spark.read.parquet(out_dir)
            .select("fingerprint")
            .distinct()
            .withColumn("__present", F.lit(True))
        )
    else:
        # Cold start: no corpus yet — every batch fingerprint is novel.
        # (Local-FS existence check; an object-store deployment would ask
        # the Hadoop FileSystem API instead.)
        existing_fp = spark.createDataFrame(
            [], "fingerprint string, __present boolean"
        )
    scored = _score_docs(new_docs, text_col)
    canon_ids = (
        scored.select("fingerprint", id_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .withColumn("__canon", F.lit(True))
    )
    flags = scored.join(existing_fp, "fingerprint", "left").join(
        canon_ids, id_col, "left"
    )

    batch_sig = None
    if near_dup_index is not None and os.path.exists(near_dup_index):
        near_ids, batch_sig = _near_history_ids(
            spark,
            new_docs,
            near_dup_index,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=lsh_bands,
            shingle_n=shingle_n,
            threshold=near_dup_threshold,
        )
        flags = flags.join(F.broadcast(near_ids), id_col, "left")
    else:
        flags = flags.withColumn("__near_hist", F.lit(None).cast("boolean"))

    present = F.coalesce(F.col("__present"), F.lit(False))
    is_canon = F.coalesce(F.col("__canon"), F.lit(False))
    near_hist = F.coalesce(F.col("__near_hist"), F.lit(False))
    lang_ok = _lang_ok(keep_langs)
    quality_ok = F.col("quality_score") >= F.lit(min_quality)
    keep = ~present & is_canon & ~near_hist & lang_ok & quality_ok

    metrics = [
        F.count(F.lit(1)).alias("n_input"),
        F.sum(present.cast("long")).alias("n_already_present"),
        F.sum((~present & ~is_canon).cast("long")).alias("n_exact_dup"),
        F.sum((~present & is_canon & near_hist).cast("long")).alias(
            "n_near_dup_history"
        ),
        F.sum((~present & is_canon & ~near_hist & ~lang_ok).cast("long")).alias(
            "n_lang_dropped"
        ),
        F.sum(
            (~present & is_canon & ~near_hist & lang_ok & ~quality_ok).cast("long")
        ).alias("n_quality_dropped"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(F.lit(0))).alias(
            "kept_tokens"
        ),
        F.sum(F.when(keep, F.col("n_bpe_tokens")).otherwise(F.lit(0))).alias(
            "kept_bpe_tokens"
        ),
    ]
    obs = Observation()
    observed = flags.observe(obs, *metrics)

    final = observed.filter(keep).drop("__present", "__canon", "__near_hist")
    _write_sharded(
        final,
        out_dir,
        id_col=id_col,
        shards=shards,
        shard_by_hash=shard_by_hash,
        mode="append",
    )

    manifest = _manifest(obs, flags, metrics)

    if near_dup_index is not None and manifest.get("n_kept", 0) > 0:
        # Keep the sidecar current: append the kept docs' signatures,
        # anti-joined by id against what the index already holds so a
        # crash between corpus write and index write (or a replayed
        # batch) can never double-insert. Kept ids re-derive from the
        # corpus read-back (tiny column-pruned scan of the appended
        # shards), not from a second pass over the batch plan.
        from pspcz_analyzer_spark.operators.dedup import minhash_signatures

        if batch_sig is None:  # index did not exist yet: first batch seeds it
            batch_sig = minhash_signatures(
                new_docs.select(id_col, text_col),
                text_col,
                id_col,
                num_hashes,
                shingle_n,
            )
        kept_ids = (
            spark.read.parquet(out_dir).select(id_col).distinct()
        )
        novel_sig = batch_sig.join(kept_ids, id_col, "left_semi")
        if os.path.exists(near_dup_index):
            indexed = spark.read.parquet(near_dup_index).select(id_col)
            novel_sig = novel_sig.join(indexed, id_col, "left_anti")
        novel_sig.write.mode("append").parquet(near_dup_index)

    manifest["out_dir"] = out_dir
    manifest["shards"] = shards
    return manifest


def ingest_with_audit(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    ref: str,
    rules: "dict[str, tuple]",
):
    """Audited corpus ingestion — the write-audit-publish loop a 100 TB
    training-data lake runs on every arrival batch: STAGE the batch
    against the manifest table (full append validation, invisible to
    readers), run the declarative quality RULES over the audit view of
    the WHOLE would-be table (not just the batch — a batch that is fine
    alone can still push a corpus-level fraction past its floor), then
    PUBLISH metadata-only if every rule passes or DROP the staged files
    if any fails — the table never serves a byte of a bad batch, and a
    crash at any point leaves either the old table or the staged ref
    for a later retry/inspect.

    Returns ``(published: bool, report_rows)`` where report_rows is
    :func:`operators.validate.check_expectations`'s one-row-per-rule
    verdict collected for the caller's ledger."""
    from pspcz_analyzer_spark import manifest as M
    from pspcz_analyzer_spark.operators.validate import check_expectations

    M.stage_append(batch, table_path, ref)
    try:
        report = check_expectations(
            M.load_staged(spark, table_path, ref), rules
        ).collect()
    except Exception:
        M.drop_staged(table_path, ref)  # ref must not leak on audit crash
        raise
    if all(r["passed"] for r in report):
        M.publish_staged(spark, table_path, ref)
        return True, report
    M.drop_staged(table_path, ref)
    return False, report
