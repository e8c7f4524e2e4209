"""Corpus-preparation pipeline tests: manifest accounting (drop columns
partition the input exactly), the near-dup stage, sink round-trip, and
hash-shard shape. The oracle-paired end-to-end run is the
``training_corpus_prepare`` gate query; these cover the knobs the gate
can't (near_dup=True, hash sharding, manifest arithmetic)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pspcz_analyzer_spark.pipeline import prepare_training_corpus

_GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and the birds sing with "
    "joy in the garden of the old house where the children play"
)
_GOOD_CS = (
    "to je velmi dobra kniha a ja se na ni tesim protoze se mi libi jak "
    "se pribeh vyviji a na konci se vsechno vyresi"
)
_NEAR_EN = (
    "the quick brown fox jumps over the lazy dog and the birds sing with "
    "joy in the garden of the old house where the children play today"
)


@pytest.fixture()
def raw_docs(spark):
    rows = [
        (1, _GOOD_EN),
        (2, _GOOD_EN),          # exact dup of 1 -> dropped at stage 1
        (3, _GOOD_CS),
        (4, "zzz qqq xxx"),     # no stopword markers -> 'und' -> lang drop
        (5, "a !! ?? !!"),      # <5 tokens, short, punct-heavy -> quality
                                # drop (lang 'cs' via the 'a' marker)
        (6, _NEAR_EN),          # near-dup of 1 (one word appended)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, docs, tmp, **kw):
    out = os.path.join(tmp, "corpus")
    m = prepare_training_corpus(
        spark, docs, out, keep_langs=("cs", "de", "en", "es", "fr"), **kw
    )
    back = spark.read.parquet(out)
    return m, back


class TestManifest:
    def test_stage_attribution_partitions_input(self, spark, raw_docs):
        with tempfile.TemporaryDirectory() as tmp:
            m, back = _run(spark, raw_docs, tmp)
            kept_ids = sorted(r.doc_id for r in back.collect())
        assert m["n_input"] == 6
        assert m["n_exact_dup"] == 1          # doc 2
        assert m["n_near_dup"] == 0           # stage off by default
        assert m["n_lang_dropped"] == 1       # doc 4
        assert m["n_quality_dropped"] == 1    # doc 5
        assert m["n_kept"] == 3               # docs 1, 3, 6
        drops = (
            m["n_exact_dup"] + m["n_near_dup"]
            + m["n_lang_dropped"] + m["n_quality_dropped"]
        )
        assert drops + m["n_kept"] == m["n_input"]
        assert kept_ids == [1, 3, 6]

    def test_token_totals_match_kept_rows(self, spark, raw_docs):
        with tempfile.TemporaryDirectory() as tmp:
            m, back = _run(spark, raw_docs, tmp)
            got = back.groupBy().sum("n_tokens", "n_bpe_tokens").first()
        assert m["kept_tokens"] == got[0]
        assert m["kept_bpe_tokens"] == got[1]


class TestNearDup:
    def test_near_dup_stage_drops_higher_id(self, spark, raw_docs):
        with tempfile.TemporaryDirectory() as tmp:
            m, back = _run(spark, raw_docs, tmp, near_dup=True)
            kept = sorted(r.doc_id for r in back.collect())
        # doc 6 is a one-word edit of doc 1 -> LSH candidate -> dropped
        # (keep-first: the lower id 1 survives).
        assert m["n_near_dup"] >= 1
        assert 1 in kept and 6 not in kept
        assert m["n_kept"] == len(kept)

    def test_manifest_still_partitions_with_near_dup(self, spark, raw_docs):
        with tempfile.TemporaryDirectory() as tmp:
            m, _ = _run(spark, raw_docs, tmp, near_dup=True)
        drops = (
            m["n_exact_dup"] + m["n_near_dup"]
            + m["n_lang_dropped"] + m["n_quality_dropped"]
        )
        assert drops + m["n_kept"] == m["n_input"]


class TestSharding:
    def test_hash_shards_cover_and_round_trip(self, spark):
        rows = [(i, f"{_GOOD_EN} variation {i}") for i in range(200)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        with tempfile.TemporaryDirectory() as tmp:
            m, back = _run(spark, docs, tmp, shards=4, min_quality=0.0)
            shards = dict(
                (r["shard"], r["n"])
                for r in back.groupBy("shard").count().withColumnRenamed("count", "n").collect()
            )
        assert m["n_kept"] == 200
        assert set(shards) == {0, 1, 2, 3}  # every shard populated
        # xxhash64 sharding should be roughly uniform on 200 sequential ids.
        assert max(shards.values()) <= 4 * min(shards.values())

    def test_mod_sharding_is_id_mod_shards(self, spark):
        rows = [(i, f"{_GOOD_EN} variation {i}") for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        with tempfile.TemporaryDirectory() as tmp:
            _, back = _run(
                spark, docs, tmp, shards=8, min_quality=0.0, shard_by_hash=False
            )
            got = {r.doc_id: r.shard for r in back.collect()}
        assert got == {i: i % 8 for i in range(20)}


class TestExtend:
    def _prepare(self, spark, tmp):
        from pspcz_analyzer_spark.pipeline import extend_training_corpus

        base = spark.createDataFrame(
            [(1, _GOOD_EN), (2, _GOOD_CS)], "doc_id long, text string"
        )
        out = os.path.join(tmp, "corpus")
        prepare_training_corpus(
            spark, base, out, keep_langs=("cs", "de", "en", "es", "fr")
        )
        return out, extend_training_corpus

    def test_extend_appends_only_novel(self, spark):
        with tempfile.TemporaryDirectory() as tmp:
            out, extend = self._prepare(spark, tmp)
            batch = spark.createDataFrame(
                [
                    (10, _GOOD_EN),     # fingerprint already in corpus
                    (11, _NEAR_EN),     # novel (exact dedup only)
                    (12, _NEAR_EN),     # exact dup of 11 within the batch
                    (13, "zzz qqq xxx"),  # 'und' -> lang drop
                ],
                "doc_id long, text string",
            )
            m = extend(spark, batch, out, keep_langs=("cs", "de", "en", "es", "fr"))
            ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert m["n_input"] == 4
        assert m["n_already_present"] == 1   # doc 10
        assert m["n_exact_dup"] == 1         # doc 12
        assert m["n_lang_dropped"] == 1      # doc 13
        assert m["n_quality_dropped"] == 0
        assert m["n_kept"] == 1              # doc 11
        assert ids == [1, 2, 11]

    def test_extend_is_idempotent(self, spark):
        with tempfile.TemporaryDirectory() as tmp:
            out, extend = self._prepare(spark, tmp)
            batch = spark.createDataFrame(
                [(11, _NEAR_EN)], "doc_id long, text string"
            )
            m1 = extend(spark, batch, out)
            m2 = extend(spark, batch, out)
            n_rows = spark.read.parquet(out).count()
        assert m1["n_kept"] == 1
        assert m2["n_kept"] == 0 and m2["n_already_present"] == 1
        assert n_rows == 3  # 2 base + 1 novel, second extend added nothing


class TestStreamingIngest:
    def test_stream_drains_landing_and_checkpoint_survives(self, spark):
        from pspcz_analyzer_spark.streaming.corpus import stream_extend_corpus

        with tempfile.TemporaryDirectory() as tmp:
            landing = os.path.join(tmp, "landing")
            out = os.path.join(tmp, "corpus")
            ckpt = os.path.join(tmp, "ckpt")
            os.makedirs(landing)
            spark.createDataFrame(
                [(1, _GOOD_EN), (2, _GOOD_CS)], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(landing)

            m1 = stream_extend_corpus(spark, landing, out, ckpt)
            assert sum(m["n_kept"] for m in m1) == 2  # cold start builds

            # Replaying with the same checkpoint and no new files: no-op.
            m2 = stream_extend_corpus(spark, landing, out, ckpt)
            assert sum(m.get("n_kept", 0) for m in m2) == 0

            # A new landing file with one novel + one already-present doc.
            spark.createDataFrame(
                [(3, _NEAR_EN), (4, _GOOD_EN)], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(landing)
            m3 = stream_extend_corpus(spark, landing, out, ckpt)
            assert sum(m["n_kept"] for m in m3) == 1
            assert sum(m["n_already_present"] for m in m3) == 1

            ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert ids == [1, 2, 3]


class TestNearDupIndex:
    """MinHash sidecar index: batch near-dups vs HISTORY drop; index stays
    current across extends; crash/replay cannot double-insert."""

    def _seed(self, spark, tmp):
        from pspcz_analyzer_spark.pipeline import (
            build_minhash_index,
            extend_training_corpus,
        )

        base = spark.createDataFrame(
            [(1, _GOOD_EN), (2, _GOOD_CS)], "doc_id long, text string"
        )
        out = os.path.join(tmp, "corpus")
        idx = os.path.join(tmp, "corpus_minhash_idx")
        prepare_training_corpus(
            spark, base, out, keep_langs=("cs", "de", "en", "es", "fr")
        )
        n = build_minhash_index(spark, spark.read.parquet(out), idx)
        assert n == 2
        return out, idx, extend_training_corpus

    def test_near_dup_vs_history_dropped_and_attributed(self, spark):
        with tempfile.TemporaryDirectory() as tmp:
            out, idx, extend = self._seed(spark, tmp)
            batch = spark.createDataFrame(
                [
                    (11, _NEAR_EN),   # near-dup of corpus doc 1 -> dropped
                    (12, _GOOD_CS + " a jeste neco navic uplne jineho tady"),
                                      # near-dup of corpus doc 2 -> dropped
                    (13, "completely different text about machine learning "
                         "with the transformers and the attention that the "
                         "model needs for the long context"),  # novel
                ],
                "doc_id long, text string",
            )
            m = extend(
                spark, batch, out,
                keep_langs=("cs", "de", "en", "es", "fr"),
                near_dup_index=idx,
            )
            ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        assert m["n_near_dup_history"] == 2
        assert m["n_kept"] == 1
        assert ids == [1, 2, 13]

    def test_index_extends_so_later_batches_see_earlier_ones(self, spark):
        with tempfile.TemporaryDirectory() as tmp:
            out, idx, extend = self._seed(spark, tmp)
            novel = (
                "completely different text about machine learning with the "
                "transformers and the attention that the model needs"
            )
            b1 = spark.createDataFrame([(21, novel)], "doc_id long, text string")
            m1 = extend(spark, b1, out, near_dup_index=idx)
            assert m1["n_kept"] == 1
            # Batch 2 near-duplicates BATCH 1 (not the base corpus).
            b2 = spark.createDataFrame(
                [(22, novel + " today")], "doc_id long, text string"
            )
            m2 = extend(spark, b2, out, near_dup_index=idx)
            assert m2["n_near_dup_history"] == 1 and m2["n_kept"] == 0
            # Index holds exactly the corpus ids, once each.
            idx_ids = sorted(
                r.doc_id for r in spark.read.parquet(idx).collect()
            )
            assert idx_ids == [1, 2, 21]

    def test_replay_does_not_double_insert_index(self, spark):
        with tempfile.TemporaryDirectory() as tmp:
            out, idx, extend = self._seed(spark, tmp)
            b = spark.createDataFrame(
                [(31, "totally novel text with the words that the quality "
                      "filter is happy about in the long run")],
                "doc_id long, text string",
            )
            extend(spark, b, out, near_dup_index=idx)
            extend(spark, b, out, near_dup_index=idx)  # replay
            sig_rows = spark.read.parquet(idx).groupBy("doc_id").count().collect()
        assert all(r["count"] == 1 for r in sig_rows)
        assert sorted(r.doc_id for r in sig_rows) == [1, 2, 31]

    def test_streaming_batches_near_dedup_across_batches(self, spark):
        from pspcz_analyzer_spark.streaming.corpus import stream_extend_corpus

        with tempfile.TemporaryDirectory() as tmp:
            landing = os.path.join(tmp, "landing")
            out = os.path.join(tmp, "corpus")
            idx = os.path.join(tmp, "idx")
            ckpt = os.path.join(tmp, "ckpt")
            os.makedirs(landing)
            spark.createDataFrame(
                [(1, _GOOD_EN)], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(landing)
            m1 = stream_extend_corpus(
                spark, landing, out, ckpt, near_dup_index=idx
            )
            assert sum(m["n_kept"] for m in m1) == 1
            # Second landing file: a near-dup of batch 1's doc.
            spark.createDataFrame(
                [(2, _NEAR_EN)], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(landing)
            m2 = stream_extend_corpus(
                spark, landing, out, ckpt, near_dup_index=idx
            )
            assert sum(m.get("n_near_dup_history", 0) for m in m2) == 1
            assert sum(m.get("n_kept", 0) for m in m2) == 0


class TestIngestWithAudit:
    """WAP-gated corpus ingestion: a batch publishes only when the
    quality rules pass over the WHOLE would-be table."""

    @staticmethod
    def _table(spark, tmp_path, name):
        import pspcz_analyzer_spark.manifest as M

        p = str(tmp_path / name)
        spark.createDataFrame(
            [(i, f"doc text number {i} with several words") for i in range(20)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(p)
        M.manifest_init(p)
        return p

    def test_good_batch_publishes(self, spark, tmp_path):
        import pyspark.sql.functions as F

        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.pipeline import ingest_with_audit

        p = self._table(spark, tmp_path, "good")
        batch = spark.createDataFrame(
            [(100 + i, "fresh healthy document with words") for i in range(5)],
            "doc_id long, text string",
        )
        ok, report = ingest_with_audit(
            spark, batch, p, "b1",
            {"nonempty": (F.length("text") > 10, 1.0)},
        )
        assert ok and all(r["passed"] for r in report)
        assert M.load_manifest_table(spark, p).count() == 25
        assert M.list_staged(p) == {}

    def test_bad_batch_drops_and_table_unchanged(self, spark, tmp_path):
        import os

        import pyspark.sql.functions as F

        import pspcz_analyzer_spark.manifest as M
        from pspcz_analyzer_spark.pipeline import ingest_with_audit

        p = self._table(spark, tmp_path, "bad")
        v0 = M.current_version(p)
        batch = spark.createDataFrame(
            [(200, ""), (201, ""), (202, "x")],  # mostly empty docs
            "doc_id long, text string",
        )
        ok, report = ingest_with_audit(
            spark, batch, p, "b2",
            # corpus-level floor: >= 95% of the WHOLE table nonempty
            {"nonempty": (F.length("text") > 10, 0.95)},
        )
        assert not ok
        bad_rule = [r for r in report if r["rule"] == "nonempty"][0]
        assert not bad_rule["passed"] and bad_rule["n_rows"] == 23
        assert M.current_version(p) == v0
        assert M.load_manifest_table(spark, p).count() == 20
        assert M.list_staged(p) == {}
        assert not [f for f in os.listdir(p) if f.startswith("wap-b2")]
