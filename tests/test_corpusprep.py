"""Known-answer tests for the corpus-preparation operators
(operators/corpusprep.py): deterministic splitting, sequence packing,
benchmark decontamination, and top-terms."""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.operators.corpusprep import (
    _KNUTH,
    contamination_report,
    decontaminate,
    pack_sequences,
    top_terms,
    train_val_test_split,
)


class TestTrainValTestSplit:
    def test_split_matches_hand_hash_and_is_exhaustive(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        rows = {r.doc_id: r for r in train_val_test_split(df).collect()}
        assert len(rows) == 1000
        for doc_id, r in rows.items():
            bucket = ((doc_id * _KNUTH) % (1 << 32)) % 100
            assert r.bucket == bucket
            expect = "train" if bucket < 90 else ("val" if bucket < 95 else "test")
            assert r.split == expect

    def test_split_proportions_roughly_90_5_5(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        counts = {
            r.split: r.n
            for r in train_val_test_split(df).groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert 0.85 <= counts["train"] / 2000 <= 0.95
        assert 0.02 <= counts["val"] / 2000 <= 0.09
        assert 0.02 <= counts["test"] / 2000 <= 0.09

    def test_split_stable_under_data_growth(self, spark):
        # Docs present in the smaller set keep their split in the larger one.
        small = train_val_test_split(spark.range(100).withColumnRenamed("id", "doc_id"))
        big = train_val_test_split(spark.range(500).withColumnRenamed("id", "doc_id"))
        s = {r.doc_id: r.split for r in small.collect()}
        b = {r.doc_id: r.split for r in big.collect()}
        assert all(b[k] == v for k, v in s.items())


class TestPackSequences:
    def test_contiguous_fill_hand_case(self, spark):
        # One shard, budget 10: tokens 4,4,4 -> doc 3 starts at offset 8
        # (straddles into pack 0->1 boundary region but STARTS in pack 0);
        # doc 4 (tokens 7) starts at cum 12 -> pack 1 offset 2.
        df = spark.createDataFrame(
            [(1, 0, 4), (2, 0, 4), (3, 0, 4), (4, 0, 7)],
            "doc_id long, shard int, n_tokens int",
        )
        out = {r.doc_id: r for r in pack_sequences(df, "n_tokens", budget=10).collect()}
        assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
        assert (out[2].pack_id, out[2].pack_offset) == (0, 4)
        assert (out[3].pack_id, out[3].pack_offset) == (0, 8)
        assert (out[4].pack_id, out[4].pack_offset) == (1, 2)

    def test_shards_pack_independently(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 6), (2, 1, 6), (3, 0, 6), (4, 1, 6)],
            "doc_id long, shard int, n_tokens int",
        )
        out = {r.doc_id: r for r in pack_sequences(df, "n_tokens", budget=10).collect()}
        # Each shard restarts at offset 0; second doc per shard starts at 6.
        assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
        assert (out[2].pack_id, out[2].pack_offset) == (0, 0)
        assert (out[3].pack_id, out[3].pack_offset) == (0, 6)
        assert (out[4].pack_id, out[4].pack_offset) == (0, 6)

    def test_offsets_always_below_budget(self, spark):
        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("int").alias("shard"),
            ((F.col("id") * 7) % 23 + 1).cast("int").alias("n_tokens"),
        )
        bad = (
            pack_sequences(df, "n_tokens", budget=64)
            .filter((F.col("pack_offset") < 0) | (F.col("pack_offset") >= 64))
            .count()
        )
        assert bad == 0


class TestDecontaminate:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "one two three four five six seven eight"),
                (3, "totally unrelated words nothing shared here at all"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            # Shares the 5-gram "beta gamma delta epsilon zeta" with doc 1.
            [(100, "beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_planted_overlap_flagged_with_count(self, spark):
        corpus, bench = self._frames(spark)
        rows = contamination_report(corpus, bench, n=5).collect()
        assert {r.doc_id for r in rows} == {1}
        # Doc 1 tokens 2-6 == the benchmark's single full 5-gram.
        assert rows[0].n_shared_shingles == 1

    def test_decontaminate_removes_flagged_keeps_rest(self, spark):
        corpus, bench = self._frames(spark)
        kept = decontaminate(corpus, bench, n=5)
        assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
        # Full rows survive (anti-join on id, not a projection).
        assert kept.columns == corpus.columns

    def test_clean_benchmark_flags_nothing(self, spark):
        corpus, _ = self._frames(spark)
        bench = spark.createDataFrame(
            [(100, "nine ten eleven twelve thirteen fourteen")],
            "doc_id long, text string",
        )
        assert contamination_report(corpus, bench, n=5).count() == 0


class TestTopTerms:
    def test_counts_and_order(self, spark):
        df = spark.createDataFrame(
            [
                (1, "spark spark flink"),
                (2, "spark flink"),
                (3, "duckdb"),
            ],
            "doc_id long, text string",
        )
        rows = top_terms(df, k=2).collect()
        # spark: df=2 total=3; flink: df=2 total=2; duckdb: df=1 (cut by k).
        assert [(r.term, r.doc_freq, r.total_occurrences) for r in rows] == [
            ("spark", 2, 3),
            ("flink", 2, 2),
        ]

    def test_normalization_folds_case_and_diacritics(self, spark):
        df = spark.createDataFrame(
            [(1, "Sněmovna snemovna SNĚMOVNA")], "doc_id long, text string"
        )
        rows = top_terms(df, k=5).collect()
        assert [(r.term, r.total_occurrences) for r in rows] == [("snemovna", 3)]

    def test_empty_and_blank_docs_contribute_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
        )
        rows = top_terms(df, k=5).collect()
        assert [(r.term, r.doc_freq) for r in rows] == [("word", 1)]
