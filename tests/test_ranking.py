"""ranking_metrics (operators/ranking.py): hand-computed metric values,
edge cases (no results, no relevant in top-k), brute-force parity."""

from __future__ import annotations

import math

import pyspark.sql.functions as F  # noqa: F401

from pspcz_analyzer_spark.operators.ranking import ranking_metrics


def _dcg(grades_at_ranks):
    return sum((2**g - 1) / math.log2(r + 1) for r, g in grades_at_ranks)


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        # q1: relevant docs {10(g2), 20(g1), 30(g1)}; results rank
        # 1->10(g2), 2->99(g0), 3->20(g1).
        results = spark.createDataFrame(
            [("q1", 10, 1), ("q1", 99, 2), ("q1", 20, 3)],
            "q_id string, doc_id long, rank long",
        )
        truth = spark.createDataFrame(
            [("q1", 10, 2), ("q1", 20, 1), ("q1", 30, 1)],
            "q_id string, doc_id long, grade long",
        )
        row = ranking_metrics(results, truth, k=3).collect()[0]
        assert row["n_relevant"] == 3
        assert row["recall_at_k"] == round(2 / 3, 6)
        assert row["mrr"] == 1.0  # first result relevant
        dcg = _dcg([(1, 2), (3, 1)])
        idcg = _dcg([(1, 2), (2, 1), (3, 1)])
        assert abs(row["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9

    def test_no_relevant_retrieved(self, spark):
        results = spark.createDataFrame(
            [("q1", 99, 1), ("q1", 98, 2)], "q_id string, doc_id long, rank long"
        )
        truth = spark.createDataFrame(
            [("q1", 10, 1)], "q_id string, doc_id long, grade long"
        )
        row = ranking_metrics(results, truth, k=10).collect()[0]
        assert (row["recall_at_k"], row["mrr"], row["ndcg_at_k"]) == (0.0, 0.0, 0.0)

    def test_query_with_no_results_still_reported(self, spark):
        results = spark.createDataFrame(
            [("q1", 10, 1)], "q_id string, doc_id long, rank long"
        )
        truth = spark.createDataFrame(
            [("q1", 10, 1), ("q2", 20, 2)], "q_id string, doc_id long, grade long"
        )
        rows = {r["q_id"]: r for r in ranking_metrics(results, truth, k=5).collect()}
        assert set(rows) == {"q1", "q2"}  # q2 must NOT silently vanish
        assert rows["q2"]["recall_at_k"] == 0.0 and rows["q2"]["ndcg_at_k"] == 0.0
        assert rows["q1"]["recall_at_k"] == 1.0 and rows["q1"]["ndcg_at_k"] == 1.0

    def test_mrr_uses_rank_beyond_k(self, spark):
        # First relevant at rank 4 with k=3: recall@3 = 0 but MRR = 1/4
        # (MRR is list-wide by definition; only DCG truncates at k).
        results = spark.createDataFrame(
            [("q1", d, r) for r, d in enumerate([99, 98, 97, 10], start=1)],
            "q_id string, doc_id long, rank long",
        )
        truth = spark.createDataFrame(
            [("q1", 10, 1)], "q_id string, doc_id long, grade long"
        )
        row = ranking_metrics(results, truth, k=3).collect()[0]
        assert row["recall_at_k"] == 0.0
        assert row["mrr"] == 0.25

    def test_brute_force_random(self, spark):
        import random

        rng = random.Random(5)
        results_rows, truth_rows = [], []
        for qi in range(6):
            q = f"q{qi}"
            docs = rng.sample(range(100), 20)
            for r, d in enumerate(docs[:12], start=1):
                results_rows.append((q, d, r))
            for d in rng.sample(range(100), 15):
                truth_rows.append((q, d, rng.randint(1, 3)))
        results = spark.createDataFrame(
            results_rows, "q_id string, doc_id long, rank long"
        )
        truth = spark.createDataFrame(
            truth_rows, "q_id string, doc_id long, grade long"
        )
        k = 10
        got = {r["q_id"]: r for r in ranking_metrics(results, truth, k=k).collect()}
        tr = {}
        for q, d, g in truth_rows:
            tr.setdefault(q, {})[d] = g
        for q, judged in tr.items():
            res = sorted(
                [(r, d) for qq, d, r in results_rows if qq == q]
            )
            rel_ranks = [(r, judged.get(d, 0)) for r, d in res if judged.get(d, 0) > 0]
            recall = len([1 for r, _ in rel_ranks if r <= k]) / len(judged)
            mrr = 1.0 / rel_ranks[0][0] if rel_ranks else 0.0
            dcg = _dcg([(r, g) for r, g in rel_ranks if r <= k])
            ideal = sorted(judged.values(), reverse=True)[:k]
            idcg = _dcg(list(enumerate(ideal, start=1)))
            want = (
                round(recall, 6),
                round(mrr, 6),
                round(dcg / idcg if idcg else 0.0, 6),
            )
            have = (
                got[q]["recall_at_k"],
                got[q]["mrr"],
                got[q]["ndcg_at_k"],
            )
            assert all(abs(a - b) < 1e-9 for a, b in zip(have, want)), (q, have, want)


class TestInvertedIndex:
    def test_matches_brute_force_and_caps(self, spark):
        from pspcz_analyzer_spark.operators.ranking import inverted_index

        docs = [
            (10, "the cat sat"),
            (11, "the cat ran"),
            (12, "the dog sat sat"),
            (13, "dog"),
            (14, "cat cat cat"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["term"]: (r["df"], r["postings"])
            for r in inverted_index(df, min_df=2, postings_cap=2).collect()
        }
        # Duplicate occurrences inside a doc count once; postings are the
        # FIRST cap ids ascending; 'ran' (df 1) is dropped by min_df.
        assert got == {
            "the": (3, [10, 11]),
            "cat": (3, [10, 11]),
            "sat": (2, [10, 12]),
            "dog": (2, [12, 13]),
        }

    def test_bounded_state_matches_uncapped_prefix(self, spark):
        from pspcz_analyzer_spark.operators.ranking import inverted_index

        # A term present in every doc: postings must be exactly the first
        # `cap` ids, and df still the full count.
        docs = [(i, "omnipresent filler") for i in range(50)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["term"]: (r["df"], r["postings"])
            for r in inverted_index(df, postings_cap=5).collect()
        }
        assert got["omnipresent"] == (50, [0, 1, 2, 3, 4])
        assert got["filler"] == (50, [0, 1, 2, 3, 4])


class TestRrfFusion:
    def test_rank_topk_deterministic_with_ties(self, spark):
        from pspcz_analyzer_spark.operators.ranking import rank_topk

        df = spark.createDataFrame(
            [(1, 0.9), (2, 0.9), (3, 0.8), (4, 0.7), (5, 0.6)],
            "id long, s double",
        )
        got = {
            r["id"]: r["rank"] for r in rank_topk(df, "id", "s", 4).collect()
        }
        # Ties break by id ascending; only top-4 kept.
        assert got == {1: 1, 2: 2, 3: 3, 4: 4}

    def test_rrf_matches_hand_computation(self, spark):
        from pspcz_analyzer_spark.operators.ranking import rrf_fuse

        a = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "id long, rank long"
        )
        b = spark.createDataFrame(
            [(12, 1), (10, 2), (13, 3)], "id long, rank long"
        )
        rows = {r["id"]: r for r in rrf_fuse(a, b, "id", k=60).collect()}
        # 12: 1/63 + 1/61; 10: 1/61 + 1/62; 11: 1/62; 13: 1/63.
        assert rows[12]["rrf_score"] == round(1 / 63 + 1 / 61, 6)
        assert rows[10]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
        assert rows[11]["rank_b"] is None and rows[13]["rank_a"] is None
        ordered = sorted(rows.values(), key=lambda r: -r["rrf_score"])
        # 1/61 + 1/62 > 1/63 + 1/61: the doc ranked high in BOTH lists
        # beats the one with a single first place.
        assert [r["id"] for r in ordered[:2]] == [10, 12]
