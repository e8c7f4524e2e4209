"""Similarity + ANN + PCA tests: hand-computed cosines, invariants, the
Gram-trick PCA recovering cluster structure, LSH bucket determinism."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from pspcz_analyzer_spark.operators.ann import (
    brute_force_topk,
    cosine,
    lsh_bucket,
    lsh_bucketed_pairs,
)
from pspcz_analyzer_spark.operators.similarity import (
    encode_votes,
    mp_cosine_pairs,
    pca_coords,
    sparse_cosine_pairs,
    vote_entries,
)


class TestEncoding:
    def test_vote_mapping(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "A"), (1, 2, "B"), (1, 3, "C"), (1, 4, "@")],
            "id_poslanec long, id_hlasovani long, vysledek string",
        )
        vals = {
            r["id_hlasovani"]: r["vote_num"] for r in encode_votes(df).collect()
        }
        assert vals == {1: 1.0, 2: -1.0, 3: 0.0, 4: 0.0}


class TestSparseCosine:
    def test_hand_computed(self, spark):
        # a = (1, 1, 0), b = (1, -1, 0) over keys 1..3 -> cos = 0
        # a = (1, 1), c = (1, 1) -> cos = 1
        entries = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 1.0),
             ("b", 1, 1.0), ("b", 2, -1.0),
             ("c", 1, 1.0), ("c", 2, 1.0)],
            "id_poslanec string, id_hlasovani long, v double",
        )
        got = {
            (r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in sparse_cosine_pairs(entries).collect()
        }
        assert got[("a", "b")] == 0.0
        assert got[("a", "c")] == 1.0
        assert got[("b", "c")] == 0.0

    def test_zero_norm_guard(self, spark):
        entries = spark.createDataFrame(
            [("a", 1, 0.0), ("b", 1, 1.0)],
            "id_poslanec string, id_hlasovani long, v double",
        )
        got = sparse_cosine_pairs(entries).collect()
        assert got[0]["cosine_sim"] == 0.0

    def test_no_plan_blowup(self, spark):
        """The pair join must be an equi-join on the vote key — never a
        nested-loop/cartesian over ids (the round-1 scale killer)."""
        entries = spark.createDataFrame(
            [("a", 1, 1.0), ("b", 1, 1.0)],
            "id_poslanec string, id_hlasovani long, v double",
        )
        plan = sparse_cosine_pairs(entries)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestMpCosinePairs:
    def test_cross_party_only_and_range(self, mp_votes, void_votes, mp_info):
        rows = mp_cosine_pairs(mp_votes, void_votes, mp_info, k=None).collect()
        assert rows
        for r in rows:
            assert r["group_a"] != r["group_b"]
            assert -1.0 <= r["cosine_sim"] <= 1.0
            assert r["id_a"] < r["id_b"]

    def test_identical_voters_cosine_one(self, mp_votes, void_votes, mp_info):
        got = {
            (r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in mp_cosine_pairs(mp_votes, void_votes, mp_info, k=None).collect()
        }
        # MPs 1 (ANO) and 4 (ODS) both vote YES on all 5 votes.
        assert got[(1, 4)] == 1.0


class TestPCA:
    def test_recovers_two_clusters(self, spark, void_votes):
        # 4 MPs: two always-YES, two always-NO over 6 votes -> PC1 splits them.
        rows = []
        for vid in range(1, 7):
            rows += [(1, vid, "A"), (2, vid, "A"), (3, vid, "B"), (4, vid, "B")]
        mp_votes = spark.createDataFrame(
            rows, "id_poslanec long, id_hlasovani long, vysledek string"
        )
        coords = {r["id_poslanec"]: (r["x"], r["y"]) for r in pca_coords(mp_votes, void_votes).collect()}
        assert len(coords) == 4
        # Same-cluster MPs coincide on PC1; clusters are symmetric about 0.
        assert coords[1][0] == pytest.approx(coords[2][0], abs=1e-6)
        assert coords[3][0] == pytest.approx(coords[4][0], abs=1e-6)
        assert coords[1][0] == pytest.approx(-coords[3][0], abs=1e-6)
        assert abs(coords[1][0]) > 1.0
        # No variance left for PC2.
        assert all(abs(y) < 1e-6 for _, y in coords.values())

    def test_total_variance_matches_numpy(self, spark, void_votes, mp_votes):
        """Coordinates match a direct dense NumPy PCA of the same matrix."""
        import numpy as np

        entries = vote_entries(mp_votes, void_votes).collect()
        ids = sorted({r["id_poslanec"] for r in entries})
        votes = sorted({r["id_hlasovani"] for r in entries})
        X = np.zeros((len(ids), len(votes)))
        for r in entries:
            X[ids.index(r["id_poslanec"]), votes.index(r["id_hlasovani"])] = r["v"]
        Xc = X - X.mean(axis=0)
        U, S, _ = np.linalg.svd(Xc, full_matrices=False)
        want = np.abs(U[:, :2] * S[:2])
        got_rows = {r["id_poslanec"]: (r["x"], r["y"]) for r in pca_coords(mp_votes, void_votes).collect()}
        got = np.abs(np.array([got_rows[p] for p in ids]))
        assert np.allclose(got, want, atol=1e-4)


class TestIVF:
    def test_query_cell_contains_self_and_twin(self, spark):
        """The query vector's own row and a perturbed twin must surface in
        IVF top-k (they land in the probed cell by construction)."""
        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.operators.ann import ivf_topk

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        base = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
        twin = spark.createDataFrame(
            [(99999, [float(x) * 1.001 for x in base], "t")],
            "vec_id long, embedding array<float>, label string",
        )
        corpus = emb.selectExpr(
            "vec_id", "CAST(embedding AS array<float>) AS embedding", "label"
        ).unionByName(twin)
        rows = ivf_topk(
            corpus, [float(x) for x in base], k=5, n_centroids=8, n_probe=2
        ).collect()
        ids = [r["vec_id"] for r in rows]
        assert ids[0] in (3, 99999) and {3, 99999} <= set(ids)
        assert rows[0]["cosine_sim"] >= 0.999999

    def test_ivf_recall_vs_bruteforce(self, spark):
        """Probing 4 of 8 cells must recover most of the exact top-10."""
        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.operators.ann import brute_force_topk, ivf_topk

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
        exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
        approx = {r["vec_id"] for r in ivf_topk(emb, q, k=10, n_centroids=8, n_probe=4).collect()}
        recall = len(set(exact) & approx) / 10
        assert recall >= 0.5, f"IVF recall {recall}"  # half the cells probed

    def test_deterministic(self, spark):
        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.operators.ann import ivf_topk

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
        r1 = [(r["vec_id"], r["cosine_sim"]) for r in ivf_topk(emb, q, k=5).collect()]
        r2 = [(r["vec_id"], r["cosine_sim"]) for r in ivf_topk(emb, q, k=5).collect()]
        assert r1 == r2


class TestANN:
    def test_cosine_known_values(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
            "a array<double>, b array<double>",
        )
        got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
        assert got[0] == pytest.approx(0.0)
        assert got[1] == pytest.approx(1.0)
        assert got[2] == 0.0  # zero-norm guard

    def test_brute_force_topk(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        rows = brute_force_topk(df, [1.0, 0.0], k=2).collect()
        assert [r["vec_id"] for r in rows] == [1, 2]
        assert rows[0]["cosine_sim"] == 1.0

    def test_lsh_bucket_deterministic_and_locality(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.001, 0.0, 0.0]), (3, [-1.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        b1 = {r["vec_id"]: r["lsh_bucket"] for r in lsh_bucket(df, dim=4).collect()}
        b2 = {r["vec_id"]: r["lsh_bucket"] for r in lsh_bucket(df, dim=4).collect()}
        assert b1 == b2
        assert b1[1] == b1[2]  # near-identical vectors share a bucket
        assert b1[1] != b1[3]  # opposite vectors do not

    def test_lsh_pairs_find_near_identical(self, spark):
        df = spark.createDataFrame(
            [(i, [1.0 + 0.001 * i, 0.5]) for i in range(5)] + [(99, [-1.0, -0.5])],
            "vec_id long, embedding array<double>",
        )
        pairs = {(r["id_a"], r["id_b"]) for r in lsh_bucketed_pairs(df, dim=2, k=50).collect()}
        assert (0, 1) in pairs
        assert all(99 not in p for p in pairs)

    def test_lsh_tags_match_column_expr(self, spark):
        """The vectorized NumPy bucketing must agree bit-for-bit with the
        column-expression formulation for every table."""
        from pspcz_analyzer_spark.catalog import load_table
        from pspcz_analyzer_spark.operators.ann import _bucket_expr, _lsh_tags

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
        tags = {
            (r["vec_id"], r["t"]): r["b"]
            for r in _lsh_tags(emb, 64, 16, 4, "vec_id", "embedding").collect()
        }
        for t in range(4):
            expr = {
                r["vec_id"]: r["b"]
                for r in emb.select(
                    "vec_id", _bucket_expr("embedding", 64, 16, t).alias("b")
                ).collect()
            }
            for vid, b in expr.items():
                assert tags[(vid, t)] == b, (vid, t)

    def test_lsh_recall_on_planted_near_dups(self, spark):
        """OR-amplification contract: near-duplicate vectors (cosine ~0.99)
        must survive 16-plane AND x 8-table OR with near-certain recall
        (per-table p ~ (1 - theta/pi)^16 ~ 0.6, so 1 - 0.4^8 > 0.999),
        while unrelated random pairs (cosine ~0) almost never collide.

        NB on *uniformly random* corpora the true top pairs sit near cosine
        0.5 and sign-LSH at these settings correctly rejects them — recall
        is a property of actual near-duplicates, not of arbitrary top-k.
        """
        from pspcz_analyzer_spark.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
        # Plant a perturbed twin of every vector: id + 100000, ~0.1% noise.
        twin = emb.selectExpr(
            "vec_id + 100000 AS vec_id",
            "transform(embedding, (x, i) -> x * CAST(1.0 + 0.001 * ((i % 7) - 3) AS FLOAT)) AS embedding",
            "label",
        )
        corpus = emb.unionByName(twin)
        pairs = {
            (r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in lsh_bucketed_pairs(
                corpus, dim=64, num_planes=16, num_tables=8, k=500
            ).collect()
        }
        planted = {(i, i + 100000) for i in (r["vec_id"] for r in emb.collect())}
        found = planted & set(pairs)
        recall = len(found) / len(planted)
        assert recall >= 0.95, f"near-dup recall {recall}"
        assert all(pairs[p] > 0.99 for p in found)


class TestPCADistributed:
    """pca_coords_distributed: the O(n*k)-driver scale path must reproduce
    the exact Gram-eigh coordinates (same contract, same sign convention)."""

    def test_matches_exact_operator_on_fixture(self, spark, mp_votes, void_votes):
        from pspcz_analyzer_spark.operators.similarity import pca_coords_distributed

        exact = {r["id_poslanec"]: (r["x"], r["y"]) for r in pca_coords(mp_votes, void_votes).collect()}
        dist = {
            r["id_poslanec"]: (r["x"], r["y"])
            for r in pca_coords_distributed(mp_votes, void_votes).collect()
        }
        assert set(dist) == set(exact)
        for p in exact:
            # n=6 <= k+oversample: the subspace spans everything -> exact
            # up to the shared sign convention and 6-decimal rounding.
            assert abs(dist[p][0]) == pytest.approx(abs(exact[p][0]), abs=1e-4)
            assert abs(dist[p][1]) == pytest.approx(abs(exact[p][1]), abs=1e-4)

    def test_matches_numpy_when_subspace_smaller_than_n(self, spark, void_votes):
        """40 MPs x 60 votes with planted 2-block structure + noise: the
        randomized m=8 subspace must still recover the exact top-2
        coordinates (spectral decay is what makes vote matrices PCA-able)."""
        import random

        import numpy as np

        from pspcz_analyzer_spark.operators.similarity import (
            pca_coords_distributed,
            vote_entries,
        )

        rng = random.Random(7)
        rows = []
        for p in range(1, 41):
            # TWO planted factors with distinct strengths (30 vs 20 votes)
            # so lambda1 > lambda2 >> noise tail: a gapless PC2 would be
            # genuinely non-identifiable for ANY method, randomized or not.
            bloc = 1 if p <= 20 else -1  # factor 1: left/right split
            wing = 1 if p % 2 == 0 else -1  # factor 2: cross-cutting split
            for vid in range(1, 61):
                sign = bloc if vid <= 30 else (wing if vid <= 50 else 0)
                if rng.random() < 0.03:  # sparse defection noise
                    sign = -sign
                res = {1: "A", -1: "B", 0: "C"}[sign]
                rows.append((p, vid, res))
        mp_votes = spark.createDataFrame(
            rows, "id_poslanec long, id_hlasovani long, vysledek string"
        )

        entries = vote_entries(mp_votes, void_votes).collect()
        ids = sorted({r["id_poslanec"] for r in entries})
        votes = sorted({r["id_hlasovani"] for r in entries})
        X = np.zeros((len(ids), len(votes)))
        for r in entries:
            X[ids.index(r["id_poslanec"]), votes.index(r["id_hlasovani"])] = r["v"]
        Xc = X - X.mean(axis=0)
        U, S, _ = np.linalg.svd(Xc, full_matrices=False)
        want = np.abs(U[:, :2] * S[:2])

        got_rows = {
            r["id_poslanec"]: (r["x"], r["y"])
            for r in pca_coords_distributed(
                mp_votes, void_votes, power_iters=3
            ).collect()
        }
        got = np.abs(np.array([got_rows[p] for p in ids]))
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-3)

    def test_all_zero_rows_keep_centering_term(self, spark, void_votes):
        """An MP who only ever abstains (all-zero X row) is NOT at the
        origin after centering — the distributed path must carry the
        -mu^T w term for rows absent from the sparse entries."""
        from pspcz_analyzer_spark.operators.similarity import pca_coords_distributed

        rows = []
        for vid in range(1, 6):
            rows += [(1, vid, "A"), (2, vid, "A"), (3, vid, "C")]
        mp_votes = spark.createDataFrame(
            rows, "id_poslanec long, id_hlasovani long, vysledek string"
        )
        exact = {r["id_poslanec"]: r["x"] for r in pca_coords(mp_votes, void_votes).collect()}
        dist = {
            r["id_poslanec"]: r["x"]
            for r in pca_coords_distributed(mp_votes, void_votes).collect()
        }
        assert set(dist) == {1, 2, 3}
        for p in exact:
            assert abs(dist[p]) == pytest.approx(abs(exact[p]), abs=1e-4)
        assert abs(dist[3]) > 0.1  # the abstainer sits away from the origin


class TestIVFIndex:
    """Persisted IVF index: build/query parity with brute force, partition
    pruning at the storage layer, and retrain-free extension."""

    def _build(self, spark, tmp_path, n=200, dim=8, cells=4):
        import random

        from pspcz_analyzer_spark.operators.ann import build_ivf_index

        rng = random.Random(5)
        rows = [
            (i, [rng.gauss(i % cells, 0.3) for _ in range(dim)]) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        idx = str(tmp_path / "ivf")
        build_ivf_index(spark, df, idx, n_centroids=cells)
        return df, idx

    def test_exhaustive_probe_equals_brute_force(self, spark, tmp_path):
        from pspcz_analyzer_spark.operators.ann import (
            brute_force_topk,
            ivf_index_topk,
        )

        df, idx = self._build(spark, tmp_path)
        q = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
        got = [
            (r.vec_id, r.cosine_sim)
            for r in ivf_index_topk(spark, idx, [float(x) for x in q], k=10, n_probe=4).collect()
        ]
        want = [
            (r.vec_id, r.cosine_sim)
            for r in brute_force_topk(df, [float(x) for x in q], k=10).collect()
        ]
        assert got == want

    def test_query_scan_is_partition_pruned(self, spark, tmp_path):
        from pspcz_analyzer_spark.operators.ann import ivf_index_topk

        df, idx = self._build(spark, tmp_path)
        q = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
        out = ivf_index_topk(spark, idx, [float(x) for x in q], k=5, n_probe=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # The cell isin() lands as a PartitionFilter on the scan — files in
        # other cell directories are never opened.
        assert "PartitionFilters" in plan and "cell" in plan
        assert out.count() == 5

    def test_extend_assigns_without_retrain_and_is_queryable(self, spark, tmp_path):
        import os

        from pspcz_analyzer_spark.operators.ann import (
            extend_ivf_index,
            ivf_index_topk,
        )

        df, idx = self._build(spark, tmp_path)
        # A new vector identical to vec 3: must land in 3's cell and come
        # back as the top hit for its own query.
        base = df.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
        new = spark.createDataFrame(
            [(999, [float(x) for x in base])], "vec_id long, embedding array<float>"
        )
        extend_ivf_index(spark, new, idx)
        vecs = spark.read.parquet(os.path.join(idx, "vectors"))
        cell_of = {
            r.vec_id: r.cell
            for r in vecs.filter(F.col("vec_id").isin(3, 999)).collect()
        }
        assert cell_of[999] == cell_of[3]
        top = ivf_index_topk(spark, idx, [float(x) for x in base], k=2, n_probe=4).collect()
        assert {r.vec_id for r in top} == {3, 999}


class TestEmbeddingDecontaminate:
    def test_drops_close_keeps_far_and_self(self, spark):
        from pspcz_analyzer_spark.operators.ann import embedding_decontaminate

        corpus = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),       # identical to eval -> dropped
                (2, [0.99, 0.14]),     # cosine ~0.990 -> dropped at 0.95
                (3, [0.0, 1.0]),       # orthogonal -> kept
                (4, [-1.0, 0.0]),      # opposite -> kept
                (5, [0.5, 0.866]),     # cosine 0.5 -> kept
            ],
            "vec_id long, embedding array<float>",
        )
        ev = spark.createDataFrame(
            [(100, [2.0, 0.0])], "vec_id long, embedding array<float>"
        )
        kept = sorted(
            r.vec_id
            for r in embedding_decontaminate(corpus, ev, threshold=0.95).collect()
        )
        assert kept == [3, 4, 5]

    def test_empty_eval_keeps_everything(self, spark):
        from pspcz_analyzer_spark.operators.ann import embedding_decontaminate

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        ev = corpus.filter("vec_id < 0")
        assert embedding_decontaminate(corpus, ev).count() == 2


class TestMatryoshka:
    def test_truncate_and_renormalize(self, spark):
        import math

        from pspcz_analyzer_spark.operators.ann import matryoshka_truncate

        df = spark.createDataFrame(
            [(1, [3.0, 4.0, 100.0, -7.0]), (2, [0.0, 0.0, 9.0, 9.0])],
            "vec_id long, embedding array<double>",
        )
        out = {
            r["vec_id"]: r["embedding"]
            for r in matryoshka_truncate(df, dim=2).collect()
        }
        # (3,4) -> unit vector (0.6, 0.8); zero prefix stays zero.
        assert out[1] == pytest.approx([0.6, 0.8])
        assert out[2] == [0.0, 0.0]
        # Renormalized prefixes preserve prefix-cosine exactly.
        a = [3.0, 4.0]
        got = out[1]
        cos = sum(x * y for x, y in zip(a, got)) / (
            math.hypot(*a) * math.hypot(*got)
        )
        assert cos == pytest.approx(1.0)

    def test_no_renorm_is_plain_slice(self, spark):
        from pspcz_analyzer_spark.operators.ann import matryoshka_truncate

        df = spark.createDataFrame(
            [(1, [3.0, 4.0, 5.0])], "vec_id long, embedding array<double>"
        )
        [r] = matryoshka_truncate(df, dim=2, renormalize=False).collect()
        assert r["embedding"] == [3.0, 4.0]


class TestHardNegativeMine:
    """hard_negative_mine vs a NumPy brute force on random vectors."""

    def test_matches_numpy_brute_force(self, spark):
        import numpy as np

        from pspcz_analyzer_spark.operators.ann import hard_negative_mine

        rng = np.random.default_rng(3)
        n, d, k_neg = 40, 8, 3
        vecs = rng.normal(size=(n, d))
        labels = rng.integers(0, 4, size=n)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)],
            "vec_id long, embedding array<double>, label int",
        )
        got = {}
        for r in hard_negative_mine(emb, k_neg=k_neg).collect():
            got.setdefault(r["anchor_id"], {}).setdefault(r["role"], []).append(
                (r["rank"], r["pair_id"], r["cosine_sim"])
            )
        norms = np.linalg.norm(vecs, axis=1)
        sims = (vecs @ vecs.T) / np.outer(norms, norms)
        for a in range(n):
            same = [
                (-sims[a, b], b) for b in range(n) if b != a and labels[b] == labels[a]
            ]
            diff = [
                (-sims[a, b], b) for b in range(n) if b != a and labels[b] != labels[a]
            ]
            if same:
                pos = sorted(same)[0]
                assert got[a]["positive"] == [
                    (1, pos[1], round(-pos[0], 6))
                ]
            else:
                assert "positive" not in got.get(a, {})
            want_negs = [
                (r + 1, b, round(-s, 6))
                for r, (s, b) in enumerate(sorted(diff)[:k_neg])
            ]
            assert sorted(got[a]["negative"]) == want_negs

    def test_anchor_without_same_label_partner_has_no_positive(self, spark):
        from pspcz_analyzer_spark.operators.ann import hard_negative_mine

        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),  # lone label-0 vector
                (1, [0.0, 1.0], 1),
                (2, [0.5, 0.5], 1),
            ],
            "vec_id long, embedding array<double>, label int",
        )
        rows = hard_negative_mine(emb, k_neg=5).collect()
        roles0 = {r["role"] for r in rows if r["anchor_id"] == 0}
        assert roles0 == {"negative"}
        roles1 = {r["role"] for r in rows if r["anchor_id"] == 1}
        assert roles1 == {"positive", "negative"}


class TestIVFPQ:
    """IVF-PQ: residual product quantization + ADC shortlist + exact
    rerank. Exhaustive probe/rerank must recover brute force exactly;
    the approximate path gets a recall bound on blobby data; codes are
    the compact artifact (m_sub ints per vector)."""

    def _build(self, spark, tmp_path, n=240, dim=16, cells=4, **kw):
        import random

        from pspcz_analyzer_spark.operators.ann import build_ivfpq_index

        rng = random.Random(9)
        rows = [
            (i, [rng.gauss(i % cells, 0.3) for _ in range(dim)])
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        idx = str(tmp_path / "ivfpq")
        build_ivfpq_index(
            spark, df, idx, n_centroids=cells, m_sub=4, k_codes=8, **kw
        )
        return df, idx

    def test_exhaustive_equals_brute_force(self, spark, tmp_path):
        from pspcz_analyzer_spark.operators.ann import brute_force_topk, ivfpq_topk

        df, idx = self._build(spark, tmp_path)
        q = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
        got = [
            (r.vec_id, r.cosine_sim)
            for r in ivfpq_topk(
                spark, idx, [float(x) for x in q], k=10, n_probe=4, rerank=10**6
            ).collect()
        ]
        want = [
            (r.vec_id, r.cosine_sim)
            for r in brute_force_topk(df, [float(x) for x in q], k=10).collect()
        ]
        assert got == want

    def test_approximate_recall_on_blobs(self, spark, tmp_path):
        from pspcz_analyzer_spark.operators.ann import brute_force_topk, ivfpq_topk

        df, idx = self._build(spark, tmp_path)
        q = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
        approx = {
            r.vec_id
            for r in ivfpq_topk(
                spark, idx, [float(x) for x in q], k=10, n_probe=2, rerank=40
            ).collect()
        }
        exact = {
            r.vec_id
            for r in brute_force_topk(df, [float(x) for x in q], k=10).collect()
        }
        assert len(approx & exact) >= 7  # blobby data: high recall expected

    def test_codes_are_compact_and_deterministic(self, spark, tmp_path):
        import os as _os

        df, idx = self._build(spark, tmp_path)
        codes = spark.read.parquet(_os.path.join(idx, "codes"))
        rows = codes.orderBy("vec_id").collect()
        assert len(rows) == 240
        assert all(len(r["codes"]) == 4 for r in rows)
        assert all(0 <= c < 8 for r in rows for c in r["codes"])
        # Deterministic rebuild: same data -> same codes.
        df2, idx2 = self._build(spark, tmp_path / "again")
        rows2 = spark.read.parquet(_os.path.join(idx2, "codes")).orderBy("vec_id").collect()
        assert [r["codes"] for r in rows] == [r["codes"] for r in rows2]

    def test_prefix_dim_composes_with_matryoshka(self, spark, tmp_path):
        from pspcz_analyzer_spark.operators.ann import brute_force_topk, ivfpq_topk

        df, idx = self._build(spark, tmp_path, prefix_dim=8)
        q = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
        # Exhaustive rerank on FULL vectors is exact even when the coarse
        # quantizer and codebooks only ever saw the 8-dim prefix.
        got = [
            (r.vec_id, r.cosine_sim)
            for r in ivfpq_topk(
                spark, idx, [float(x) for x in q], k=10, n_probe=4,
                rerank=10**6, prefix_dim=8,
            ).collect()
        ]
        want = [
            (r.vec_id, r.cosine_sim)
            for r in brute_force_topk(df, [float(x) for x in q], k=10).collect()
        ]
        assert got == want

    def test_lloyd_handles_tiny_and_empty(self):
        import numpy as np

        from pspcz_analyzer_spark.operators.ann import _lloyd

        X = np.array([[0.0, 0.0], [10.0, 10.0]])
        C = _lloyd(X, 4, seed=1)
        assert C.shape == (4, 2)
        assert _lloyd(np.zeros((0, 2)), 4).shape[0] == 4


class TestKnnGraph:
    @staticmethod
    def _vecs(spark, n=12, dim=6, seed=3):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3)
            for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cell int"
        )

    @staticmethod
    def _brute(rows, k):
        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(
                d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))),
                6,
            )

        want = {}
        for i, vi, _ in rows:
            nb = sorted(
                ((cos(vi, vj), j) for j, vj, _ in rows if j != i),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            want[i] = [(j, c, r + 1) for r, (c, j) in enumerate(nb)]
        return want

    def test_exact_matches_brute_force(self, spark):
        from pspcz_analyzer_spark.operators.ann import knn_graph

        rows, df = self._vecs(spark)
        got = {}
        for r in knn_graph(df, k=3).collect():
            got.setdefault(r["src"], []).append(
                (r["dst"], r["cosine_sim"], r["rank"])
            )
        for s in got:
            got[s].sort(key=lambda t: t[2])
        # float32 storage can nudge the 7th decimal; neighbor ORDER is the
        # contract checked here (sims verified by the query's SQL oracle).
        want = self._brute(rows, 3)
        assert set(got) == set(want)
        for s in got:
            assert [d for d, _, _ in got[s]] == [d for d, _, _ in want[s]], s

    def test_blocked_restricts_to_cells(self, spark):
        from pspcz_analyzer_spark.operators.ann import knn_graph

        rows, df = self._vecs(spark)
        got = knn_graph(df, k=5, block_col="cell").collect()
        cell_of = {i: c for i, _, c in rows}
        assert got, "blocked knn graph returned no edges"
        for r in got:
            assert cell_of[r["src"]] == cell_of[r["dst"]]
        # Within a block the ranking still matches brute force over the block.
        blocks = {}
        for i, v, c in rows:
            blocks.setdefault(c, []).append((i, v, c))
        for c, members in blocks.items():
            want = self._brute(members, 5)
            got_c = {}
            for r in got:
                if cell_of[r["src"]] == c:
                    got_c.setdefault(r["src"], []).append((r["rank"], r["dst"]))
            for s, lst in got_c.items():
                lst.sort()
                assert [d for _, d in lst] == [d for d, _, _ in want[s]][: len(lst)]


class TestIVFPQExtend:
    """extend_ivfpq_index: retrain-free append (the PQ twin of
    extend_ivf_index). Frozen centroids/codebooks, per-batch cost flat,
    and the extended index must encode new vectors exactly as the build
    pass would have under the same codebooks."""

    def _mk(self, spark, tmp_path, n=240, dim=16, cells=4):
        import random

        from pspcz_analyzer_spark.operators.ann import build_ivfpq_index

        rng = random.Random(9)
        rows = [
            (i, [rng.gauss(i % cells, 0.3) for _ in range(dim)])
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        idx = str(tmp_path / "ivfpq_ext")
        build_ivfpq_index(
            spark, df, idx, n_centroids=cells, m_sub=4, k_codes=8
        )
        return df, idx, rng, dim, cells

    def test_extend_appends_without_touching_model(self, spark, tmp_path):
        import os

        from pspcz_analyzer_spark.operators.ann import extend_ivfpq_index

        df, idx, rng, dim, cells = self._mk(spark, tmp_path)
        cents0 = sorted(
            map(tuple, spark.read.parquet(os.path.join(idx, "centroids"))
                .select("cell").collect())
        )
        cbs0 = spark.read.parquet(os.path.join(idx, "codebooks")).count()
        batch = spark.createDataFrame(
            [
                (1000 + i, [rng.gauss(i % cells, 0.3) for _ in range(dim)])
                for i in range(40)
            ],
            "vec_id long, embedding array<float>",
        )
        extend_ivfpq_index(spark, batch, idx)
        # model frozen
        assert sorted(
            map(tuple, spark.read.parquet(os.path.join(idx, "centroids"))
                .select("cell").collect())
        ) == cents0
        assert spark.read.parquet(os.path.join(idx, "codebooks")).count() == cbs0
        # both stores grew by the batch
        assert spark.read.parquet(os.path.join(idx, "vectors")).count() == 280
        assert spark.read.parquet(os.path.join(idx, "codes")).count() == 280

    def test_extended_codes_match_independent_encode(self, spark, tmp_path):
        """Oracle: numpy re-derivation of (cell, codes) for each appended
        vector from the STORED centroids/codebooks must equal what the
        extension wrote — the encode path is the build path."""
        import os

        import numpy as np

        from pspcz_analyzer_spark.operators.ann import extend_ivfpq_index

        df, idx, rng, dim, cells = self._mk(spark, tmp_path)
        batch_rows = [
            (2000 + i, [rng.gauss(i % cells, 0.3) for _ in range(dim)])
            for i in range(20)
        ]
        batch = spark.createDataFrame(
            batch_rows, "vec_id long, embedding array<float>"
        )
        extend_ivfpq_index(spark, batch, idx)
        cents = {
            r["cell"]: np.asarray(r["centroid"])
            for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
        }
        cbs = spark.read.parquet(os.path.join(idx, "codebooks")).collect()
        m_sub = 1 + max(r["m"] for r in cbs)
        sub_d = dim // m_sub
        stored = {
            r["vec_id"]: (r["cell"], list(r["codes"]))
            for r in spark.read.parquet(os.path.join(idx, "codes"))
            .filter(F.col("vec_id") >= 2000)
            .collect()
        }
        assert len(stored) == 20
        for vid, vec in batch_rows:
            v = np.asarray([float(x) for x in vec])
            cell = min(
                cents, key=lambda c: (float(np.sum((v - cents[c]) ** 2)), c)
            )
            res = v - cents[cell]
            codes = []
            for m in range(m_sub):
                s = res[m * sub_d : (m + 1) * sub_d]
                best = min(
                    (r for r in cbs if r["m"] == m),
                    key=lambda r: (
                        float(np.sum((s - np.asarray(r["cb"])) ** 2)),
                        r["code"],
                    ),
                )
                codes.append(best["code"])
            got_cell, got_codes = stored[vid]
            # float32 storage of the batch vector: re-derive from the
            # float32-rounded values like the engine reads them
            assert (got_cell, got_codes) == (cell, codes), vid

    def test_extended_index_finds_planted_duplicate(self, spark, tmp_path):
        """The ADC path must rank an appended exact query-duplicate at
        the top even with a small rerank budget — codes, not luck."""
        from pspcz_analyzer_spark.operators.ann import extend_ivfpq_index, ivfpq_topk

        df, idx, rng, dim, cells = self._mk(spark, tmp_path)
        q = [float(x) for x in
             df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
        batch = spark.createDataFrame(
            [(5000, q)], "vec_id long, embedding array<float>"
        )
        extend_ivfpq_index(spark, batch, idx)
        top = ivfpq_topk(spark, idx, q, k=3, n_probe=2, rerank=10).collect()
        assert {r["vec_id"] for r in top} >= {7, 5000}
        assert all(abs(r["cosine_sim"] - 1.0) < 1e-6
                   for r in top if r["vec_id"] in (7, 5000))


class TestPcaGramGuard:
    """r9: the Gram trick is n-bound by design (dense n^2 driver matrix
    + O(n^3) eigh) — sample counts that scale with the corpus must be
    refused with a pointer to the distributed twin, not melt the
    driver."""

    def test_refuses_above_max_n(self, spark, void_votes, monkeypatch):
        import pspcz_analyzer_spark.operators.similarity as S

        monkeypatch.setattr(S, "PCA_GRAM_MAX_N", 3)
        rows = []
        for vid in range(1, 4):
            rows += [(mp, vid, "A") for mp in range(1, 5)]  # 4 MPs > 3
        mp_votes = spark.createDataFrame(
            rows, "id_poslanec long, id_hlasovani long, vysledek string"
        )
        with pytest.raises(ValueError, match="pca_coords_distributed"):
            S.pca_coords(mp_votes, void_votes)
        # the distributed twin takes the same input fine
        got = S.pca_coords_distributed(mp_votes, void_votes)
        assert got.count() == 4
