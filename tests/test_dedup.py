"""Dedup-operator tests on a planted-duplicate corpus: exact survivors,
Jaccard values, MinHash-LSH recall against exact Jaccard, SimHash blocking."""

from __future__ import annotations

import pytest

from pspcz_analyzer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, _BASE),
        (2, _BASE),  # exact duplicate of 1
        (3, "  THE   quick brown fox jumps over the lazy dog while the cat watches "
            "from a warm windowsill and the birds sing in the garden outside "),
        # 3 = duplicate of 1 modulo case/whitespace (same normalized text)
        (4, _BASE + " an extra tail sentence appended to make a near duplicate"),
        (5, "completely different content about spark catalyst optimizer internals "
            "and the physics of distributed shuffle exchanges at terabyte scale"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_survivors_min_id(self, corpus):
        ids = sorted(r["doc_id"] for r in exact_dedup(corpus).collect())
        assert ids == [1, 4, 5, 6]  # 2 and 3 collapse into 1

    def test_idempotent(self, corpus):
        once = exact_dedup(corpus)
        assert sorted(r["doc_id"] for r in exact_dedup(once).collect()) == [1, 4, 5, 6]


class TestNgramJaccard:
    def test_exact_dup_scores_one(self, corpus):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
        }
        assert pairs[(1, 2)] == 1.0
        assert pairs[(1, 3)] == 1.0  # normalization-invariant

    def test_near_dup_above_threshold(self, corpus):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(corpus, threshold=0.3).collect()
        }
        assert 0.3 <= pairs[(1, 4)] < 1.0

    def test_unrelated_docs_absent(self, corpus):
        pairs = ngram_jaccard_pairs(corpus, threshold=0.3).collect()
        assert all(5 not in (r["id_a"], r["id_b"]) for r in pairs)


class TestMinHash:
    def test_signature_shape_and_determinism(self, corpus):
        s1 = minhash_signatures(corpus, num_hashes=32).collect()
        s2 = minhash_signatures(corpus, num_hashes=32).collect()
        by_id_1 = {r["doc_id"]: r["signature"] for r in s1}
        by_id_2 = {r["doc_id"]: r["signature"] for r in s2}
        assert by_id_1 == by_id_2  # stable across runs/partitionings
        assert all(len(sig) == 32 for sig in by_id_1.values())

    def test_identical_docs_identical_signatures(self, corpus):
        sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(corpus).collect()}
        assert sigs[1] == sigs[2] == sigs[3]

    def test_independent_hashes(self, corpus):
        """Distinct hash functions must not be affine rehashes of each other:
        two docs' per-hash minima should not agree/disagree in lockstep."""
        sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(corpus, num_hashes=64).collect()}
        agree = [a == b for a, b in zip(sigs[1], sigs[4])]
        # Near-dups agree on some but not all hash positions.
        assert 0 < sum(agree) < 64

    def test_lsh_recall_of_planted_dups(self, corpus):
        cand = {
            (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(corpus).collect()
        }
        assert (1, 2) in cand and (1, 3) in cand and (2, 3) in cand
        assert (1, 4) in cand  # high-Jaccard near-dup caught by banding

    def test_lsh_estimate_tracks_jaccard(self, corpus):
        """Signature agreement fraction ~ true Jaccard for the near-dup pair."""
        sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(corpus, num_hashes=64).collect()}
        est = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 64
        true_j = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(corpus, threshold=0.0).collect()
        }[(1, 4)]
        assert abs(est - true_j) < 0.25


class TestSimHash:
    def test_identical_docs_same_hash(self, corpus):
        sigs = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
        assert sigs[1] == sigs[2] == sigs[3]

    def test_pairs_hamming_zero_for_dups(self, corpus):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(corpus, max_hamming=10).collect()
        }
        assert pairs[(1, 2)] == 0
        assert pairs.get((1, 4), 99) <= 10  # near-dup within radius


class TestSemanticDedup:
    """SemDeDup: cluster-then-prune. The by-label variant is oracle-paired
    in the gate; here the k-means path proves soundness (every removal is
    a real near-dup) and the degenerate single-cluster case recovers the
    exact global removal set."""

    @pytest.fixture(scope="class")
    def vectors(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        # Three tight blobs + planted near-identical pairs inside each.
        centers = rng.normal(size=(3, 8)) * 5
        rows = []
        vid = 0
        for c in centers:
            for _ in range(6):
                rows.append((vid, (c + rng.normal(size=8) * 0.05).tolist()))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return df, rows

    @staticmethod
    def _exact_removed(rows, threshold):
        import numpy as np

        ids = [r[0] for r in rows]
        mat = np.array([r[1] for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        removed = {}
        for i, xid in enumerate(ids):
            dups = [
                ids[j]
                for j in range(len(ids))
                if ids[j] < xid and sims[i, j] >= threshold
            ]
            if dups:
                removed[xid] = min(dups)
        return removed

    def test_single_cluster_matches_brute_force(self, vectors):
        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        df, rows = vectors
        got = {
            r["vec_id"]: r["dup_of"]
            for r in semantic_dedup(df, threshold=0.9, n_clusters=1).collect()
        }
        assert got == self._exact_removed(rows, 0.9)

    def test_kmeans_path_sound_and_deterministic(self, vectors):
        import numpy as np

        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        df, rows = vectors
        vec = {r[0]: np.array(r[1]) for r in rows}
        out1 = semantic_dedup(df, threshold=0.9, n_clusters=3).collect()
        out2 = semantic_dedup(df, threshold=0.9, n_clusters=3).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert out1, "blobs contain near-dups; removal set must be non-empty"
        for r in out1:
            assert r["dup_of"] < r["vec_id"]
            a, b = vec[r["vec_id"]], vec[r["dup_of"]]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos >= 0.9 - 1e-9
            assert abs(r["max_sim"] - cos) < 1e-3 or r["max_sim"] >= cos - 1e-9

    def test_kmeans_recall_on_tight_blobs(self, vectors):
        """With clusters at least as fine as the blobs, every exact
        removal inside a blob is recovered (cells can only split blobs,
        and these blobs are tight enough that k=3 keeps each whole)."""
        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        df, rows = vectors
        got = {
            r["vec_id"]: r["dup_of"]
            for r in semantic_dedup(df, threshold=0.9, n_clusters=3).collect()
        }
        assert got == self._exact_removed(rows, 0.9)

    def test_farthest_rule_matches_brute_force(self, spark, vectors):
        """keep='farthest' (the paper's rule): x is removed iff some
        qualifying neighbour has strictly lower rounded centroid-cosine
        (ties by id). Brute-force NumPy twin over a deterministic label
        clustering."""
        import numpy as np
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        df, rows = vectors
        labeled = df.withColumn("label", (F.col("vec_id") % 3).cast("int"))
        got = {
            r["vec_id"]: (r["dup_of"], r["centroid_sim"])
            for r in semantic_dedup(
                labeled, cluster_col="label", threshold=0.9, keep="farthest"
            ).collect()
        }

        ids = [r[0] for r in rows]
        mat = np.array([r[1] for r in rows])
        labels = {vid: vid % 3 for vid in ids}
        cents = {
            g: mat[[i for i, v in enumerate(ids) if labels[v] == g]].mean(axis=0)
            for g in (0, 1, 2)
        }

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        csim = {
            vid: round(cos(mat[i], cents[labels[vid]]), 6)
            for i, vid in enumerate(ids)
        }
        want = {}
        for i, xid in enumerate(ids):
            doms = [
                ids[j]
                for j in range(len(ids))
                if ids[j] != xid
                and labels[ids[j]] == labels[xid]
                and cos(mat[i], mat[j]) >= 0.9
                and (
                    csim[ids[j]] < csim[xid]
                    or (csim[ids[j]] == csim[xid] and ids[j] < xid)
                )
            ]
            if doms:
                want[xid] = (min(doms), csim[xid])
        assert set(got) == set(want)
        for vid in want:
            assert got[vid][0] == want[vid][0]
            assert abs(got[vid][1] - want[vid][1]) < 1e-6
        # The rule keeps the farthest member: within every cluster, the
        # minimum-centroid-sim doc is never removed.
        for g in (0, 1, 2):
            grp = [v for v in ids if labels[v] == g]
            keeper = min(grp, key=lambda v: (csim[v], v))
            assert keeper not in got

    def test_bad_keep_rejected(self, vectors):
        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        df, _ = vectors
        with pytest.raises(ValueError, match="keep"):
            semantic_dedup(df, keep="centroid")


class TestDuplicateSpans:
    """ExactSubstr-style cross-doc duplicated windows: stats are
    oracle-paired in the gate (doc_duplicate_spans); here the removal twin
    is checked against a brute-force Python recompute."""

    @pytest.fixture(scope="class")
    def span_corpus(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        rows = [
            (1, f"one unique opening here {shared} and a private tail one"),
            (2, f"two other prefix words {shared} closing differently two"),
            (3, "three entirely distinct tokens nothing shared at all "
                "three more filler words to pass the window length three"),
            (4, "short doc"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _brute(rows, window, min_docs):
        from collections import defaultdict

        toks = {i: t.lower().split() for i, t in rows}
        occ = defaultdict(set)
        for i, t in toks.items():
            for s in range(len(t) - window + 1):
                occ[" ".join(t[s : s + window])].add(i)
        dup = {w for w, docs in occ.items() if len(docs) >= min_docs}
        out = {}
        for i, t in toks.items():
            covered = set()
            for s in range(len(t) - window + 1):
                if " ".join(t[s : s + window]) in dup:
                    covered.update(range(s, s + window))
            kept = [tok for j, tok in enumerate(t) if j not in covered]
            out[i] = (" ".join(kept), len(t) - len(kept))
        return out

    def test_removal_matches_brute_force(self, span_corpus):
        from pspcz_analyzer_spark.operators.dedup import remove_duplicate_spans

        rows = [(r["doc_id"], r["text"]) for r in span_corpus.collect()]
        expect = self._brute(rows, window=4, min_docs=2)
        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(span_corpus, window=4).collect()
        }
        assert got == expect
        # The shared run must actually vanish from both carriers.
        assert "gamma" not in got[1][0] and "gamma" not in got[2][0]
        assert got[3] == (rows[2][1].lower(), 0)  # untouched unique doc
        assert got[4][1] == 0  # sub-window doc passes through

    def test_stats_flag_only_cross_doc(self, span_corpus):
        from pspcz_analyzer_spark.operators.dedup import duplicate_span_stats

        stats = {
            r["doc_id"]: r["n_dup_windows"]
            for r in duplicate_span_stats(span_corpus, window=4).collect()
        }
        assert stats[1] > 0 and stats[2] > 0
        assert stats[3] == 0
        assert 4 not in stats  # shorter than the window: no window rows

    def test_verify_mode_matches_hash_mode_and_brute_force(self, span_corpus):
        """verify=True adds the exact string-confirmation join; with no
        hash collisions (the only case constructible — 2^64 identities)
        it must be output-identical to hash mode and the brute force, for
        both the stats and the removal op."""
        from pspcz_analyzer_spark.operators.dedup import (
            duplicate_span_stats,
            remove_duplicate_spans,
        )

        rows = [(r["doc_id"], r["text"]) for r in span_corpus.collect()]
        expect = self._brute(rows, window=4, min_docs=2)
        got_v = {
            r["doc_id"]: (r["text_clean"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(
                span_corpus, window=4, verify=True
            ).collect()
        }
        assert got_v == expect
        plain = sorted(
            map(tuple, duplicate_span_stats(span_corpus, window=4).collect())
        )
        verified = sorted(
            map(
                tuple,
                duplicate_span_stats(span_corpus, window=4, verify=True).collect(),
            )
        )
        assert plain == verified


class TestSemanticDedupExtend:
    """Incremental SemDeDup vs a stored IVF index: exhaustive probing is
    oracle-anchored in the gate (corpus_extend_semantic); here the
    n_probe=1 production path must still catch near-dups that sit firmly
    inside a cell (tight blobs: each batch copy lands in its history
    twin's cell)."""

    def test_single_probe_catches_in_cell_dups(self, spark, tmp_path):
        import numpy as np

        from pspcz_analyzer_spark.operators.ann import build_ivf_index
        from pspcz_analyzer_spark.operators.dedup import semantic_dedup_extend

        rng = np.random.default_rng(11)
        centers = rng.normal(size=(3, 8)) * 10
        hist_rows = []
        vid = 0
        for c in centers:
            for _ in range(8):
                hist_rows.append((vid, (c + rng.normal(size=8) * 0.05).tolist()))
                vid += 1
        hist = spark.createDataFrame(
            hist_rows, "vec_id long, embedding array<double>"
        )
        idx = str(tmp_path / "semext_idx")
        build_ivf_index(spark, hist, idx, n_centroids=3)

        # Batch: near-copies of history vectors 0/8/16 (one per blob) plus
        # three novel far-away vectors.
        copies = [
            (1000 + i, (np.array(hist_rows[i * 8][1]) + 0.01).tolist())
            for i in range(3)
        ]
        novel = [
            (2000 + i, (rng.normal(size=8) * 10 + 100 * (i + 1)).tolist())
            for i in range(3)
        ]
        batch = spark.createDataFrame(
            copies + novel, "vec_id long, embedding array<double>"
        )
        kept = {
            r["vec_id"]
            for r in semantic_dedup_extend(
                spark, batch, idx, threshold=0.9, n_probe=1
            ).collect()
        }
        assert kept == {2000, 2001, 2002}

    def test_exhaustive_equals_single_probe_here(self, spark, tmp_path):
        """With well-separated blobs the single-probe result already equals
        the exhaustive one (no boundary straddlers in this fixture)."""
        import numpy as np

        from pspcz_analyzer_spark.operators.ann import build_ivf_index
        from pspcz_analyzer_spark.operators.dedup import semantic_dedup_extend

        rng = np.random.default_rng(13)
        hist = spark.createDataFrame(
            [(i, (rng.normal(size=8) + (i % 2) * 50).tolist()) for i in range(12)],
            "vec_id long, embedding array<double>",
        )
        idx = str(tmp_path / "semext_idx2")
        build_ivf_index(spark, hist, idx, n_centroids=2)
        batch = spark.createDataFrame(
            [(100 + i, (rng.normal(size=8) + (i % 2) * 50).tolist()) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        one = {
            r["vec_id"]
            for r in semantic_dedup_extend(
                spark, batch, idx, threshold=0.95, n_probe=1
            ).collect()
        }
        full = {
            r["vec_id"]
            for r in semantic_dedup_extend(
                spark, batch, idx, threshold=0.95, n_probe=2
            ).collect()
        }
        assert one == full


class TestSemanticDedupSalted:
    def test_salted_join_results_identical_on_skewed_cells(self, spark):
        """salt_cells spreads a mega-cluster's self-join across tasks but
        must not change a single output row: every (x, y) pair still
        meets exactly once under the (cluster, salt) key."""
        import numpy as np

        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        rng = np.random.default_rng(11)
        rows = []
        # Deliberate skew: 80% of vectors in one cell, the rest spread.
        for vid in range(120):
            cell = 0 if vid < 96 else 1 + vid % 3
            base = np.zeros(6)
            base[cell % 6] = 5.0
            rows.append(
                (vid, cell, (base + rng.normal(size=6) * 0.4).tolist())
            )
        df = spark.createDataFrame(
            rows, "vec_id long, cell int, embedding array<double>"
        )
        plain = semantic_dedup(
            df, cluster_col="cell", threshold=0.8
        ).orderBy("vec_id")
        salted = semantic_dedup(
            df, cluster_col="cell", threshold=0.8, salt_cells=8
        ).orderBy("vec_id")
        assert plain.columns == salted.columns
        assert plain.collect() == salted.collect()
        assert plain.count() > 0  # the skewed cell actually produced dups

    def test_salted_farthest_rule_identical(self, spark):
        import numpy as np

        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        rng = np.random.default_rng(13)
        rows = [
            (vid, 0, (np.ones(4) + rng.normal(size=4) * 0.1).tolist())
            for vid in range(40)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, cell int, embedding array<double>"
        )
        a = semantic_dedup(
            df, cluster_col="cell", threshold=0.9, keep="farthest"
        ).orderBy("vec_id")
        b = semantic_dedup(
            df, cluster_col="cell", threshold=0.9, keep="farthest", salt_cells=4
        ).orderBy("vec_id")
        assert a.collect() == b.collect()


class TestContamination:
    """Exact-substring eval contamination (GPT-3 app. C shape): planted
    excerpts read contaminated, disjoint text reads clean, and the train
    side drops exactly the span-sharing docs."""

    @pytest.fixture(scope="class")
    def corpora(self, spark):
        train_rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
            (2, "one two three four five six seven eight nine ten eleven twelve"),
            (3, "aa bb cc dd ee ff gg hh ii jj kk ll"),
            (4, "short doc"),  # sub-window: can never be flagged
        ]
        eval_rows = [
            # Verbatim 10-token span of train doc 1 -> fully contaminated.
            (100, "beta gamma delta epsilon zeta eta theta iota kappa lam"),
            # Disjoint vocabulary -> clean.
            (101, "red orange yellow green blue indigo violet cyan magenta white"),
            # First 5 tokens overlap doc 2 but no FULL 10-token window does.
            (102, "one two three four five xx yy zz ww vv"),
        ]
        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        ev = spark.createDataFrame(eval_rows, "eval_id long, text string")
        return train, ev

    def test_stats_flag_planted_overlap_only(self, corpora):
        from pspcz_analyzer_spark.operators.dedup import contamination_stats

        train, ev = corpora
        got = {
            r["eval_id"]: (r["n_windows"], r["n_contaminated"], r["contaminated_frac"])
            for r in contamination_stats(train, ev, window=10).collect()
        }
        assert got[100] == (1, 1, 1.0)
        assert got[101] == (1, 0, 0.0)
        assert got[102] == (1, 0, 0.0)

    def test_decontaminate_drops_span_sharing_train_docs(self, corpora):
        from pspcz_analyzer_spark.operators.dedup import (
            decontaminate_exact_substr,
        )

        train, ev = corpora
        kept = {
            r["doc_id"]
            for r in decontaminate_exact_substr(train, ev, window=10).collect()
        }
        # Doc 1 shares the planted span; 2 and 3 share no full window;
        # 4 is sub-window and survives by construction.
        assert kept == {2, 3, 4}

    def test_window_slides_across_positions(self, spark):
        from pspcz_analyzer_spark.operators.dedup import contamination_stats

        train = spark.createDataFrame(
            [(1, "p q r s t u v w x y z aa bb cc")], "doc_id long, text string"
        )
        # Eval span starts mid-document: window alignment must not matter.
        ev = spark.createDataFrame(
            [(9, "s t u v w x y z aa bb")], "eval_id long, text string"
        )
        [r] = contamination_stats(train, ev, window=10).collect()
        assert (r["n_contaminated"], r["contaminated_frac"]) == (1, 1.0)


class TestContainmentPairs:
    def test_prefix_is_contained_but_not_jaccard_similar(self, spark):
        from pspcz_analyzer_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        words = " ".join(f"w{i}" for i in range(40))
        half = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, words), (2, half), (3, "totally different text here")],
            "doc_id long, text string",
        )
        got = ngram_containment_pairs(df, n=3, threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
        r = got[0]
        # All 18 shingles of the prefix appear in the full doc.
        assert r["containment_b"] == 1.0 and r["containment_a"] < 0.5
        # Jaccard at the same bar misses it: resemblance penalizes size gap.
        assert ngram_jaccard_pairs(df, n=3, threshold=0.9).count() == 0

    def test_matches_brute_force_sets(self, spark):
        import random

        from pspcz_analyzer_spark.operators.dedup import ngram_containment_pairs
        from pspcz_analyzer_spark.functions.text import normalize_text  # noqa: F401

        rng = random.Random(7)
        vocab = [f"t{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25))))
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")

        def shingles(t):
            toks = t.split()
            if len(toks) <= 3:
                return {" ".join(toks)}
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        sets = {d: shingles(t) for d, t in docs}
        want = {}
        for a in sets:
            for b in sets:
                if a < b and sets[a] & sets[b]:
                    inter = len(sets[a] & sets[b])
                    ca, cb = inter / len(sets[a]), inter / len(sets[b])
                    if max(ca, cb) >= 0.5:
                        want[(a, b)] = (inter, round(ca, 6), round(cb, 6))
        got = {
            (r["id_a"], r["id_b"]): (
                r["intersection"], r["containment_a"], r["containment_b"]
            )
            for r in ngram_containment_pairs(df, n=3, threshold=0.5).collect()
        }
        assert got == want


class TestSemanticDedupAutoCells:
    """r9 scale fix: target_cell_size derives k from the corpus size so
    per-cell pair cost stays constant — the fixed-k query measured 66x
    slower on 10x data before this."""

    def test_target_cell_size_scales_k_and_stays_sound(self, spark):
        import numpy as np

        from pspcz_analyzer_spark.operators.dedup import semantic_dedup

        rng = np.random.RandomState(7)
        # 12 well-separated blob centers x 20 points = 240 vectors
        rows = []
        vid = 0
        for b in range(12):
            c = rng.randn(8) * 10
            for _ in range(20):
                rows.append((vid, (c + rng.randn(8) * 0.01).tolist()))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, threshold=0.99, target_cell_size=20)
        got = out.collect()
        # every blob of 20 near-identical vectors collapses to 1 survivor
        assert len(got) == 12 * 19
        for r in got:
            assert r["dup_of"] < r["vec_id"]
        # k derived as ceil(240/20)=12: cluster ids span more than the
        # old fixed default would ever produce for this corpus shape
        n_cells = out.select("cluster").distinct().count()
        assert n_cells >= 6  # k-means may merge some blobs, never to 1

    def test_fit_sample_cap_engages(self, spark, monkeypatch):
        from pyspark.ml.clustering import KMeans

        from pspcz_analyzer_spark.operators import dedup as D

        seen = {}
        orig_fit = KMeans.fit

        def spy(self, train):
            seen["train_rows"] = train.count()
            return orig_fit(self, train)

        monkeypatch.setattr(KMeans, "fit", spy)
        df = spark.range(500).selectExpr(
            "id AS vec_id",
            "array(cast(id % 7 AS double), cast(id % 11 AS double)) AS embedding",
        )
        D.semantic_dedup(
            df, threshold=0.999, target_cell_size=50, fit_sample_cap=100
        )
        # 500 rows, cap 100: the fit trained on a sample, not the corpus
        assert seen["train_rows"] < 250
