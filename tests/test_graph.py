"""Connected-components operator: multi-hop convergence, singletons,
determinism — the shapes the near-dup cluster gate query can't isolate
(its planted graph is diameter-1 pairs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.operators.graph import cluster_pairs, connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in got}


def test_chain_converges_to_min(spark):
    # 0-1-2-3-4-5: diameter 5 forces several propagation rounds.
    comp = _components(spark, [(i, i + 1) for i in range(5)])
    assert comp == {i: 0 for i in range(6)}


def test_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (20, 21), (20, 22), (20, 23)]
    comp = _components(spark, edges)
    assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_isolated_nodes_are_singletons(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (2,), (9,)], "node long")
    got = {
        r["node"]: (r["component"], r["component_size"])
        for r in cluster_pairs(
            edges, id_a="src", id_b="dst", nodes=nodes
        ).collect()
    }
    assert got == {0: (0, 1), 1: (1, 2), 2: (1, 2), 9: (9, 1)}


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs (sparse, dense, with self-loops) vs a
    pure-Python union-find reference — the iterative propagation must
    reach the exact same partition regardless of shape."""
    import random

    for seed, n, m in ((1, 60, 20), (2, 60, 90), (3, 40, 200)):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]  # self-loops allowed; duplicates allowed

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # Min-id canonical labels (path-compress to the root, root is min
        # because unions always attach the larger root under the smaller).
        want = {x: find(x) for x in range(n)}

        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, nodes=nodes).collect()
        }
        assert got == want, f"seed={seed}"


def test_cross_order_edges_deterministic(spark):
    # Same graph, edges listed in either direction -> identical labels.
    a = _components(spark, [(3, 1), (2, 3)])
    b = _components(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_nonconvergence_raises_not_partial(spark):
    """A chain deeper than max_iter must RAISE — partial labels look valid
    (every node gets one) but silently split true components."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    # The same graph with enough rounds converges to one component.
    got = connected_components(edges, max_iter=25).collect()
    assert {r["component"] for r in got} == {0}


class TestPageRank:
    """Fixed-iteration PageRank vs a NumPy power-iteration twin, including
    dangling-mass redistribution and mass conservation."""

    @staticmethod
    def _numpy_pagerank(edges, damping=0.85, n_iter=10):
        import numpy as np

        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        out = {}
        for a, b in set(edges):
            out.setdefault(a, []).append(b)
        r = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            nxt = np.full(n, (1.0 - damping) / n)
            dangling = sum(r[idx[v]] for v in nodes if v not in out)
            nxt += damping * dangling / n
            for a, targets in out.items():
                share = r[idx[a]] / len(targets)
                for b in targets:
                    nxt[idx[b]] += damping * share
            r = nxt
        return {v: r[idx[v]] for v in nodes}

    def test_matches_numpy_with_dangling_nodes(self, spark):
        from pspcz_analyzer_spark.operators.graph import pagerank

        # C->A makes a cycle; D is dangling (in-edges only).
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (0, 3), (4, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
        want = self._numpy_pagerank(edges)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-7, v
        # Mass conservation: ranks sum to 1.
        assert abs(sum(got.values()) - 1.0) < 1e-6
        # The cycle hub (node 0) outranks the pure sink (node 3).
        assert got[0] > got[3]

    def test_duplicate_edges_collapse(self, spark):
        from pspcz_analyzer_spark.operators.graph import pagerank

        df1 = spark.createDataFrame([(0, 1), (0, 1), (1, 0)], "src long, dst long")
        df2 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        r1 = {r["node"]: r["rank"] for r in pagerank(df1, n_iter=5).collect()}
        r2 = {r["node"]: r["rank"] for r in pagerank(df2, n_iter=5).collect()}
        assert r1 == r2


class TestTriangleCount:
    def _brute(self, edges):
        import itertools

        adj = {}
        for s, t in edges:
            if s == t:
                continue
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        counts = {n: 0 for n in adj}
        for a, b, c in itertools.combinations(sorted(adj), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for n in (a, b, c):
                    counts[n] += 1
        return {n: c for n, c in counts.items() if c}

    def test_matches_brute_force_both_orderings(self, spark):
        import random

        from pspcz_analyzer_spark.operators.graph import triangle_count

        rng = random.Random(3)
        edges = list({
            (rng.randrange(30), rng.randrange(30)) for _ in range(150)
        })
        df = spark.createDataFrame(edges, "src long, dst long")
        want = self._brute(edges)
        for ordered in (True, False):
            got = {
                r["node"]: r["n_triangles"]
                for r in triangle_count(df, degree_ordered=ordered).collect()
            }
            assert got == want, f"degree_ordered={ordered}"

    def test_hub_graph_and_duplicates(self, spark):
        from pspcz_analyzer_spark.operators.graph import triangle_count

        # Star + one rim edge = exactly one triangle; duplicate and
        # reversed edges must not double-count; self-loops ignored.
        edges = [(0, i) for i in range(1, 8)] + [(1, 2), (2, 1), (0, 1), (5, 5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_count(df).collect()
        }
        assert got == {0: 1, 1: 1, 2: 1}

    def test_triangle_free_graph_is_empty(self, spark):
        from pspcz_analyzer_spark.operators.graph import triangle_count

        # Bipartite graphs have no triangles.
        edges = [(i, 100 + j) for i in range(5) for j in range(5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert triangle_count(df).count() == 0


class TestShortestHops:
    @staticmethod
    def _brute(edges, seeds, k, directed=False):
        from collections import deque

        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            if not directed:
                adj.setdefault(b, set()).add(a)
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            if dist[u] >= k:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    def test_matches_bfs_on_random_graphs(self, spark):
        import random

        from pspcz_analyzer_spark.operators.graph import shortest_hops

        rng = random.Random(20260814)
        for trial in range(4):
            n = rng.randint(8, 40)
            edges = list({
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(n, 3 * n))
            })
            seeds = rng.sample(range(n), rng.randint(1, 3))
            k = rng.randint(1, 4)
            e = spark.createDataFrame(edges, "src long, dst long")
            s = spark.createDataFrame([(x,) for x in seeds], "node long")
            got = {
                r["node"]: r["hops"]
                for r in shortest_hops(e, s, n_iter=k).collect()
            }
            assert got == self._brute(edges, seeds, k), (
                f"trial={trial} n={n} seeds={seeds} k={k}"
            )

    def test_directed_chain_horizon(self, spark):
        from pspcz_analyzer_spark.operators.graph import shortest_hops

        # 0 -> 1 -> 2 -> 3; directed BFS from 0 with horizon 2 must not
        # reach 3, and must not walk edges backwards from the seed.
        e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
        s = spark.createDataFrame([(0,)], "node long")
        got = {
            r["node"]: r["hops"]
            for r in shortest_hops(e, s, n_iter=2, directed=True).collect()
        }
        assert got == {0: 0, 1: 1, 2: 2}

    def test_isolated_seed_and_duplicate_edges(self, spark):
        from pspcz_analyzer_spark.operators.graph import shortest_hops

        # Seed 99 has no edges: stays at hop 0. Duplicate/reversed edges
        # collapse; a node reachable two ways keeps the min distance.
        e = spark.createDataFrame(
            [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2)], "src long, dst long"
        )
        s = spark.createDataFrame([(0,), (99,)], "node long")
        got = {
            r["node"]: r["hops"] for r in shortest_hops(e, s, n_iter=3).collect()
        }
        assert got == {0: 0, 99: 0, 1: 1, 2: 1}


class TestPersonalizedPageRank:
    @staticmethod
    def _numpy_ppr(edges, seeds, d=0.85, it=10):
        import numpy as np

        nodes = sorted({a for a, _ in edges} | {b for _, b in edges} | set(seeds))
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        p = np.zeros(n)
        for s in seeds:
            p[idx[s]] = 1.0 / len(seeds)
        out = {}
        for a, b in set(edges):
            out.setdefault(a, set()).add(b)
        r = p.copy()
        for _ in range(it):
            nxt = np.zeros(n)
            dm = 0.0
            for a in nodes:
                if a in out:
                    share = r[idx[a]] / len(out[a])
                    for b in out[a]:
                        nxt[idx[b]] += share
                else:
                    dm += r[idx[a]]
            r = ((1 - d) + d * dm) * p + d * nxt
        return {nodes[i]: r[i] for i in range(n)}

    def test_matches_numpy_and_zero_off_seed_component(self, spark):
        from pspcz_analyzer_spark.operators.graph import personalized_pagerank

        # Two components; seeds only in the first. Node 99 is an isolated
        # dangling seed: its mass restarts onto the seed set every round.
        edges = [(1, 2), (2, 3), (3, 1), (2, 1), (10, 11), (11, 10)]
        seeds = [1, 99]
        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        got = {
            r["node"]: r["rank"]
            for r in personalized_pagerank(e, s, n_iter=10).collect()
        }
        want = self._numpy_ppr(edges, seeds)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k
        # Off-seed component gets exactly zero; mass conserved at 1.
        assert got[10] == 0.0 and got[11] == 0.0
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_empty_seeds_raise(self, spark):
        import pytest as _pytest

        from pspcz_analyzer_spark.operators.graph import personalized_pagerank

        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        s = spark.createDataFrame([], "node long")
        with _pytest.raises(ValueError):
            personalized_pagerank(e, s)


class TestLabelPropagation:
    @staticmethod
    def _brute(edges, it):
        adj = {}
        for a, b in edges:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        labels = {n: n for n in adj}
        for _ in range(it):
            nxt = {}
            for n in labels:
                cnt = {}
                for m in adj[n]:
                    cnt[labels[m]] = cnt.get(labels[m], 0) + 1
                nxt[n] = (
                    min(cnt, key=lambda l: (-cnt[l], l)) if cnt else labels[n]
                )
            labels = nxt
        return labels

    def test_matches_brute_force_on_random_graphs(self, spark):
        import random

        from pspcz_analyzer_spark.operators.graph import label_propagation

        rng = random.Random(41)
        for trial in range(3):
            n = rng.randint(6, 25)
            edges = list({
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(rng.randint(n, 3 * n))
            })
            edges = [e for e in edges if e[0] != e[1]]
            it = rng.randint(1, 4)
            df = spark.createDataFrame(edges, "src long, dst long")
            got = {
                r["node"]: r["label"]
                for r in label_propagation(df, n_iter=it).collect()
            }
            assert got == self._brute(edges, it), f"trial={trial} it={it}"

    def test_two_cliques_with_bridge_find_two_communities(self, spark):
        from itertools import combinations

        from pspcz_analyzer_spark.operators.graph import label_propagation

        edges = (
            list(combinations(range(5), 2))
            + list(combinations(range(10, 15), 2))
            + [(4, 10)]
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, n_iter=4).collect()
        }
        # Each clique converges to one label; the bridge doesn't merge them.
        left = {got[i] for i in range(5)}
        right = {got[i] for i in range(10, 15)}
        assert len(left) == 1 and len(right) == 1 and left != right


class TestKCore:
    def _brute_core(self, edges, k):
        import collections

        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        alive = set(adj)
        while True:
            drop = {
                n for n in alive if sum(1 for m in adj[n] if m in alive) < k
            }
            if not drop:
                break
            alive -= drop
        return {
            n: sum(1 for m in adj[n] if m in alive) for n in alive
        }

    def test_matches_brute_force_on_random_graph(self, spark):
        import random

        from pspcz_analyzer_spark.operators.graph import k_core

        rng = random.Random(7)
        edges = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(40), rng.randrange(40)) for _ in range(180)
                )
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        for k in (2, 3, 5):
            got = {
                r["node"]: r["core_degree"]
                for r in k_core(df, k=k, max_rounds=25).collect()
            }
            assert got == self._brute_core(edges, k)

    def test_cascading_peel_multi_round(self, spark):
        from itertools import combinations

        from pspcz_analyzer_spark.operators.graph import k_core

        # A 4-clique with a pendant chain 3-10-11-12: peeling at k=2
        # removes the chain one node per round (12, then 11, then 10) —
        # a genuine multi-round cascade — and keeps the clique intact.
        edges = list(combinations(range(4), 2)) + [(3, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["core_degree"]
            for r in k_core(df, k=2, max_rounds=8).collect()
        }
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_empty_core_and_round_exhaustion(self, spark):
        import pytest

        from pspcz_analyzer_spark.operators.graph import k_core

        # A path of 6 nodes has no 2-core: it peels from both ends in
        # ceil(6/2) = 3 synchronous rounds to empty.
        path = [(i, i + 1) for i in range(5)]
        df = spark.createDataFrame(path, "src long, dst long")
        assert k_core(df, k=2, max_rounds=8).count() == 0
        # A long chain still peeling past max_rounds raises rather than
        # silently returning a supergraph of the core.
        long_path = [(i, i + 1) for i in range(30)]
        df2 = spark.createDataFrame(long_path, "src long, dst long")
        with pytest.raises(RuntimeError, match="did not stabilize"):
            k_core(df2, k=2, max_rounds=3)


class TestHits:
    def test_matches_numpy_power_iteration(self, spark):
        import numpy as np

        from pspcz_analyzer_spark.operators.graph import hits

        edges = [(0, 10), (0, 11), (1, 10), (2, 11), (2, 12), (3, 12)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, n_iter=10).collect()
        }
        nodes = sorted({n for e in edges for n in e})
        idx = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in edges:
            A[idx[s], idx[d]] = 1.0
        h = np.ones(len(nodes))
        for _ in range(10):
            a = A.T @ h
            a /= a.sum()
            h = A @ a
            h /= h.sum()
        for n in nodes:
            assert abs(got[n][0] - h[idx[n]]) < 1e-9
            assert abs(got[n][1] - a[idx[n]]) < 1e-9

    def test_bipartite_roles(self, spark):
        from pspcz_analyzer_spark.operators.graph import hits

        # Pure bipartite: sources have authority 0, sinks have hub 0;
        # the doubly-linked sink is the stronger authority.
        edges = [(0, 10), (1, 10), (2, 11)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, n_iter=5).collect()
        }
        assert all(got[n][1] == 0.0 for n in (0, 1, 2))
        assert all(got[n][0] == 0.0 for n in (10, 11))
        assert got[10][1] > got[11][1]
        # Each L1-normalized vector sums to 1.
        assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-9
        assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-9


class TestAdamicAdar:
    def test_matches_brute_force(self, spark):
        import math
        from itertools import combinations

        from pspcz_analyzer_spark.operators.graph import adamic_adar_pairs

        edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (1, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            (r.n1, r.n2): (r.common_neighbors, r.aa_score)
            for r in adamic_adar_pairs(df, k=100).collect()
        }
        nbrs: dict = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        want = {}
        for u, v in combinations(sorted(nbrs), 2):
            if v in nbrs[u]:
                continue
            common = nbrs[u] & nbrs[v]
            if common:
                want[(u, v)] = (
                    len(common),
                    round(sum(1 / math.log(len(nbrs[w])) for w in common), 6),
                )
        assert got == want

    def test_existing_edges_never_predicted_and_k_respected(self, spark):
        from pspcz_analyzer_spark.operators.graph import adamic_adar_pairs

        # Star graph: hub 0 adjacent to all; every leaf pair is
        # non-adjacent with exactly one common neighbor (the hub).
        edges = [(0, i) for i in range(1, 8)]
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = adamic_adar_pairs(df, k=5).collect()
        assert len(rows) == 5
        assert all(r.n1 != 0 and r.n2 != 0 for r in rows)
        assert all(r.common_neighbors == 1 for r in rows)

    def test_max_degree_excludes_hub_neighbors(self, spark):
        from pspcz_analyzer_spark.operators.graph import adamic_adar_pairs

        # Hub 0 connects 1..5; additionally 1-9-2 path. With the hub
        # capped out (deg 5 > 3) the leaf pairs (i,j) in 1..5 lose their
        # only common neighbor and disappear; what remains is (1,2)
        # through w=9 (deg 2) and (0,9) through w=1 and w=2 (deg 3 each,
        # inside the cap).
        edges = [(0, i) for i in range(1, 6)] + [(1, 9), (2, 9)]
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = {
            (r.n1, r.n2): r.common_neighbors
            for r in adamic_adar_pairs(df, k=100, max_degree=3).collect()
        }
        assert rows == {(1, 2): 1, (0, 9): 2}


class TestWeightedPagerank:
    def test_mass_conserved_and_weights_shift_rank(self, spark):
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.operators.graph import pagerank

        # 1 -> 2 (weight 9), 1 -> 3 (weight 1); 2 and 3 both -> 1.
        edges = spark.createDataFrame(
            [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
            "src long, dst long, w double",
        )
        r = {
            row.node: row.rank
            for row in pagerank(edges, n_iter=10, weight_col="w").collect()
        }
        assert abs(sum(r.values()) - 1.0) < 1e-9  # mass conserved
        assert r[2] > r[3]  # the heavy edge carries more rank
        # Unweighted on the same topology treats 2 and 3 identically.
        u = {
            row.node: row.rank
            for row in pagerank(edges, n_iter=10).collect()
        }
        assert abs(u[2] - u[3]) < 1e-12

    def test_duplicate_edges_sum_their_weights(self, spark):
        from pspcz_analyzer_spark.operators.graph import pagerank

        a = spark.createDataFrame(
            [(1, 2, 2.0), (1, 2, 3.0), (1, 3, 5.0), (2, 1, 1.0), (3, 1, 1.0)],
            "src long, dst long, w double",
        )
        b = spark.createDataFrame(
            [(1, 2, 5.0), (1, 3, 5.0), (2, 1, 1.0), (3, 1, 1.0)],
            "src long, dst long, w double",
        )
        ra = {r.node: round(r.rank, 12) for r in pagerank(a, weight_col="w").collect()}
        rb = {r.node: round(r.rank, 12) for r in pagerank(b, weight_col="w").collect()}
        assert ra == rb


class TestClusteringCoefficient:
    def test_matches_brute_force(self, spark):
        import itertools
        import random

        from pspcz_analyzer_spark.operators.graph import clustering_coefficient

        rng = random.Random(11)
        edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["degree"], r["n_triangles"], r["coefficient"])
            for r in clustering_coefficient(df).collect()
        }
        adj: dict = {}
        for s, t in edges:
            if s == t:
                continue
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        for n, nbrs in adj.items():
            d = len(nbrs)
            if d < 2:
                assert n not in got
                continue
            tri = sum(
                1
                for u, v in itertools.combinations(sorted(nbrs), 2)
                if v in adj[u]
            )
            assert got[n] == (d, tri, round(2.0 * tri / (d * (d - 1)), 6)), n

    def test_clique_is_one_star_is_zero(self, spark):
        from pspcz_analyzer_spark.operators.graph import clustering_coefficient

        import itertools

        clique = list(itertools.combinations(range(4), 2))
        star = [(10, i) for i in range(11, 16)]
        df = spark.createDataFrame(clique + star, "src long, dst long")
        got = {
            r["node"]: r["coefficient"]
            for r in clustering_coefficient(df).collect()
        }
        assert all(got[n] == 1.0 for n in range(4))
        assert got[10] == 0.0  # star center: degree 5, zero triangles
        assert all(n not in got for n in range(11, 16))  # leaves: degree 1
