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
