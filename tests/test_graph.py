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


def test_cross_order_edges_deterministic(spark):
    # Same graph, edges listed in either direction -> identical labels.
    a = _components(spark, [(3, 1), (2, 3)])
    b = _components(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}
