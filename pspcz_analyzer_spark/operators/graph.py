"""Connected components over a pair list — near-dup clustering glue.

Dedup operators (``operators/dedup.py``) emit PAIRS (exact-fingerprint,
Jaccard, MinHash-LSH, SimHash); an actual dedup pass needs CLUSTERS —
transitive groups from which one survivor is kept. The reference never
needs this (its corpora fit one process and pairs are consumed directly);
at corpus scale the standard formulation is iterative label propagation
(hash-to-min): every node starts labeled with its own id and repeatedly
takes the min label among itself and its neighbors, converging to
component = min node id reachable.

Scale shape: each iteration is ONE shuffle keyed by node id (edge join +
min-aggregate); iteration count is the graph diameter. Near-dup graphs
are near-cliques (diameter 2-3), so the loop converges in a handful of
rounds — the driver-side loop is over ITERATIONS, never over rows, and
each round's convergence check is a cheap count on the changed-label
frame. For adversarially deep graphs (long chains) the alternating
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") halves effective diameter per round; out of scope
here because shingle/band/bucket edges never produce deep chains.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

from pyspark import StorageLevel

# Node count up to which the per-round rank vector ((long, double) ≈ 16
# bytes/node → ≤ ~64 MB) is broadcast into the edge join instead of
# shuffled — see pagerank()/personalized_pagerank().
RANKS_BROADCAST_MAX = 4_000_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node, component = min reachable id.

    ``edges`` is undirected input (each pair listed once, either order).
    ``nodes`` optionally supplies the full node universe (one ``node_col``
    column) so isolated nodes come out as singleton components — pass the
    corpus id list for dedup so unclustered docs keep themselves.

    Deterministic: min() over ids has no tie-breaking ambiguity, so the
    result is oracle-checkable against a recursive-CTE closure.
    """
    und = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.persist(StorageLevel.MEMORY_AND_DISK)

    labels = und.select(F.col("a").alias("node")).distinct()
    if nodes is not None:
        labels = labels.union(
            nodes.select(F.col(node_col).cast("long").alias("node"))
        ).distinct()
    # localCheckpoint (not persist): each round's frame references the
    # previous one TWICE (neighbor join + label join), so lineage doubles
    # per iteration — plans go exponential and chain-shaped graphs OOM the
    # driver around 10 rounds. Checkpointing materializes the round AND
    # truncates the plan to a leaf, keeping every iteration's plan
    # constant-size. Local (executor-block) checkpoints suffice: the loop
    # re-runs from scratch on executor loss, which is the right recovery
    # trade for an iteration whose state is one row per node. (On an
    # unreliable 1000-executor cluster, swap for reliable checkpoint() to
    # a DFS dir every K rounds.)
    labels = labels.withColumn("label", F.col("node")).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        # Min label among each node's neighbors (one shuffle on node id):
        # edge (a,b) proposes label[a] to b via the rename below.
        proposals = (
            und.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(proposals, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint()  # eager: the round runs exactly once
        )
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated
        if n_changed == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        # Partial labels LOOK valid downstream (every node has one) but
        # split true components — never return them silently. Near-dup
        # graphs converge in 2-3 rounds; hitting this means an unusually
        # deep (chain-shaped) graph: raise max_iter, or switch to a
        # large-star/small-star formulation that halves diameter per round.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (labels still propagating); raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def cluster_pairs(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
) -> DataFrame:
    """Pairs -> (node, component, component_size) — the dedup-facing shape:
    keep ``node == component`` for a min-id survivor policy, or rank inside
    the component by any quality score."""
    from pyspark.sql import Window

    comp = connected_components(
        pairs, src=id_a, dst=id_b, nodes=nodes, node_col=node_col
    )
    w = Window.partitionBy("component")
    return comp.select(
        "node",
        "component",
        F.count(F.lit(1)).over(w).cast("long").alias("component_size"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    node_type: str = "long",
    weight_col: "str | None" = None,
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) over a directed edge
    list — the influence/centrality measure for citation graphs (which
    laws cite which), reference networks, and buyer-supplier graphs.

    ``weight_col`` switches to WEIGHTED PageRank: each node distributes
    its rank proportionally to edge weight instead of uniformly
    (out-"degree" becomes the out-weight sum; duplicate (src, dst) pairs
    sum their weights). The unweighted path is byte-identical to before
    the parameter existed, so every pinned oracle stays valid.

    Semantics: ranks start uniform at 1/N over the node universe
    (distinct src + dst); each iteration every node distributes its rank
    equally over its out-edges, DANGLING nodes (no out-edges) spread
    their mass uniformly over all nodes, and
    ``rank' = (1-d)/N + d * (inflow + dangling_mass/N)``. Total mass
    stays 1 every round (asserted in tests). Fixed ``n_iter`` (not a
    convergence test) keeps the result a pure function of the graph, so
    the DuckDB oracle can replay the exact same 10 unrolled iterations.

    Scale shape (same contract as :func:`connected_components`): each
    iteration is ONE shuffle — edges join ranks on src, contributions
    group by dst; out-degrees are computed once and live in the edge
    frame; the dangling mass is a one-row aggregate broadcast-crossed
    into the same job (never collected — each round is exactly one
    action, the eager localCheckpoint). Per-round checkpoints keep plan
    size constant across iterations.

    Optimization-round (r11) shape, guide §2.3/§2.4 — results unchanged
    (old-vs-new rounded outputs verified identical, gate-checked):

    * node universe + out-degree come from ONE explode/aggregate pass
      (was: a 2x-edge union-distinct AND a separate degree aggregate AND
      a per-round anti-join); n and the dangling-existence probe share
      one action on the materialized node frame;
    * the degree-annotated edge frame is hash-partitioned ONCE on the
      key every round reuses — dst when the rank vector broadcasts (the
      per-round aggregate then needs no exchange at all), src otherwise
      (each round then shuffles only the node-sized rank vector, never
      the edges);
    * the edge frame additionally carries one ZERO-contribution self row
      per node (rank * 0.0 / 1.0 = 0.0, exact in IEEE — appending 0.0
      terms never changes a double sum of non-negative contributions),
      so the per-round aggregate emits EVERY node and the old per-round
      node-universe left join disappears. The self row also carries the
      node's dangling flag (real edges carry NULL; ``max`` in the same
      aggregate re-attaches it);
    * the per-round dangling mass is OBSERVED (CollectMetrics) inside
      the round's own checkpoint job and fed forward as a literal — the
      old plan ran a dedicated filter+sum+broadcast job per round for a
      scalar the checkpoint pass was already scanning. A round is now
      exactly two jobs: the rank-vector broadcast and the checkpoint.

    Returns (node, rank) with rank UNROUNDED — callers round once at
    their output edge (double rounding, e.g. 8-then-6 decimals, flips
    boundary values vs a single round and breaks oracle comparisons).
    """
    # e feeds nodes and ed — persist ONCE or the caller's (possibly
    # expensive) upstream join replays before the first iteration even
    # starts (measured 10s of a 14s query on the sf0.1 trade graph).
    if weight_col is None:
        e = edges.select(
            F.col(src).cast(node_type).alias("a"),
            F.col(dst).cast(node_type).alias("b"),
        ).distinct()
    else:
        e = (
            edges.select(
                F.col(src).cast(node_type).alias("a"),
                F.col(dst).cast(node_type).alias("b"),
                F.col(weight_col).cast("double").alias("__w"),
            )
            .groupBy("a", "b")
            .agg(F.sum("__w").alias("__w"))
        )
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # Node universe AND out-degree in one pass: each edge contributes
    # (src, w-or-1) and (dst, 0); summing per node yields every node with
    # its out-degree, 0.0 marking dangling nodes. Replaces the separate
    # union-distinct + degree aggregate + per-round anti-join probes.
    # (Unweighted degrees become DOUBLE here where they were LONG counts;
    # rank/deg divided through a long->double cast before, so the values
    # are bit-identical for any count below 2^53.)
    contrib_src = F.lit(1.0) if weight_col is None else F.col("__w")
    nodes = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), contrib_src.alias("__c")),
                    F.struct(F.col("b").alias("node"), F.lit(0.0).alias("__c")),
                )
            ).alias("__s")
        )
        .select(F.col("__s.node").alias("node"), F.col("__s.__c").alias("__c"))
        .groupBy("node")
        .agg(F.sum("__c").alias("__deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Dangling nodes are a STRUCTURAL property — if every node has an
    # out-edge (true for any undirected/symmetrized graph), the dangling
    # mass is exactly 0 every round and its per-round subplan is dead.
    # One action materializes the cached node frame and answers both the
    # node count and the dangling-existence probe; the oracle's dangling
    # term is identically 0 in the no-dangling case, so results are
    # bit-equal.
    hdr = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.max((F.col("__deg") == 0.0).cast("int")).alias("hd"),
    ).first()
    n = hdr["n"]
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    has_dangling = bool(hdr["hd"])
    # The rank vector is (node, double) — 16 bytes/node. When it fits
    # the broadcast budget, ship it into the edge join instead of
    # shuffling the (much larger) edge frame's partner side each round:
    # the per-round plan becomes broadcast-join + ONE aggregate shuffle.
    # Above the threshold the hint is omitted and the join falls back to
    # the shuffle formulation — same plan shape Delta of pregel-style
    # engines at billion-node scale.
    bcast_ranks = n <= RANKS_BROADCAST_MAX
    nparts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    dang_flag = (F.col("__deg") == 0.0).alias("__dang")
    # Edges with the source's out-degree attached, UNIFIED to the
    # weighted contribution form rank * __w / __deg (__w = 1.0 on
    # unweighted edges — multiplying by exact 1.0 is the identity, so
    # the unweighted doubles are bit-identical to the old rank / deg),
    # plus one zero-contribution self row per node so the per-round
    # aggregate covers the whole universe (see docstring). Computed
    # once, pre-partitioned ONCE on the key every round reuses.
    real = e.join(
        nodes.filter(F.col("__deg") > 0.0).withColumnRenamed("node", "a"),
        "a",
    ).select(
        "a",
        "b",
        (F.lit(1.0) if weight_col is None else F.col("__w")).alias("__w"),
        "__deg",
        *(
            [F.lit(None).cast("boolean").alias("__dang")]
            if has_dangling
            else []
        ),
    )
    selfr = nodes.select(
        F.col("node").alias("a"),
        F.col("node").alias("b"),
        F.lit(0.0).alias("__w"),
        *([dang_flag] if has_dangling else []),
        F.lit(1.0).alias("__deg"),
    )
    ed = (
        real.unionByName(selfr)
        .repartition(nparts, F.col("b") if bcast_ranks else F.col("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _ckpt(df: DataFrame) -> "tuple[DataFrame, float]":
        """Checkpoint the round's rank state; the next round's dangling
        mass rides the SAME job as an observed metric (no dedicated
        filter+sum+broadcast pass — guide §1.2/§2.4)."""
        if not has_dangling:
            return df.localCheckpoint(), 0.0
        obs = Observation()
        out = df.observe(
            obs, F.sum(F.when(F.col("__dang"), F.col("rank"))).alias("dm")
        ).localCheckpoint()
        v = obs.get["dm"]
        return out, (0.0 if v is None else float(v))

    ranks, dm = _ckpt(
        nodes.select(
            "node",
            F.lit(1.0 / n).alias("rank"),
            *([dang_flag] if has_dangling else []),
        )
    )
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        side = ranks.select(F.col("node").alias("a"), "rank")
        inflow = (
            ed.join(F.broadcast(side) if bcast_ranks else side, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(
                F.sum(
                    F.col("rank") * F.col("__w") / F.col("__deg")
                ).alias("__in"),
                *(
                    [F.max("__dang").alias("__dang")]
                    if has_dangling
                    else []
                ),
            )
        )
        ranks, dm = _ckpt(
            inflow.select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("__in", F.lit(0.0))
                        + F.lit(dm) / F.lit(float(n))
                    )
                ).alias("rank"),
                *([F.col("__dang")] if has_dangling else []),
            )
        )
    nodes.unpersist()
    ed.unpersist()
    e.unpersist()
    return ranks.select("node", "rank")


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Personalized PageRank (Page et al. 1999 §6; the random walk with
    restart behind graph-based recommendation and "importance relative to
    THIS seed set" queries): identical iteration to :func:`pagerank`, but
    the teleport — the ``(1-d)`` restart AND the dangling-mass
    redistribution — lands on the SEED distribution (uniform over
    ``sources``) instead of uniformly on all nodes. Nodes unreachable
    from the seeds converge to exactly 0, which is the point: rank
    measures proximity-weighted influence relative to the seeds.

    Same contract and scale shape as :func:`pagerank`: fixed ``n_iter``
    (pure function of graph + seeds, so a SQL oracle replays the same
    unrolled rounds), one edge-join shuffle + one dst aggregate per
    round, the seed vector carried on the rank state, dangling mass a
    broadcast scalar, per-round localCheckpoint. Returns (node, rank)
    UNROUNDED.

    Optimization-round (r11) shape — identical to :func:`pagerank`'s:
    one explode/aggregate pass builds node universe + out-degree (+ the
    seed teleport probability via one full join); the degree-annotated
    edge frame is pre-partitioned once on the per-round reuse key and
    carries one zero-contribution self row per node (which also carries
    the node's teleport probability and dangling flag), so each round is
    ONE aggregate that emits every node — no node-universe left join —
    and the dangling mass is observed inside the round's own checkpoint
    job and fed forward as a literal. Old-vs-new rounded outputs
    verified identical; oracle-gated.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seeds = sources.select(
        F.col(source_col).cast("long").alias("node")
    ).distinct()
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    # One pass: node universe + out-degree (0.0 => dangling), then the
    # seed teleport probability attached — a single persisted per-node
    # frame replaces the old separate nodes/pvec/deg frames and the
    # per-round dangling anti-join (see pagerank's r11 notes). The full
    # join keeps seeds outside the edge universe as isolated nodes,
    # exactly like the old union.
    nodes = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), F.lit(1.0).alias("__c")),
                    F.struct(F.col("b").alias("node"), F.lit(0.0).alias("__c")),
                )
            ).alias("__s")
        )
        .select(F.col("__s.node").alias("node"), F.col("__s.__c").alias("__c"))
        .groupBy("node")
        .agg(F.sum("__c").alias("__deg"))
        .join(seeds.withColumn("__p0", F.lit(1.0 / n_seeds)), "node", "full")
        .select(
            "node",
            F.coalesce("__deg", F.lit(0.0)).alias("__deg"),
            F.coalesce("__p0", F.lit(0.0)).alias("__p"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hdr = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.max((F.col("__deg") == 0.0).cast("int")).alias("hd"),
    ).first()
    n_nodes = hdr["n"]
    has_dangling = bool(hdr["hd"])
    bcast_ranks = n_nodes <= RANKS_BROADCAST_MAX
    nparts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    dang_flag = (F.col("__deg") == 0.0).alias("__dang")
    # Same self-row shape as pagerank: __w = 1.0 on real edges / 0.0 on
    # the per-node self row (rank * 1.0 / deg is bit-identical to the
    # old rank / deg), and the self row carries the node's teleport
    # probability and dangling flag so the round aggregate re-attaches
    # both via max() — every round emits the whole node universe.
    real = e.join(
        nodes.filter(F.col("__deg") > 0.0)
        .select(F.col("node").alias("a"), "__deg"),
        "a",
    ).select(
        "a",
        "b",
        F.lit(1.0).alias("__w"),
        "__deg",
        F.lit(None).cast("double").alias("__p"),
        *(
            [F.lit(None).cast("boolean").alias("__dang")]
            if has_dangling
            else []
        ),
    )
    selfr = nodes.select(
        F.col("node").alias("a"),
        F.col("node").alias("b"),
        F.lit(0.0).alias("__w"),
        "__p",
        *([dang_flag] if has_dangling else []),
        F.lit(1.0).alias("__deg"),
    )
    ed = (
        real.unionByName(selfr)
        .repartition(nparts, F.col("b") if bcast_ranks else F.col("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _ckpt(df: DataFrame) -> "tuple[DataFrame, float]":
        if not has_dangling:
            return df.localCheckpoint(), 0.0
        obs = Observation()
        out = df.observe(
            obs, F.sum(F.when(F.col("__dang"), F.col("rank"))).alias("dm")
        ).localCheckpoint()
        v = obs.get["dm"]
        return out, (0.0 if v is None else float(v))

    ranks, dm = _ckpt(
        nodes.select(
            "node",
            F.col("__p").alias("rank"),
            *([dang_flag] if has_dangling else []),
        )
    )
    for _ in range(n_iter):
        side = ranks.select(F.col("node").alias("a"), "rank")
        inflow = (
            ed.join(F.broadcast(side) if bcast_ranks else side, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(
                F.sum(
                    F.col("rank") * F.col("__w") / F.col("__deg")
                ).alias("__in"),
                F.max("__p").alias("__p"),
                *(
                    [F.max("__dang").alias("__dang")]
                    if has_dangling
                    else []
                ),
            )
        )
        ranks, dm = _ckpt(
            inflow.select(
                "node",
                (
                    (F.lit(1.0 - damping) + F.lit(damping) * F.lit(dm))
                    * F.col("__p")
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
                *([F.col("__dang")] if has_dangling else []),
            )
        )
    nodes.unpersist()
    ed.unpersist()
    e.unpersist()
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    degree_ordered: bool = True,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph — the
    clustering-coefficient / community-density primitive, as two
    equi-joins.

    Edges are canonicalized (min, max, deduplicated, self-loops
    dropped). Each edge is then DIRECTED low→high and triangles are
    found as wedges from the lowest endpoint closed by a third edge:
    join wedges (u→v, u→w) on u, check (v, w) against the directed edge
    set. Every triangle is produced exactly once, then exploded back to
    its three corners for the per-node counts.

    ``degree_ordered`` picks the ordering that makes this scale: with
    plain id ordering a hub node of degree d fans out d^2/2 wedges — the
    "curse of the last reducer" (Suri & Vassilvitskii 2011, WWW) — while
    ordering by (degree, id) bounds every node's out-degree by O(sqrt(m))
    on any graph, so wedge fanout is balanced no matter how skewed the
    degree distribution. Results are IDENTICAL either way (asserted in
    test_graph.py); id ordering exists for the SQL oracle, which can't
    cheaply rank by degree. Plan: one degree aggregate (skipped for id
    ordering), one wedge self-join, one closing equi-join — no state,
    no iteration."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    # e feeds the degree aggregate and both sides of the ranking join;
    # d feeds the wedge self-join (twice) and the closing set (twice).
    # Without cutting lineage here the caller's upstream (often an
    # expensive co-occurrence self-join) replays up to ~12 times; the
    # persist + eager localCheckpoint below pin each to ONE computation.
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if degree_ordered:
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("__d"))
        )
        d = (
            e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("__d", "__da"), "a")
            .join(deg.withColumnRenamed("n", "b").withColumnRenamed("__d", "__db"), "b")
            .select(
                F.when(
                    (F.col("__da") < F.col("__db"))
                    | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                )
                .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
                .alias("__e"),
                "__da", "__db", "a", "b",
            )
            .select(
                F.col("__e.u").alias("u"),
                F.col("__e.v").alias("v"),
                F.when(F.col("__e.u") == F.col("a"), F.col("__da"))
                .otherwise(F.col("__db")).alias("__ru"),
                F.when(F.col("__e.v") == F.col("b"), F.col("__db"))
                .otherwise(F.col("__da")).alias("__rv"),
            )
        )
        rank_lt = (F.col("x.__rv") < F.col("y.__rv")) | (
            (F.col("x.__rv") == F.col("y.__rv")) & (F.col("x.v") < F.col("y.v"))
        )
    else:
        d = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        rank_lt = F.col("x.v") < F.col("y.v")
    # Pin d with persist + eager materialize, NOT localCheckpoint: a
    # checkpointed frame becomes a stats-less LogicalRDD leaf, and the
    # planner then refuses to broadcast it into the wedge/closing joins
    # (measured 35.6 s -> 366 s at the 10x replica when d was
    # checkpointed). InMemoryRelation keeps accurate size stats once
    # materialized, so the joins keep their broadcast/AQE choices while
    # the upstream co-occurrence build still computes exactly once.
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    d.count()
    e.unpersist()
    wedges = (
        d.alias("x")
        .join(d.alias("y"), F.col("x.u") == F.col("y.u"))
        .filter(rank_lt)
        .select(
            F.col("x.u").alias("n1"),
            F.col("x.v").alias("n2"),
            F.col("y.v").alias("n3"),
        )
    )
    closing = d.select(F.col("u").alias("n2"), F.col("v").alias("n3")).unionByName(
        d.select(F.col("v").alias("n2"), F.col("u").alias("n3"))
    )
    tris = wedges.join(closing, ["n2", "n3"])
    out = (
        tris.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        # Materialize the (tiny: one row per node) result so d's cache
        # can be dropped before returning — same end-of-operator
        # contract as pagerank()'s checkpointed ranks.
        .localCheckpoint()
    )
    d.unpersist()
    return out


def shortest_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    n_iter: int = 6,
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances, bounded at ``n_iter`` hops — the
    reachability / supply-chain-proximity primitive beside
    :func:`connected_components` (which ignores distance) and
    :func:`pagerank` (which weighs it): "every node within k hops of a
    seed set, with its distance".

    Semantics: seeds start at hop 0; each round every frontier node
    relaxes its neighbors to ``min(dist, my_dist + 1)``. After ``n_iter``
    rounds the result holds exactly the nodes at distance <= n_iter, with
    the true BFS distance (bounded-horizon Bellman-Ford with unit
    weights). The bound is part of the CONTRACT, not a convergence test:
    the result is a pure function of (graph, seeds, n_iter), so a SQL
    oracle can replay the same unrolled rounds and hash-match.

    Scale shape (same discipline as the siblings): each round is ONE
    shuffle — frontier joins edges on the source endpoint, proposals
    min-aggregate by destination, and the union with the carried state
    min-aggregates in the SAME grouping (no second shuffle: both sides
    are keyed by node). Per-round localCheckpoint keeps plan size
    constant; state is one row per reached node, monotonically growing
    to the k-hop ball — never the full n x n distance matrix. At 100 TB
    the cost is rounds x (edges within the expanding frontier), the
    canonical Pregel/GraphX iteration without the framework.

    Returns (node, hops) for reached nodes only. ``directed=False``
    (default) treats each edge as traversable both ways.
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    if not directed:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e_base = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    # r11 optimization (results unchanged, gate-checked): the carried
    # distance state no longer rides through the edge-sized min-aggregate
    # — proposals min-aggregate alone (no exchange: the edge frame is
    # pre-partitioned on the proposal key) and merge into the node-sized
    # state via a full-outer join + least() (null-skipping, so
    # exactly the old union+min semantics). The frontier state broadcasts
    # into the edge join below the pagerank threshold; the node bound
    # for the guard is 2x the edge count (cheap, already materialized).
    n_edges = e_base.count()
    bcast = 2 * n_edges <= RANKS_BROADCAST_MAX
    nparts = int(e_base.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e = e_base.repartition(
        nparts, F.col("b") if bcast else F.col("a")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    dist = (
        sources.select(F.col(source_col).cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        side = dist.withColumnRenamed("node", "a")
        prop_min = (
            e.join(F.broadcast(side) if bcast else side, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min(F.col("hops") + 1).alias("__ph"))
        )
        dist = (
            dist.join(prop_min, "node", "full")
            .select("node", F.least("hops", "__ph").alias("hops"))
            .localCheckpoint()
        )
    e.unpersist()
    e_base.unpersist()
    return dist


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007), fixed rounds, deterministic ties — the lightweight community
    finder beside :func:`connected_components` (which merges everything
    reachable) and :func:`triangle_count` (which scores density).

    Each node starts labeled with its own id; every round ALL nodes
    simultaneously adopt the most frequent label among their neighbors
    (ties -> smallest label; isolated nodes keep their label). The
    asynchronous variant's update order is irreproducible by design;
    this synchronous fixed-``n_iter`` formulation is a pure function of
    the graph — the property that makes a SQL oracle possible — at the
    cost of the known oscillation mode on bipartite structures, which
    the fixed horizon simply freezes (document the round count with the
    result downstream).

    Scale shape: per round, one edge-to-labels equi-join, one
    (node, label) count aggregate, one node-keyed argmax aggregate —
    all keyed on node ids, no global state, localCheckpoint per round.

    Optimization-round (r11) shape — results unchanged (old-vs-new
    outputs verified identical, gate-checked): the per-round winner is
    an ARGMAX aggregate instead of a row_number window — ``min`` over
    the struct ``(-count, label)`` is lexicographic, so the largest
    count wins and ties break to the smallest label exactly as the
    window's ``ORDER BY cnt DESC, label`` did — dropping the window's
    per-round sort; the symmetrized edge frame is pre-partitioned once
    on its per-round reuse key, and the node-sized label vector
    broadcasts into the edge join below the same threshold pagerank
    uses (guide §2.4).
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    und_base = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        und_base.select(F.col("a").alias("node"))
        .union(und_base.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    n = labels.count()
    bcast = n <= RANKS_BROADCAST_MAX
    nparts = int(und_base.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    und = und_base.repartition(
        nparts, F.col("b") if bcast else F.col("a")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    for _ in range(n_iter):
        side = labels.withColumnRenamed("node", "a")
        counts = (
            und.join(F.broadcast(side) if bcast else side, "a")
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        # The winner aggregate ALREADY covers the entire label universe:
        # und is symmetrized, so every labeled node appears as a dst and
        # the old per-round left-join-back-to-state (whose coalesce arm
        # only fired for nodes absent from und — impossible, labels are
        # built from und's endpoints) was dead plan weight. One
        # aggregate chain, zero joins beyond the broadcast edge join.
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__cnt")).alias("__nc"), F.col("label")
                    )
                ).alias("__m")
            )
            .select("node", F.col("__m.label").alias("label"))
            .localCheckpoint()
        )
    und.unpersist()
    und_base.unpersist()
    return labels


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
) -> DataFrame:
    """The k-core of an undirected graph (Seidman 1983): the maximal
    subgraph in which every node has degree >= k — the standard
    density filter for collaboration/co-occurrence graphs (spam rings,
    tightly-coupled supplier clusters, engaged-user cohorts) and the
    preprocessing step community detection and dense-subgraph mining
    run first.

    Synchronous peeling: every round simultaneously removes ALL nodes
    whose degree within the surviving subgraph is < k, until a round
    removes nothing. The k-core is unique and confluent (removal order
    cannot change the fixpoint), so the synchronous schedule — the one
    a SQL oracle can replay as unrolled rounds — computes the same
    core as the classic sequential min-degree peel.

    Scale shape: ``live`` edges are filtered by the survivor set on
    both endpoints (two node-keyed semi-joins) and re-aggregated for
    degrees — one degree shuffle per round, and live edges shrink
    MONOTONICALLY, so each round costs at most the previous round's
    surviving subgraph, not the input graph. Rounds localCheckpoint
    (constant plan size, same contract as the other iterative ops
    here). Real degree distributions peel in a handful of rounds; a
    graph still peeling after ``max_rounds`` raises rather than
    returning a supergraph of the core silently. For adversarial long
    chains, raise ``max_rounds`` (each extra round is one cheap pass
    over an already-shrunken subgraph).

    Returns (node, core_degree): the k-core members with their degree
    INSIDE the core. Deterministic — a pure function of the graph.
    """
    und = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    und = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    live = und
    alive_n = None
    for _ in range(max_rounds):
        deg = live.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("core_degree")
        )
        alive = deg.filter(F.col("core_degree") >= k).localCheckpoint()
        n = alive.count()
        if n == alive_n or n == 0:
            return alive.select(
                "node", F.col("core_degree").cast("long").alias("core_degree")
            )
        alive_n = n
        keep = alive.select("node")
        live = (
            live.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"k_core did not stabilize in {max_rounds} rounds (graph is "
        "still peeling); raise max_rounds"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub and authority scores
    over a directed edge list — the complement of PageRank for BIPARTITE
    influence structure (buyers that concentrate trade vs suppliers that
    attract it; pages that link well vs pages worth linking to).

    Each iteration: authority = normalized inflow of hub mass
    (``a[j] = sum h[i] over edges i->j``), then hub = normalized inflow
    of authority mass back (``h[i] = sum a[j] over edges i->j``); L1
    normalization each half-step (sum = 1 — same ranking as Kleinberg's
    L2, but exactly replayable as one scalar-divide in SQL, no sqrt
    conditioning). Scores start uniform at 1. Fixed ``n_iter`` keeps the
    result a pure function of the graph, so the DuckDB oracle replays
    the same unrolled rounds — the contract every iterative op here
    follows.

    Scale shape: per iteration exactly TWO node-keyed shuffles (the
    authority aggregate and the hub aggregate); per-round
    localCheckpoint keeps plans constant-size. Nodes with no in-edges
    have authority 0; no out-edges, hub 0.

    Optimization-round (r11) shape — results unchanged (old-vs-new
    rounded outputs verified identical, gate-checked): the iteration map
    is LINEAR in the score vector and each L1 norm is a scalar divide,
    so the loop iterates UNNORMALIZED raw inflow sums and divides by the
    L1 norm ONCE per output vector at the end — mathematically the same
    vectors (h_i_unnorm = c_i * h_i_norm for a per-round scalar c_i, and
    the final x/sum(x) cancels c_i exactly), but each round checkpoints
    ONE frame instead of two and drops both per-round norm
    aggregate+crossJoin subplans. Raw sums stay far from double
    overflow for any graph whose max degree^(2*n_iter) < 1e308. The two
    half-step edge joins read edge copies pre-partitioned once on their
    per-round reuse keys (guide §2.4), and the node-sized score vector
    broadcasts into them below the same threshold pagerank uses.

    Returns (node, hub, authority), unrounded (callers round once at
    the output edge).
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    bcast = n <= RANKS_BROADCAST_MAX
    nparts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # One partitioned edge copy per half-step, keyed so the reused-every-
    # round exchange disappears: with broadcast scores the aggregate key
    # (dst for the authority half, src for the hub half) is the partition
    # key; without, the join key is. Two cached copies trade 2x edge
    # storage for 2*n_iter avoided edge-frame shuffles.
    e_auth = e.repartition(
        nparts, F.col("b") if bcast else F.col("a")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e_hub = e.repartition(
        nparts, F.col("a") if bcast else F.col("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Scores live ONLY on nodes that can hold mass (hub: has out-edges,
    # authority: has in-edges) — absent nodes are exactly 0 and
    # contribute nothing to the next aggregate, so the node-universe
    # fill happens ONCE at the output instead of per half-step.
    h = e.select(F.col("a").alias("node")).distinct().withColumn(
        "h", F.lit(1.0)
    ).localCheckpoint()
    a_raw = None
    for _ in range(n_iter):
        h_side = h.withColumnRenamed("node", "a")
        a_raw = (
            e_auth.join(F.broadcast(h_side) if bcast else h_side, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("h").alias("__v"))
            .localCheckpoint()
        )
        a_side = a_raw.withColumnRenamed("node", "b")
        h = (
            e_hub.join(F.broadcast(a_side) if bcast else a_side, "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.sum("__v").alias("h"))
            .localCheckpoint()
        )
    out = (
        nodes.join(
            h.crossJoin(F.broadcast(h.agg(F.sum("h").alias("__hn")))).select(
                "node", (F.col("h") / F.col("__hn")).alias("hub")
            ),
            "node",
            "left",
        )
        .join(
            a_raw.crossJoin(
                F.broadcast(a_raw.agg(F.sum("__v").alias("__an")))
            ).select("node", (F.col("__v") / F.col("__an")).alias("auth")),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("authority"),
        )
        # Materialize (node-sized) BEFORE dropping the caches it reads:
        # the old code unpersisted first, so the caller's final action
        # recomputed the node universe — and with it the caller's whole
        # upstream edge build — from scratch (same end-of-operator
        # contract as triangle_count's checkpointed output).
        .localCheckpoint()
    )
    e.unpersist()
    e_auth.unpersist()
    e_hub.unpersist()
    nodes.unpersist()
    return out


def adamic_adar_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 20,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction over an undirected graph: the top ``k``
    NON-adjacent pairs by Adamic-Adar score
    ``AA(u,v) = sum_{w in N(u) cap N(v)} 1 / ln(deg(w))``
    (Adamic & Adar 2003) with the common-neighbor count alongside —
    "which suppliers/documents/users that never co-occurred are most
    likely to" — the standard unsupervised baseline every embedding-based
    link predictor is benchmarked against.

    Plan: one symmetrized neighbor frame, one wedge self-join on the
    common endpoint (pairs meet through w), one aggregate per candidate
    pair, one anti-join against the existing edge set, top-k via
    TakeOrderedAndProject. Every common neighbor is adjacent to BOTH
    endpoints, so deg(w) >= 2 and ln(deg) never divides by zero.

    Scale: wedge fanout is sum(deg_w^2) — the same last-reducer hazard
    triangle counting dodges with degree ordering, but scores need ALL
    wedges so ordering can't halve them here. ``max_degree`` excludes
    hub common-neighbors above the cap (standard practice: a w adjacent
    to everyone contributes ~1/ln(huge) of noise per pair while costing
    deg^2 wedges — drop it); None keeps exact semantics for oracle
    comparison on thresholded graphs.
    """
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym = e.select(F.col("a").alias("w"), F.col("b").alias("n")).unionByName(
        e.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = sym.groupBy("w").agg(F.count(F.lit(1)).alias("__deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("__deg") <= max_degree)
    symd = sym.join(deg, "w")
    pairs = (
        symd.alias("x")
        .join(symd.alias("y"), F.col("x.w") == F.col("y.w"))
        .filter(F.col("x.n") < F.col("y.n"))
        .groupBy(F.col("x.n").alias("n1"), F.col("y.n").alias("n2"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("x.__deg"))), 6).alias("aa_score"),
        )
    )
    out = (
        pairs.join(
            e,
            (pairs.n1 == e.a) & (pairs.n2 == e.b),
            "left_anti",
        )
        .orderBy(F.desc("aa_score"), F.asc("n1"), F.asc("n2"))
        .limit(k)
        .localCheckpoint()
    )
    e.unpersist()
    return out


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    degree_ordered: bool = True,
) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    ``C(n) = 2 * triangles(n) / (deg(n) * (deg(n) - 1))`` — how close a
    node's neighborhood is to a clique, the community-structure probe
    beside :func:`triangle_count` (which it composes: one triangle pass
    + one degree aggregate + a left join, so nodes in no triangle get
    coefficient 0 rather than dropping out). Nodes of degree < 2 are
    excluded (the coefficient is undefined there, and emitting 0 would
    silently conflate "isolated" with "star center"). Degree counts
    deduplicate edges and ignore self-loops exactly as the triangle
    pass does — the two sides MUST see the same graph or the ratio is
    nonsense.

    r11 optimization (results unchanged, gate-checked): the canonical
    edge frame is persisted HERE, because it feeds two independent
    consumers — the degree aggregate and the triangle pass — and
    without the persist each one re-ran the caller's (typically
    expensive self-join) edge build from scratch (measured: the whole
    co-occurrence build twice per query at sf0.1). The output is
    checkpointed (node-sized) before the cache drops, the same
    end-of-operator contract as triangle_count."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tris = triangle_count(e, src="a", dst="b", degree_ordered=degree_ordered)
    out = (
        deg.filter(F.col("degree") >= 2)
        .join(tris, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("coefficient"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    return out
