"""Iterative graph algorithms as DataFrame joins.

Connected components (min-label propagation with large-star/small-star
rounds) lives in dedup.py next to its near-dup consumer; this module
holds the general graph surface. Same execution philosophy: an
iteration is a join + aggregation the optimizer can plan, never a
driver-side adjacency structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank by power iteration → (node, rank).

    ``edges`` is a directed edge list; dangling nodes (no out-edges)
    contribute their mass uniformly, matching the standard formulation
    (ranks sum to n at every step, so results are comparable to any
    textbook/numpy implementation on the same graph).

    Scale shape per iteration: ranks ⋈ out-degree-weighted edges on the
    source key (one hash exchange), contributions aggregated on dst
    (map-side combined), plus one 1-row dangling-mass aggregate that
    broadcasts. Edges are cached once with their out-degrees
    pre-attached; every iteration reuses that hot copy, so the
    per-iteration cost is two shuffles of RANK-SIZED rows (8-byte key +
    double), never the payload. Lineage is truncated with a lazy
    ``localCheckpoint`` every ``checkpoint_every`` iterations — without
    it the plan tree doubles per iteration and Catalyst analysis time
    dominates past ~15 iterations (same fix as connected_components).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # e feeds nodes (twice), out_deg, and the weighted join — Catalyst
    # does not share subplans, so without materialization the source
    # scans once per consumer (round-6 plan audit: 7 scans). One
    # dedup'd edge materialization serves them all.
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    weighted = e.join(out_deg, "src").cache()
    n = nodes.count()  # one job; also materializes `nodes` for reuse
    nodes = nodes.cache()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(max_iter):
        contrib = (
            ranks.join(weighted, ranks.node == weighted.src)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # uniformly — a 1-row aggregate the join broadcasts
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Per-node triangle participation counts → (node, n_triangles).

    Input is an undirected edge list; edges are canonicalized to
    src < dst (self-loops dropped, both orientations merged), so each
    triangle {a,b,c} with a < b < c is enumerated exactly once as the
    join e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) — the standard oriented
    wedge-closing formulation. Every node of the triangle then gets one
    count via a 3-way unpivot + agg.

    Scale shape: two hash joins on edge endpoints. The wedge join
    (e1 ⋈ e2 on b) is the quadratic risk — its output is Σ d⁺(v)², and
    orienting edges low→high id caps the effective degree (the classic
    high-degree-vertex mitigation; an id-ordered orientation bounds
    wedge counts the same way degree-ordering does for power-law
    graphs up to relabeling). AQE handles residual skew; nothing here
    collects or broadcasts unconditionally, so the op survives edge
    tables far beyond driver memory.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    # the canonical edge set feeds all three legs of the wedge-closing
    # join — materialize once instead of re-deriving (and re-scanning
    # the source) per leg (round-6 plan audit: 9 scans before this)
    e = e.localCheckpoint(eager=False)
    e1 = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = e1.join(e2, "tb").join(e3, ["ta", "tc"])
    nodes = tri.select(
        F.explode(F.array("ta", "tb", "tc")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def label_propagation(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation →
    (node, community): every node repeatedly adopts the most frequent
    label among its neighbors AND itself (self-vote damps the
    oscillation plain synchronous LPA exhibits on bipartite structure),
    ties to the smallest label; stops early when an iteration changes
    nothing. Deterministic by construction — no random visit order.

    Scale shape per iteration: one edge⋈labels join (labels is
    |V| rows, edges dominate) + a (node, label) count + per-node argmax
    window — all hash-partitioned on node; lineage is truncated every
    ``checkpoint_every`` rounds exactly like :func:`pagerank`. Like the
    dedup connected-components loop, iterations are driver-coordinated
    but ALL data work is distributed.
    """
    from pyspark.sql import Window

    a, b = F.col(src), F.col(dst)
    # self-loop/NULL filter AFTER the union so BOTH orientations are
    # cleaned (filtering only the forward branch lets (x,x) re-enter
    # via the reversed select and double-count x's self vote)
    und = (
        edges.select(a.alias("s"), b.alias("d"))
        .unionByName(edges.select(b.alias("s"), a.alias("d")))
        .where(
            F.col("s").isNotNull() & F.col("d").isNotNull()
            & (F.col("s") != F.col("d"))
        )
        .distinct()
    )
    # every iteration joins the same edge frame — materialize it once
    # (the pagerank pattern); blocks are reclaimed when labels drop
    und = und.localCheckpoint(eager=False)
    nodes = und.select(F.col("s").alias("node")).distinct()
    labels = nodes.withColumn("community", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("community"))
    for i in range(max_iter):
        neighbor_votes = (
            und.join(labels, und["d"] == labels["node"])
            .select(F.col("s").alias("node"), "community")
        )
        votes = neighbor_votes.unionByName(labels.select("node", "community"))
        new_labels = (
            votes.groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "community")
        )
        # truncate lineage EVERY round: the changed-count action below
        # materializes the checkpoint, and the next iteration (plus the
        # second reference in the join) reuses the blocks instead of
        # re-running up to checkpoint_every rounds of join/agg/window
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.community") != F.col("o.community"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "a",
    dst: str = "b",
    source_col: str = "node",
    max_hops: int = 10,
) -> DataFrame:
    """Multi-source BFS hop distances on an undirected graph →
    (node, distance): distance = fewest edges from ANY source node
    (0 for the sources themselves); unreachable nodes are absent.

    Frontier-expansion as DataFrame ops: each round joins the current
    frontier to the edge list, anti-joins already-visited nodes, and
    unions into the visited set — per-round cost ∝ edges touched by the
    frontier, the textbook distributed BFS. Lineage truncates every
    round via localCheckpoint (the visited set is re-referenced each
    iteration); stops when the frontier empties or ``max_hops``.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(a.alias("s"), b.alias("d"))
        .unionByName(edges.select(b.alias("s"), a.alias("d")))
        .where(
            F.col("s").isNotNull() & F.col("d").isNotNull()
            & (F.col("s") != F.col("d"))
        )
        .distinct()
    )
    und = und.localCheckpoint(eager=False)  # reused every hop
    visited = sources.select(F.col(source_col).alias("node")).distinct().withColumn(
        "distance", F.lit(0)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            und.join(frontier, und["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("distance", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited


def link_prediction_jaccard(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction → (node_a, node_b, common,
    degree_a, degree_b, jaccard) for node pairs that are NOT edges,
    scored by neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| — the
    classic similarity baseline for "which edge forms next"
    (recommendations, knowledge-graph completion, record linkage).

    Construction (all hash joins + partial aggs, nothing collected):
    edges are canonicalized undirected, expanded to a symmetric
    adjacency list, wedges closed through the shared neighbor
    (adj ⋈ adj on the CENTER node, node_a < node_b), counted per pair,
    degree-joined, then candidate pairs that are already edges are
    removed with a left-anti join on the canonical edge set.

    Scale levers, in the same spirit as triangle_counts:

    - The wedge join through a center of degree d emits C(d,2) pairs —
      a power-law hub is quadratic. ``max_degree`` drops hub CENTERS
      before the wedge join (their common-neighbor evidence is weak
      anyway: a node connected to everything predicts nothing). This
      bounds per-center work at C(max_degree,2), exactly the frequency
      cap ngram_jaccard_pairs applies to hot shingles.
    - ``min_common`` prunes the long tail of coincidental 1-neighbor
      pairs BEFORE the degree joins, keeping the pair table small.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # (z = wedge CENTER i.e. the shared neighbor, node = wedge endpoint)
    half = adj.select(F.col("b").alias("z"), F.col("a").alias("node"))
    if max_degree is not None:
        half = half.join(
            F.broadcast(
                deg.where(F.col("deg") > max_degree).select(F.col("a").alias("z"))
            ),
            "z",
            "left_anti",
        )
    w1 = half.select("z", F.col("node").alias("node_a"))
    w2 = half.select("z", F.col("node").alias("node_b"))
    common = (
        w1.join(w2, "z")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    non_edges = common.join(
        e.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    scored = (
        non_edges.join(deg.select(F.col("a").alias("node_a"), F.col("deg").alias("degree_a")), "node_a")
        .join(deg.select(F.col("a").alias("node_b"), F.col("deg").alias("degree_b")), "node_b")
        .select(
            "node_a",
            "node_b",
            "common",
            "degree_a",
            "degree_b",
            (
                F.col("common")
                / (F.col("degree_a") + F.col("degree_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return scored
