"""PageRank: t1 vs a numpy power-iteration oracle on the same graph
(engine-specific iterative op — not SQL-expressible, so no DuckDB
oracle; the registry entry is a rows-only driver check)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkflow_spark.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.ones(n)
    for _ in range(iters):
        nxt = np.full(n, 1 - damping)
        dm = r[deg == 0].sum()
        nxt += damping * dm / n
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / deg[idx[u]]
        r = nxt
    return {u: r[idx[u]] for u in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # chain with a dangling sink
        [(1, 2), (2, 3), (3, 4)],
        # star: hub cited by all
        [(2, 1), (3, 1), (4, 1), (5, 1)],
        # cycle + chord + dangler
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 5)],
    ],
)
def test_pagerank_matches_numpy(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=10).collect()}
    exp = _numpy_pagerank(edges, iters=10)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9), k
    # mass conservation: ranks sum to n at every power step
    assert sum(got.values()) == pytest.approx(len(exp), rel=1e-9)


def test_pagerank_duplicate_edges_collapse(spark):
    df = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=5).collect()}
    exp = _numpy_pagerank([(1, 2), (2, 1)], iters=5)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


def test_label_propagation_two_cliques(spark):
    """Two K4 cliques joined by one bridge edge resolve into two
    communities; result matches a python implementation of the same
    synchronous most-frequent-neighbor-label-with-self-vote rule, and
    repeated runs are identical (no random visit order)."""
    from sparkflow_spark.graph import label_propagation

    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = k4a + k4b + [(3, 10)]  # bridge
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["community"] for r in label_propagation(df).collect()}

    # python reference: identical synchronous rule
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    lab = {n: n for n in adj}
    for _ in range(10):
        new = {}
        for n in adj:
            c = Counter(lab[m] for m in adj[n])
            c[lab[n]] += 1
            topcnt = max(c.values())  # tie → smallest label
            best = min(l for l, cnt in c.items() if cnt == topcnt)
            new[n] = best
        if new == lab:
            break
        lab = new
    assert got == lab
    # the cliques end up internally uniform
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    again = {r["node"]: r["community"] for r in label_propagation(df).collect()}
    assert again == got


def test_bfs_distances_vs_python(spark):
    """Multi-source BFS distances on a path + branch graph equal a
    python BFS; unreachable nodes are absent; sources are distance 0."""
    from collections import deque

    from sparkflow_spark.graph import bfs_distances

    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (5, 6), (8, 9)]  # 8-9 disconnected
    df = spark.createDataFrame(edges, "a long, b long")
    srcs = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["distance"] for r in bfs_distances(df, srcs).collect()}

    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    dist = {1: 0}
    q = deque([1])
    while q:
        n = q.popleft()
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    assert got == dist
    assert 8 not in got and 9 not in got
    # multi-source: both endpoints at distance 0, middle at 1
    got2 = {
        r["node"]: r["distance"]
        for r in bfs_distances(
            df, spark.createDataFrame([(1,), (3,)], "node long")
        ).collect()
    }
    assert got2[1] == 0 and got2[3] == 0 and got2[2] == 1 and got2[4] == 1
