"""PageRank (operators/linkgraph.py): equivalence with a dense
reference implementation (dangling nodes included), conservation of
mass, and partitioning invariance."""

from __future__ import annotations

import random

import pytest


def _reference_pr(n, edges, damping, iters):
    """Dense power iteration, same recurrence as the operator."""
    out = {}
    for (s, _d) in edges:
        out[s] = out.get(s, 0) + 1
    pr = [1.0 / n] * n
    for _ in range(iters):
        dangling = sum(pr[v] for v in range(n) if v not in out)
        contrib = [0.0] * n
        for (s, d) in edges:
            contrib[d] += pr[s] / out[s]
        pr = [(1 - damping) / n + damping * (contrib[v] + dangling / n)
              for v in range(n)]
    return pr


def _run(spark, n, edges, damping=0.85, iters=8):
    from document_retrieval_system_spark.operators.linkgraph import pagerank

    nodes = spark.createDataFrame([(v,) for v in range(n)], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = pagerank(e, nodes, damping=damping, iters=iters)
    return {r["node"]: r["pr"] for r in got.collect()}


def test_pagerank_matches_reference_with_dangling(spark):
    rng = random.Random(7)
    n = 40
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(120)
                    if True})
    edges = [(s, d) for (s, d) in edges if s != d and s % 5 != 0]
    assert any(v not in {s for s, _ in edges} for v in range(n))  # dangling
    got = _run(spark, n, edges)
    want = _reference_pr(n, edges, 0.85, 8)
    assert all(abs(got[v] - want[v]) < 1e-12 for v in range(n))


def test_pagerank_mass_conserved_and_uniform_on_cycle(spark):
    n = 12
    edges = [(v, (v + 1) % n) for v in range(n)]
    got = _run(spark, n, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert max(got.values()) - min(got.values()) < 1e-12  # symmetric graph


def test_pagerank_sink_attracts_mass(spark):
    # star into node 0: it must outrank every spoke
    n = 6
    edges = [(v, 0) for v in range(1, n)]
    got = _run(spark, n, edges)
    assert got[0] > max(got[v] for v in range(1, n)) * 2


def test_pagerank_partitioning_invariance(spark):
    rng = random.Random(3)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    edges = [(s, d) for (s, d) in edges if s != d]
    from document_retrieval_system_spark.operators.linkgraph import pagerank

    nodes = spark.createDataFrame([(v,) for v in range(n)], "node long")
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = e1.repartition(7)
    r1 = {r["node"]: round(r["pr"], 12)
          for r in pagerank(e1, nodes, iters=4).collect()}
    r2 = {r["node"]: round(r["pr"], 12)
          for r in pagerank(e2, nodes.repartition(3), iters=4).collect()}
    assert r1 == r2


def test_pagerank_damping_validation(spark):
    from document_retrieval_system_spark.operators.linkgraph import pagerank

    nodes = spark.createDataFrame([(0,)], "node long")
    e = spark.createDataFrame([(0, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, nodes, damping=1.0)


def test_triangle_stats_bruteforce(spark):
    """Random directed multigraph (dups, self-loops, both directions)
    vs a brute-force census."""
    import random

    from document_retrieval_system_spark.operators.linkgraph import (
        triangle_stats,
    )

    rng = random.Random(19)
    raw = [(rng.randrange(30), rng.randrange(30)) for _ in range(260)]
    raw += [(n, n) for n in range(5)]          # self-loops must drop
    raw += [(b, a) for (a, b) in raw[:40]]     # reversed dups collapse

    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(len(adj[u] & adj[v]) for u, v in und) // 3
    wed = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())

    df = spark.createDataFrame(raw, "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wed
    assert row["n_triangles"] == tri
    assert row["global_clustering"] == round(3.0 * tri / wed, 6)


def _reference_bfs(edges, seeds, max_depth):
    """Level-synchronous BFS on plain dicts."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    depth = {v: 0 for v in seeds}
    frontier = set(seeds)
    for lvl in range(1, max_depth + 1):
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in depth:
                    depth[w] = lvl
                    nxt.add(w)
        if not nxt:
            break
        frontier = nxt
    return depth


def _run_bfs(spark, edges, seeds, max_depth=8):
    from document_retrieval_system_spark.operators.linkgraph import bfs_depths

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src < 0")
    s = spark.createDataFrame([(v,) for v in seeds], "node long")
    got = bfs_depths(e, s, max_depth=max_depth)
    return {r["node"]: r["depth"] for r in got.collect()}


def test_bfs_matches_reference_on_random_graph(spark):
    import random

    rng = random.Random(13)
    n = 60
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(150) if True})
    edges = [(s, d) for s, d in edges if s != d]
    seeds = [0, 7, 31]
    for max_depth in (0, 1, 3, 8):
        assert _run_bfs(spark, edges, seeds, max_depth) == \
            _reference_bfs(edges, seeds, max_depth)


def test_bfs_min_depth_wins_on_diamond(spark):
    # 0->1->3 and 0->3: node 3 must be depth 1, not 2
    edges = [(0, 1), (1, 3), (0, 3), (3, 4)]
    got = _run_bfs(spark, edges, [0])
    assert got == {0: 0, 1: 1, 3: 1, 4: 2}


def test_bfs_cycle_terminates_and_seed_stays_zero(spark):
    # ring: a seed reachable from the ring keeps depth 0
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _run_bfs(spark, edges, [0], max_depth=10)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_unreachable_absent_and_duplicate_seeds(spark):
    edges = [(0, 1)]
    got = _run_bfs(spark, edges, [0, 0])
    assert got == {0: 0, 1: 1}  # node 5 etc. absent


def test_bfs_max_depth_validation(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _run_bfs(spark, [(0, 1)], [0], max_depth=-1)
