"""PageRank over a document link graph.

Web-corpus curation and ranking both want a link-authority signal: the
reference's U3 domain rescoring (rules_engine, applied in
operators/rules.py) boosts hand-listed domains — PageRank is the
data-derived version of that list, and quality-filter stacks (e.g.
harmonic-centrality weighting in Common Crawl derivatives) use exactly
this operator at web scale.

Standard damped PageRank (Page et al. 1999) with dangling-mass
redistribution:

    pr'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} pr(u)/outdeg(u) + M/N )

where ``M`` is the total rank held by dangling nodes (no out-links).
Fixed iteration count (power iteration converges geometrically at rate
``d``; 8 iterations ≈ 0.85^8 ≈ 0.27 of the gap — callers wanting
tighter convergence raise ``iters``).

Scale shape: one iteration = one (edges ⋈ ranks) shuffle on ``src`` +
one ``dst`` aggregation — the exact join/agg pair every distributed
PageRank (GraphX, Pregel) runs; contributions partial-aggregate
map-side.  The rank vector is localCheckpoint-ed per iteration so the
plan stays O(1) deep instead of O(iters) (the same lineage-bounding
pattern as curate.duplicate_clusters), and the dangling mass is an O(1)
scalar read off the checkpointed vector — one tiny job per iteration,
not a hot-path collect.  Skewed in-degree (every page links to the
hub) is absorbed by map-side combine: the hot ``dst`` key arrives
pre-summed per partition.

Determinism: float sums over in-neighbors commute only approximately;
per-iteration drift is ~1 ulp and damping keeps it from compounding,
so 6-decimal rounding of the final vector is engine- and
partitioning-stable (the entry hashes it against an unrolled-CTE DuckDB
twin whose constants are bit-identical via ``repr`` round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, nodes: DataFrame, damping: float = 0.85,
             iters: int = 8) -> DataFrame:
    """Rank ``nodes`` ("node" column) by ``edges`` ("src", "dst").

    Edges must be deduplicated; dst values outside ``nodes`` lose their
    mass (standard behavior — sanitize first if that matters).  Returns
    (node, pr) with pr unrounded; Σ pr = 1 up to float error.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr"))
    teleport = (1.0 - damping) / n
    # materialize the loop invariants once — every iteration joins them,
    # and without this the edge derivation (often a parse/distinct
    # pipeline) re-executes 2x per iteration
    nodes = nodes.select("node").localCheckpoint()
    edges = edges.select("src", "dst").localCheckpoint()
    outdeg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("deg")).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr")).localCheckpoint()
    for _ in range(iters):
        # dangling mass stays IN the plan as a broadcast one-row
        # aggregate: collecting it per iteration cost one extra
        # driver-synchronized job per round (r6; the in-plan double
        # division by n is bit-identical to the former driver-side
        # float division)
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
        )
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (F.lit(teleport) + F.lit(damping)
                 * (F.coalesce(F.col("s"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n)))).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of the (directed) link graph: undirected
    distinct edges, wedge count, triangle count, and the global
    clustering coefficient 3T/W — the standard web-graph cohesion
    diagnostic (link farms and boilerplate nav blocks show up as
    anomalously high clustering; organic link graphs sit low).

    Algorithm: canonicalize to u < v, then count ordered wedges
    a < b < c with (a,b),(b,c) ∈ E and close them with a semi-join on
    (a,c) — each triangle matches exactly once (its middle vertex is
    unique under the total order), the node-ordering trick that keeps
    the join fan-out at Σ C(deg,2) instead of Σ deg².  Wedges come
    from the degree table in exact integer arithmetic, no join.

    Scale shape: one distinct over edges, one self-join on the shared
    vertex, one semi-join — all equi-joins on node ids; a celebrity
    node's fan-out is bounded by its same-tier neighbors under the
    ordering (the classic mitigation; explicit degree-ordering is the
    next notch if a real crawl graph needs it).  Output is ONE row of
    exact LONGs plus one rounded double."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
        F.count("*").cast("long").alias("n_nodes"),
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    closing = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = (
        e1.join(e2, "b")
        .join(closing, ["a", "c"], "left_semi")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_edges = und.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        n_edges.crossJoin(wedges).crossJoin(tris)
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"), 6,
            ).alias("global_clustering"),
        )
    )


def bfs_depths(edges: DataFrame, seeds: DataFrame,
               max_depth: int = 8) -> DataFrame:
    """Minimum hop distance from a seed set — crawl-frontier depth
    labeling (the breadth-first schedule every polite crawler runs:
    seeds are depth 0, pages they link to depth 1, ...).  Curation
    uses the label directly: distance-from-seed is a standard quality
    prior (Common Crawl's harmonic-centrality seeds, OPIC scheduling),
    and capping crawl depth bounds spider traps.

    `edges` ("src", "dst") is followed in direction src -> dst;
    `seeds` needs a "node" column.  Returns (node, depth) for every
    node reachable within `max_depth` hops, depth = MINIMUM hop count
    (seeds themselves at 0, even if also reachable later).  Unreachable
    nodes are absent — callers wanting a row per node left-join this.

    Scale shape: textbook distributed BFS — one (frontier join edges)
    shuffle + one anti-join against the visited set per level, both on
    the src/node key; the frontier is the only growing state and each
    node enters it at most once, so total work is O(E + V) across all
    levels (every edge relaxed exactly once from its head's first
    discovery).  Lineage is localCheckpoint-bounded per level (same
    pattern as pagerank above), the per-level isEmpty early-exit is an
    O(frontier) driver probe, and a hub with 10^6 in-links partial-
    aggregates to one frontier row map-side via the distinct.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    edges = edges.select("src", "dst").localCheckpoint()
    visited = (
        seeds.select("node").distinct()
        .withColumn("depth", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(edges["dst"].alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    return visited
