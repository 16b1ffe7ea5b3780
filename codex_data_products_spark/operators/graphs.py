"""Generic graph propagation operators over edge-list DataFrames.

The engine's graph representation is an edge list keyed by globally
unique ids (SURVEY §1.1: the reference's scipy block-diagonal adjacency,
bin/concatenate.py:313-336, becomes `(src, dst, weight)` rows). On that
representation, iterative propagation is a loop that *builds one lazy
plan per round*: join state to edges, aggregate to the destination,
checkpoint. Connected components (operators used by
queries/dedup.dedup_connected_components) and PageRank share the shape.

Scale rules baked in here (see SCALE.md "iterative"):
  * persist the edge/contribution table once — every round reuses it;
  * truncate lineage each round with ``localCheckpoint`` (logical-plan
    growth otherwise OOMs the driver at high iteration counts);
  * keep per-round state at one row per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    round_scale: int = 9,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)`` → ``(node, rank)``.

    Ranks are re-rounded to ``round_scale`` decimals after every
    iteration so floating-point sum-order noise cannot accumulate —
    results are identical on any partitioning (and match a SQL oracle).
    Dangling nodes (no out-edges) contribute nothing; nodes with no
    in-edges settle at the damping base, matching the unrolled-CTE
    reference semantics in queries/graph.py.
    """
    from pyspark import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    contrib = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("out_w")).alias("share"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), round_scale).alias("rank")
    )
    for it in range(n_iter):
        incoming = (
            contrib.join(F.broadcast(ranks), contrib.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("mass"))
        )
        ranks = nodes.join(
            F.broadcast(incoming), nodes.node == incoming.dst, "left"
        ).select(
            "node",
            F.round(
                F.lit((1 - damping) / n_nodes)
                + damping * F.coalesce(F.col("mass"), F.lit(0.0)),
                round_scale,
            ).alias("rank"),
        )
        # truncate lineage periodically, not every round: each eager
        # checkpoint is a full materialization + driver round-trip, and
        # a plan only a couple of rounds deep executes once anyway —
        # checkpoint_every bounds plan depth without paying per-round
        if it < n_iter - 1 and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs(
    edges: DataFrame,
    source: DataFrame,
    max_hops: int = 6,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Minimum-hop distances from ``source(node)`` over ``edges(src, dst)``.

    Frontier-expansion BFS → ``(node, dist)``: each round expands ONLY
    the nodes discovered last round (an anti-join drops already-settled
    nodes), so total work is O(|reachable edges|) across the whole run —
    not O(rounds × |edges|) as a naive re-expand-everything loop would
    be. Because layers settle in discovery order, ``dist`` is exactly
    the recursive-CTE ``min(dist)`` a SQL engine computes; the fixed
    ``max_hops`` bound lets an oracle replay the iteration verbatim.

    Scale shape: ``edges`` is persisted once and probed per round with
    the frontier as the broadcast side (frontiers are at most one
    "layer" of the graph; on a graph whose layers outgrow a broadcast,
    drop the hint and AQE falls back to a shuffle join keyed on src).
    Lineage is truncated every ``checkpoint_every`` rounds like the
    other iterative operators here.
    """
    from pyspark import StorageLevel

    edges = edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    dist = source.select("node", F.lit(0).cast("long").alias("dist"))
    frontier = dist
    for hop in range(1, max_hops + 1):
        discovered = (
            edges.join(F.broadcast(frontier), edges.src == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(hop).cast("long").alias("dist"))
        )
        dist = dist.unionAll(discovered)
        frontier = discovered
        if hop < max_hops and hop % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    return dist


def kcore_peel(
    edges: DataFrame, k: int, rounds: int
) -> list[tuple[int, DataFrame, DataFrame]]:
    """Bounded k-core peeling (Seidman 1983; peel-all-per-superstep as
    in distributed formulations): repeatedly drop every node whose
    degree in the surviving subgraph is < k. ``edges`` is an
    (x, y) frame with x < y normalized. Returns
    [(round, edges_frame, degree_frame), ...] for rounds 0..rounds —
    round 0 is the input graph. Each round is one degree hash-agg and
    two semi joins, localCheckpoint'd so plan depth stays O(1); the
    survivor set shrinks monotonically, so per-round shuffle size is
    non-increasing."""

    def degrees(e: DataFrame) -> DataFrame:
        und = e.select("x").unionAll(e.select(F.col("y").alias("x")))
        return und.groupBy("x").agg(F.count(F.lit(1)).alias("d"))

    cur = edges.localCheckpoint()
    deg = degrees(cur)
    out = [(0, cur, deg)]
    for t in range(1, rounds + 1):
        surv = deg.filter(F.col("d") >= k).select("x")
        cur = (
            cur.join(surv, "x", "left_semi")
            .join(surv.select(F.col("x").alias("y")), "y", "left_semi")
            .localCheckpoint()
        )
        deg = degrees(cur)
        out.append((t, cur, deg))
    return out
