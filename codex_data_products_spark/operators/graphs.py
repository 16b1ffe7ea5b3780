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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Single-task fast-path bounds (round 11, guide §4.2): a label-
# propagation graph whose node AND edge lists both fit one task's
# memory is solved inside ONE executor task with vectorized NumPy
# (np.minimum.at + pointer jumping) instead of paying the BSP loop's
# per-round fixed costs (measured at the sf1.0 skew stress: 8 rounds x
# ~2 s of AQE query-stage overhead for a 28K-node graph). The bounds
# are on MEASURED counts of this run's data — not the scale factor —
# so a corpus whose signature graph outgrows one task's memory takes
# the distributed loop automatically. 8M+2M rows x 3 longs ≈ 240 MB of
# Arrow+NumPy per the one task: comfortably inside a normal executor.
SMALL_GRAPH_EDGES = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "8000000"))
SMALL_GRAPH_NODES = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_NODES", "2000000"))


def _cc_single_task(batches):
    """mapInArrow kernel: rows are (x, y, tag) — tag 0 = seed row
    (node x with seed label y), tag 1 = directed edge x→y. Emits
    (node, label) with label = min seed in the node's component.
    Vectorized min-label propagation with full pointer-jump compression
    per sweep; O(E) numpy work per sweep, a handful of sweeps."""
    import numpy as np
    import pyarrow as pa

    xs, ys, tags = [], [], []
    for batch in batches:
        xs.append(batch.column(0).to_numpy(zero_copy_only=False))
        ys.append(batch.column(1).to_numpy(zero_copy_only=False))
        tags.append(batch.column(2).to_numpy(zero_copy_only=False))
    if not xs:
        return
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    tag = np.concatenate(tags)
    seed_mask = tag == 0
    nodes = x[seed_mask]
    seeds = y[seed_mask]
    order = np.argsort(nodes, kind="stable")
    nodes, seeds = nodes[order], seeds[order]
    src = np.searchsorted(nodes, x[~seed_mask])
    dst = np.searchsorted(nodes, y[~seed_mask])
    n = nodes.shape[0]
    lab = np.arange(n, dtype=np.int64)
    while True:
        prev = lab.copy()
        np.minimum.at(lab, dst, prev[src])
        while True:
            jumped = lab[lab]
            if np.array_equal(jumped, lab):
                break
            lab = jumped
        if np.array_equal(lab, prev):
            break
    seed_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(seed_min, lab, seeds)
    out_label = seed_min[lab]
    yield pa.RecordBatch.from_arrays(
        [pa.array(nodes, pa.int64()), pa.array(out_label, pa.int64())],
        names=["node", "label"],
    )


def min_label_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 50,
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Connected components by min-label propagation to fixpoint over
    ``nodes(node[, label])`` and ``edges(a, b)`` (BOTH directions
    supplied by the caller) → ``(node, label)`` with label = the
    smallest seed label in the component (seed defaults to ``node``).

    The bulk-synchronous loop every CC/keep-best terminal shares, with
    the three scale properties the naive per-round join lacks:

    * **the edge table shuffles AND sorts once, not once per round** —
      it is hash-partitioned and sorted on the probe key ``a`` before
      its single ``localCheckpoint`` (LogicalRDD preserves both output
      partitioning and ordering), so a sort-merge round never re-sorts
      the edges; and because a checkpointed frame has no size stats
      (AQE sees defaultSizeInBytes and will never auto-broadcast it),
      the label frame is broadcast EXPLICITLY while its known row count
      (the previous round's changed count) fits ``broadcast_rows`` —
      the common case for doc-grain graphs, making each round one
      edge-scan BHJ with map-side partial agg and no edge shuffle at
      all. Frames above the threshold (billion-node graphs) fall back
      to the sort-free merge join;
    * **frontier (delta) propagation** — a node's neighbor-min can only
      decrease when a neighbor's label decreased last round, so rounds
      after the first aggregate over the changed labels only. Dedup
      graphs are near-cliques: the frontier collapses after 1-2 rounds
      and late rounds cost ~nothing instead of a full edge join each;
    * **the convergence test is a scan, not a join** — the changed flag
      is computed inside the round's own join and read back off the
      checkpointed frame, replacing the old new-vs-old join + count;
    * **pointer jumping** — after each propagate step the label map is
      composed with itself (label ← label(label)), so label reach
      doubles per round and chain-shaped components (near-dup mutation
      chains produce them) converge in O(log diameter) rounds instead
      of O(diameter). Labels stay ids of same-component nodes and only
      decrease, so the fixpoint — and the result — is unchanged.

    Propagation is over node ids; when the caller supplies a seed
    ``label`` column, the structural component ids are re-labeled by
    the component's min seed at the end (one component-grain agg).
    """
    seeded = "label" in nodes.columns
    nd = nodes.select(
        F.col("node").cast("long").alias("node"),
        (F.col("label") if seeded else F.col("node"))
        .cast("long")
        .alias("seed"),
    ).localCheckpoint()
    n_nodes = nd.count()
    if n_nodes <= SMALL_GRAPH_NODES:
        # Node set fits the single-task bound — materialize the edge
        # list once (computed ONCE here; the former code's repartition
        # re-ran the caller's whole pair-generation plan) and gate the
        # fast path on its measured size.
        eck = edges.select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
        ).localCheckpoint()
        n_edges = eck.count()
        if n_edges <= SMALL_GRAPH_EDGES:
            payload = nd.select(
                F.col("node").alias("x"),
                F.col("seed").alias("y"),
                F.lit(0).alias("tag"),
            ).unionByName(
                eck.select(
                    F.col("a").alias("x"),
                    F.col("b").alias("y"),
                    F.lit(1).alias("tag"),
                )
            )
            return payload.repartition(1).mapInArrow(
                _cc_single_task, "node long, label long"
            )
        edges = eck
    edges = (
        edges.repartition("a").sortWithinPartitions("a").localCheckpoint()
    )
    seed = (
        nd.select("node", F.col("seed").alias("label")) if seeded else None
    )
    comp = nd.select("node", F.col("node").alias("label"))
    frontier, f_rows = comp, n_nodes
    for _ in range(max_rounds):
        fl = frontier.select(
            F.col("node").alias("a"), F.col("label").alias("nl")
        )
        if f_rows <= broadcast_rows:
            fl = F.broadcast(fl)
        nbr = (
            edges.join(fl, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("nl").alias("nmin"))
        )
        prop = comp.join(nbr, "node", "left").select(
            "node",
            F.col("label").alias("old"),
            F.least("label", F.coalesce("nmin", "label")).alias("p"),
        )
        lk = prop.select(
            F.col("node").alias("jn"), F.col("p").alias("jl")
        )
        new = (
            prop.join(lk, prop.p == lk.jn, "left")
            .select(
                "node",
                F.least("p", F.coalesce("jl", "p")).alias("label"),
                (
                    F.least("p", F.coalesce("jl", "p")) < F.col("old")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        comp = new.select("node", "label")
        frontier = new.filter("_changed").select("node", "label")
        f_rows = new.filter("_changed").count()
        if f_rows == 0:
            break
    if not seeded:
        return comp
    best = (
        comp.join(seed.withColumnRenamed("label", "s"), "node")
        .groupBy(F.col("label").alias("cid"))
        .agg(F.min("s").alias("minseed"))
    )
    return comp.join(best, comp.label == best.cid).select(
        "node", F.col("minseed").alias("label")
    )


# Single-task PageRank bound (round 12, VERDICT r11 #8): the BSP loop
# costs ~3 AQE query stages per iteration — measured 1.5-4 s of pure
# stage fixed cost for a 600-edge nation graph at sf0.1 (half the
# query; tools/profile_pagerank.py), and the suite ran FASTER at 8
# cores than 32 because the per-stage overhead scales with core count.
# Like the CC fast path above, the gate is the MEASURED edge count of
# this run's graph, so a billion-edge graph takes the distributed loop
# automatically. 4M edges x (2 node strings + weight) is ~200 MB of
# Arrow in the one task.
SMALL_PR_EDGES = int(os.environ.get("SPARK_GRAFT_PR_LOCAL_EDGES", "4000000"))


def _round_half_up_9(arr, scale: int):
    """Vectorized HALF_UP decimal rounding matching Spark's
    ``round(double, scale)`` (BigDecimal.valueOf(x).setScale(scale,
    HALF_UP).toDouble — i.e. HALF_UP on the shortest round-trip decimal
    repr). The fast path floors x*10^s + 0.5; values within 1e-5 of the
    tie boundary (far wider than the ~2e-7 worst-case fp error of the
    scaled product for |x| <= 1) fall back to exact Decimal quantize on
    repr(x), which is the same shortest repr BigDecimal.valueOf uses."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    m = float(10**scale)
    y = arr * m
    out = np.floor(y + 0.5) / m
    frac = y - np.floor(y)
    ties = np.abs(frac - 0.5) < 1e-5
    if ties.any():
        q = Decimal(1).scaleb(-scale)
        for i in np.nonzero(ties)[0]:
            out[i] = float(
                Decimal(repr(float(arr[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return out


def _pr_single_task(n_iter: int, damping: float, round_scale: int):
    """mapInArrow kernel factory: rows are (src, dst, w) edges; emits
    (node, rank) after ``n_iter`` damped propagation rounds with the
    same per-iteration HALF_UP re-rounding as the BSP loop. Weights
    must be integral (out-degree sums stay exact); products and the
    damping base are the identical double expressions, so outputs match
    the distributed loop bit-for-bit up to sum-order noise the rounding
    was designed to absorb (parity-tested in tests/test_clustering.py)."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        chunks = []
        for batch in batches:
            chunks.append(batch)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks).combine_chunks()
        src, dst = tbl.column(0).chunk(0), tbl.column(1).chunk(0)
        w = tbl.column(2).chunk(0).to_numpy(zero_copy_only=False)
        nodes = pc.unique(pa.concat_arrays([src, dst]))
        n = len(nodes)
        si = pc.index_in(src, value_set=nodes).to_numpy(
            zero_copy_only=False
        )
        di = pc.index_in(dst, value_set=nodes).to_numpy(
            zero_copy_only=False
        )
        out_w = np.zeros(n, dtype=np.int64)
        np.add.at(out_w, si, w.astype(np.int64))
        share = w.astype(np.float64) / out_w[si].astype(np.float64)
        rank = np.full(
            n, _round_half_up_9(np.array([1.0 / n]), round_scale)[0]
        )
        base = (1 - damping) / n  # same Python-double lit as the loop
        for _ in range(n_iter):
            mass = np.zeros(n, dtype=np.float64)
            np.add.at(mass, di, rank[si] * share)
            rank = _round_half_up_9(base + damping * mass, round_scale)
        yield pa.RecordBatch.from_arrays(
            [nodes, pa.array(rank, pa.float64())], names=["node", "rank"]
        )

    return kernel


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

    A graph whose MEASURED edge count fits one task (``SMALL_PR_EDGES``)
    is solved inside a single mapInArrow task (round 12): the 3-round
    BSP chain was ~9 AQE query stages of fixed cost for a |nations|-
    sized graph. Larger graphs take the distributed loop automatically.
    """
    from pyspark import StorageLevel
    from pyspark.sql.types import IntegerType, LongType

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    integral_w = isinstance(
        edges.schema["w"].dataType, (IntegerType, LongType)
    )
    if integral_w and edges.count() <= SMALL_PR_EDGES:
        node_t = edges.schema["src"].dataType.simpleString()
        return edges.select("src", "dst", "w").repartition(1).mapInArrow(
            _pr_single_task(n_iter, damping, round_scale),
            f"node {node_t}, rank double",
        )
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
