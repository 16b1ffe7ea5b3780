"""Graph analytics beyond connected components: fixed-iteration PageRank.

The reference's only graph structure is the cell-adjacency matrix it
block-diagonalizes (bin/concatenate.py:313-336, SURVEY U3/W1); rank-style
propagation is green-field. Graph here: directed nation→nation trade
flows (supplier nation ships to customer nation), weights = line counts.

Spark shape: the power iteration is a *loop building one lazy plan* —
per round one broadcast join (ranks are |nodes|-sized) + one hash-agg on
dst. On a billion-edge graph the same loop shuffles edges once per round
on dst and `localCheckpoint`s each iteration to stop logical-plan growth
(see operators/iterative.py pattern used by connected components).

Determinism: ranks are re-rounded to 9 decimals after every iteration,
so double sum-order noise (~1e-16) can't accumulate or cross the final
rounding boundary; weights/out-degrees are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.operators.graphs import pagerank as op_pagerank
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

DAMPING = 0.85
N_ITER = 3

_EDGES_SQL = """
  SELECT n1.n_name AS src, n2.n_name AS dst, count(*) AS w
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE n1.n_nationkey <> n2.n_nationkey
  GROUP BY src, dst
"""

_PAGERANK_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
n AS (SELECT count(*) AS n_nodes FROM nodes),
outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
r0 AS (
  SELECT node, round(1.0 / n_nodes, 9) AS rank FROM nodes CROSS JOIN n
),
r1 AS (
  SELECT nodes.node,
         round((1 - {DAMPING}) / any_value(n.n_nodes) + {DAMPING} * coalesce(
           sum(r0.rank * e.w / outw.out_w), 0), 9) AS rank
  FROM nodes CROSS JOIN n
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN r0 ON r0.node = e.src
  LEFT JOIN outw ON outw.src = e.src
  GROUP BY nodes.node
),
r2 AS (
  SELECT nodes.node,
         round((1 - {DAMPING}) / any_value(n.n_nodes) + {DAMPING} * coalesce(
           sum(r1.rank * e.w / outw.out_w), 0), 9) AS rank
  FROM nodes CROSS JOIN n
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN r1 ON r1.node = e.src
  LEFT JOIN outw ON outw.src = e.src
  GROUP BY nodes.node
),
r3 AS (
  SELECT nodes.node,
         round((1 - {DAMPING}) / any_value(n.n_nodes) + {DAMPING} * coalesce(
           sum(r2.rank * e.w / outw.out_w), 0), 9) AS rank
  FROM nodes CROSS JOIN n
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN r2 ON r2.node = e.src
  LEFT JOIN outw ON outw.src = e.src
  GROUP BY nodes.node
)
SELECT node, rank FROM r3
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nation names are resolved INTO the two dims first (dim⋈dim is
    # nation-sized work), so the fact path pays two broadcast probes
    # per row instead of four — halves the broadcast stages and the
    # per-row join work on the only big input
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    nation = T(spark, sf_dir, "nation")
    supp_dim = (
        T(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("src"))
    )
    cust_dim = (
        T(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("dst"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_dim), orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


@register("graph_pagerank", sql=_PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint_every > n_iter: a 3-round plan executes as ONE job; the
    # eager mid-run localCheckpoint only pays off at high iteration
    # counts where logical-plan depth threatens the driver (operator
    # default keeps it for such callers). Results are identical either
    # way — checkpointing is semantics-neutral.
    return op_pagerank(
        _trade_edges(spark, sf_dir),
        n_iter=N_ITER,
        damping=DAMPING,
        checkpoint_every=N_ITER + 1,
    )


# ---------------------------------------------------------------------------
# graph_triangles — per-node triangle participation over the undirected
# trade graph. Canonical a<b<c edge orientation turns the classic
# O(E^1.5) wedge-closing join into two equi hash joins with no
# duplicate triangles and no cartesian: e(a,b) ⋈ e(b,c) closes on
# e(a,c). Each triangle then fans out to its three member nodes for
# the per-node counts — the clustering-coefficient numerator used in
# graph-quality audits.
# ---------------------------------------------------------------------------

_TRIANGLES_SQL = f"""
WITH directed AS ({_EDGES_SQL}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM directed
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM members GROUP BY node
"""


@register("graph_triangles", sql=_TRIANGLES_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    directed = _trade_edges(spark, sf_dir)
    und = directed.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e1 = und.alias("e1")
    e2 = und.select(
        F.col("a").alias("b2a"), F.col("b").alias("c")
    ).alias("e2")
    e3 = und.select(
        F.col("a").alias("a3"), F.col("b").alias("b3")
    ).alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("b2a"))
        .join(
            e3,
            (F.col("a3") == F.col("e1.a")) & (F.col("b3") == F.col("c")),
        )
        .select("e1.a", "e1.b", "c")
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# graph_communities — synchronous label propagation (LPA) over the
# undirected trade graph: every node starts as its own community and
# each round adopts the label carrying the maximum incident edge
# weight among its neighbors (ties → lexicographically smallest
# label), for a FIXED number of rounds so the oracle can replay the
# iteration exactly. Deterministic end to end: weights are integer
# line counts, sums are exact, and the argmax tie-break is total.
# Spark shape mirrors graph_pagerank: per round one join of the
# neighbor list against the |nodes|-sized label frame (broadcast) plus
# one hash-agg — on a billion-edge graph the edge list shuffles once
# per round on nbr and the label frame stays the small side.
# ---------------------------------------------------------------------------

LPA_ITERS = 3


def _lpa_round_sql(it: int) -> str:
    return f"""l{it} AS (
  SELECT node, label FROM (
    SELECT n.node, l.label, sum(n.w) AS tw,
           row_number() OVER (
             PARTITION BY n.node ORDER BY sum(n.w) DESC, l.label
           ) AS rn
    FROM neigh n JOIN l{it - 1} l ON l.node = n.nbr
    GROUP BY n.node, l.label
  ) WHERE rn = 1
)"""


_COMMUNITIES_SQL = (
    f"""
WITH directed AS ({_EDGES_SQL}),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, sum(w) AS w
  FROM directed GROUP BY a, b
),
neigh AS (
  SELECT a AS node, b AS nbr, w FROM und
  UNION ALL
  SELECT b AS node, a AS nbr, w FROM und
),
l0 AS (SELECT DISTINCT node, node AS label FROM neigh),
"""
    + ",\n".join(_lpa_round_sql(i) for i in range(1, LPA_ITERS + 1))
    + f"""
SELECT node, label AS community FROM l{LPA_ITERS}
"""
)


@register("graph_communities", sql=_COMMUNITIES_SQL)
def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    directed = _trade_edges(spark, sf_dir)
    und = (
        directed.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    neigh = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr"), "w"
    ).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"), "w")
    )
    labels = neigh.select("node").distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(LPA_ITERS):
        labels = (
            neigh.join(
                F.broadcast(labels.withColumnRenamed("node", "nbr")), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("tw"))
            .groupBy("node")
            .agg(
                F.min_by(
                    "label", F.struct((-F.col("tw")).alias("neg"), "label")
                ).alias("label")
            )
        )
    return labels.select("node", F.col("label").alias("community"))


# ---------------------------------------------------------------------------
# graph_bfs — minimum-hop distances over the SPARSIFIED trade graph:
# each nation keeps only its top-2 outgoing trade lanes (by line count,
# ties → smaller dst name), and BFS runs from the lexicographically
# first source nation for a fixed 6 hops. Sparsification matters twice:
# it is what real trade/citation/link graphs look like after edge
# pruning, and it keeps multi-hop structure visible (the dense graph is
# diameter-1, which would make any traversal vacuous). The oracle is a
# bounded recursive CTE — DuckDB replays the exact layered expansion
# because min-hop distance is iteration-order-free.
# ---------------------------------------------------------------------------

BFS_TOP_EDGES = 2
BFS_MAX_HOPS = 6

_BFS_SQL = f"""
WITH RECURSIVE e AS ({_EDGES_SQL}),
sparse AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM e
  ) WHERE rn <= {BFS_TOP_EDGES}
),
root AS (SELECT min(src) AS node FROM sparse),
reach(node, dist) AS (
  SELECT node, CAST(0 AS BIGINT) FROM root
  UNION ALL
  SELECT s.dst, r.dist + 1
  FROM reach r JOIN sparse s ON s.src = r.node
  WHERE r.dist < {BFS_MAX_HOPS}
)
SELECT node, min(dist) AS dist FROM reach GROUP BY node
"""


@register("graph_bfs", sql=_BFS_SQL)
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from codex_data_products_spark.operators.graphs import bfs as op_bfs

    directed = _trade_edges(spark, sf_dir)
    w = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    sparse = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BFS_TOP_EDGES)
        .select("src", "dst")
    )
    # root stays in-plan (1-row agg, no driver collect)
    root = sparse.agg(F.min("src").alias("node"))
    return op_bfs(sparse, root, max_hops=BFS_MAX_HOPS)


# ---------------------------------------------------------------------------
# graph_degree_distribution — degree histogram of the supplier→customer
# interaction graph (distinct pairs that actually traded): the first
# diagnostic run on any production graph before choosing partitioning
# (power-law tail ⇒ hub salting). Plan: the edge set is ONE distinct
# over the joined fact (co-partitioned equi joins), degrees are a hash
# agg to |suppliers| rows, and the histogram a second agg to the
# distinct-degree grain — the same two-level collapse skew_profile
# uses; nothing holistic, no window at all.
# ---------------------------------------------------------------------------

_DEGREE_SQL = """
WITH edges AS (
  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
deg AS (SELECT supp, count(*) AS degree FROM edges GROUP BY supp)
SELECT CAST(degree AS BIGINT)   AS degree,
       CAST(count(*) AS BIGINT) AS n_suppliers
FROM deg GROUP BY degree
"""


@register("graph_degree_distribution", sql=_DEGREE_SQL)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("supp"), F.col("o_custkey").alias("cust")
        )
        .distinct()
    )
    deg = edges.groupBy("supp").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy(F.col("degree").cast("long").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers")
    )


# ---------------------------------------------------------------------------
# graph_link_prediction — common-neighbor link prediction over the
# near-duplicate pair graph: two documents that are each LSH-verified
# near-dups of the same third document but were never emitted as a
# pair themselves are predicted links — exactly the transitive
# candidates a banded-LSH pass structurally misses (similarity decays
# across hops; the band collision may not fire for the endpoints).
# Production dedup closes this with one neighbor-join, not another
# corpus pass. Score = common-neighbor count + the Jaccard of the two
# neighbor SETS (not token sets). Plan: the two-hop join fans out per
# shared neighbor, so cost is Σ deg(z)² over dup-cluster members —
# bounded by cluster size (upstream stop-shingle DF cap kills viral
# hubs), never corpus all-pairs; the existing-edge removal is a
# broadcast-able anti join on the pair key.
# ---------------------------------------------------------------------------

from codex_data_products_spark.queries.dedup import (  # noqa: E402
    _MINHASH_SQL,
    dedup_minhash_lsh,
)

_LINK_PRED_SQL = f"""
WITH pairs AS MATERIALIZED ({_MINHASH_SQL}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY a),
cn AS (
  SELECT u1.a AS x, u2.a AS y, CAST(count(*) AS BIGINT) AS common_neighbors
  FROM und u1 JOIN und u2 ON u1.b = u2.b AND u1.a < u2.a
  GROUP BY u1.a, u2.a
),
nonadj AS (
  SELECT c.x, c.y, c.common_neighbors
  FROM cn c LEFT JOIN e ON e.a = c.x AND e.b = c.y
  WHERE e.a IS NULL
)
SELECT n.x AS doc_a, n.y AS doc_b, n.common_neighbors,
       round(CAST(n.common_neighbors AS DOUBLE)
             / (da.dg + db.dg - n.common_neighbors), 6) AS neighbor_jaccard
FROM nonadj n
JOIN deg da ON da.node = n.x
JOIN deg db ON db.node = n.y
"""


def link_prediction_from_pairs(e: DataFrame) -> DataFrame:
    """Common-neighbor predictions for an (a, b) pair frame (a < b
    normalized). Unit-testable core of graph_link_prediction — see
    tests/test_plans.py / test_clustering.py for the constructed-chain
    case (1-2, 2-3 predicts 1-3 with neighbor_jaccard 1.0)."""
    und = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    u1 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    u2 = und.select(F.col("a").alias("y"), F.col("b").alias("z2"))
    cn = (
        u1.join(u2, (F.col("z") == F.col("z2")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
    )
    nonadj = cn.join(
        e, (cn["x"] == e["a"]) & (cn["y"] == e["b"]), "left_anti"
    )
    da = deg.select(F.col("node").alias("nx"), F.col("dg").alias("dga"))
    db = deg.select(F.col("node").alias("ny"), F.col("dg").alias("dgb"))
    return (
        nonadj.join(da, F.col("x") == F.col("nx"))
        .join(db, F.col("y") == F.col("ny"))
        .select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("dga") + F.col("dgb") - F.col("common_neighbors")),
                6,
            ).alias("neighbor_jaccard"),
        )
    )


@register("graph_link_prediction", sql=_LINK_PRED_SQL)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pair frame is referenced ~7x downstream (und x2, two-hop x4,
    # anti join); without a cut each reference would recompute the FULL
    # LSH pipeline (shingle -> minhash -> band join -> verify) — at
    # sf0.5 that turned a 10 s query into a 10 min one. The pair set is
    # dup-cluster-bounded (thousands of rows), so one localCheckpoint
    # materializes it and every downstream branch reads the tiny cut.
    e = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    return link_prediction_from_pairs(e)


# ---------------------------------------------------------------------------
# graph_kcore — bounded k-core decomposition by iterative peeling
# (Seidman 1983 "Network structure and minimum degree"; the standard
# distributed formulation peels all sub-k nodes each superstep, e.g.
# Montresor et al. 2013): repeatedly delete every node whose degree in
# the SURVIVING subgraph is < K, for a fixed number of rounds. Graph:
# part co-purchase (parts sharing an order, distinct pairs — the
# market_basket pair space), where the K-core is the densely
# substitutable product nucleus. Output is the per-round peel summary
# (nodes/edges remaining), which pins every iteration's arithmetic in
# the cross-engine hash without emitting the O(|V|) membership list.
#
# Spark shape: the pair frame is built once via the basket-bounded
# order-key equi self-join (never part x part) and localCheckpoint'd;
# each peel round is one degree hash-agg + two semi joins against the
# survivor set, checkpointed so plan depth stays O(1) per round — the
# same iterative-lineage discipline as pagerank/connected components.
# At 100 TB the survivor set shrinks monotonically, so each round's
# shuffle is no larger than the previous one.
# ---------------------------------------------------------------------------

KCORE_K = 50
KCORE_ROUNDS = 3

_KCORE_EDGES_SQL = """
  SELECT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
  GROUP BY x, y
"""


def _kcore_sql() -> str:
    parts = [f"WITH e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})"]
    for t in range(KCORE_ROUNDS):
        parts.append(
            f""",
d{t} AS (
  SELECT x, count(*) AS d FROM (
    SELECT x FROM e{t} UNION ALL SELECT y AS x FROM e{t}
  ) GROUP BY x
),
s{t + 1} AS (SELECT x FROM d{t} WHERE d >= {KCORE_K}),
e{t + 1} AS MATERIALIZED (
  SELECT e.x, e.y FROM e{t} e
  JOIN s{t + 1} a ON a.x = e.x
  JOIN s{t + 1} b ON b.x = e.y
)"""
        )
    parts.append(
        f""",
d{KCORE_ROUNDS} AS (
  SELECT x, count(*) AS d FROM (
    SELECT x FROM e{KCORE_ROUNDS}
    UNION ALL SELECT y AS x FROM e{KCORE_ROUNDS}
  ) GROUP BY x
)
"""
    )
    stats = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS round,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM d{t}) AS n_nodes,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM e{t}) AS n_edges"
        for t in range(KCORE_ROUNDS + 1)
    )
    parts.append(stats)
    return "".join(parts)


@register("graph_kcore", sql=_kcore_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .distinct()
        .localCheckpoint()
    )

    from codex_data_products_spark.operators.graphs import kcore_peel

    def stats(t: int, e: DataFrame, deg: DataFrame) -> DataFrame:
        n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        return (
            n_nodes.crossJoin(n_edges)
            .select(
                F.lit(t).cast("long").alias("round"), "n_nodes", "n_edges"
            )
        )

    rounds = [
        stats(t, e, deg)
        for t, e, deg in kcore_peel(edges, KCORE_K, KCORE_ROUNDS)
    ]
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out
