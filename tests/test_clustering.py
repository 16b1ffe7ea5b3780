"""Distributed k-means: correctness on separable data, determinism,
objective monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from codex_data_products_spark.operators.clustering import (
    kmeans,
    within_cluster_ss,
)


def _separable(spark):
    # two tight blobs far apart: k-means must separate them exactly
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.01, 10.0]))
    for i in range(20, 40):
        rows.append((i, [-10.0, -10.0 - (i % 5) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_kmeans_separates_blobs(spark):
    vecs = _separable(spark)
    assigned, centroids = kmeans(vecs, k=2, max_iter=10)
    by_cluster = {}
    for r in assigned.collect():
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    groups = sorted(by_cluster.values(), key=len)
    assert len(groups) == 2
    assert set(range(20)) in groups and set(range(20, 40)) in groups
    cents = {r["cluster"]: r["cvec"] for r in centroids.collect()}
    signs = sorted(round(c[0] / abs(c[0])) for c in cents.values())
    assert signs == [-1, 1]  # one centroid per blob


def test_kmeans_is_deterministic(spark):
    vecs = _separable(spark)
    a1, _ = kmeans(vecs, k=3, max_iter=5)
    a2, _ = kmeans(vecs, k=3, max_iter=5)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_objective_not_worse_than_init(spark):
    vecs = _separable(spark)
    # init = vec_id % k (interleaves the blobs: bad clustering)
    init = vecs.withColumn("cluster", (F.col("vec_id") % 2).cast("int"))
    from codex_data_products_spark.operators.clustering import _centroids_of

    ss_init = within_cluster_ss(init, _centroids_of(init, "cluster"))
    assigned, centroids = kmeans(vecs, k=2, max_iter=10)
    ss_final = within_cluster_ss(assigned.join(vecs, "vec_id"), centroids)
    assert ss_final < ss_init


def test_kmeans_cells_beat_label_cells_for_ivf_recall(spark, sf_dir):
    """Integration: retraining IVF cells with k-means on the real
    embeddings table must improve recall@k over the synthetic label
    column (which knn_recall showed is not a cosine clustering)."""
    from codex_data_products_spark.queries.similarity import (
        TOP_K,
        knn_brute_force,
    )
    from codex_data_products_spark.tables import table as T

    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    assigned, _ = kmeans(emb, k=8, max_iter=5)
    truth = knn_brute_force(spark, sf_dir).select("query_id", "neighbor_id")

    def recall(cells):  # cells: (vec_id, cell)
        e = emb.join(cells, "vec_id")
        q = e.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("cell").alias("qcell"),
        )
        cand = e.join(
            q,
            (F.col("cell") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select("query_id", F.col("vec_id").alias("hit_id"))
        hits = truth.join(
            cand,
            (truth["query_id"] == cand["query_id"])
            & (truth["neighbor_id"] == cand["hit_id"]),
            "left_semi",
        ).count()
        return hits / truth.count()

    label_cells = emb.select("vec_id", F.col("label").alias("cell"))
    kmeans_cells = assigned.select("vec_id", F.col("cluster").alias("cell"))
    r_label = recall(label_cells)
    r_kmeans = recall(kmeans_cells)
    # the retrained cells must contain strictly more of the true top-k
    assert r_kmeans > r_label
    assert r_kmeans >= 0.3  # and be a usable index, not a lottery


def test_pagerank_operator_hand_checked(spark):
    """3-node cycle with one chord: ranks computable by hand.

    Graph: a->b (1), b->c (1), c->a (1), a->c (1). a splits its mass
    between b and c; after enough iterations c must outrank b (two
    in-edges vs one), and every iteration preserves total mass ≈ 1.
    """
    from codex_data_products_spark.operators.graphs import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=5).collect()}
    assert set(got) == {"a", "b", "c"}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["c"] > got["b"]  # two in-edges beat one
    # python reference implementation, same rounding discipline
    ranks = {n: round(1 / 3, 9) for n in "abc"}
    out = {"a": [("b", 0.5), ("c", 0.5)], "b": [("c", 1.0)], "c": [("a", 1.0)]}
    for _ in range(5):
        mass = {n: 0.0 for n in "abc"}
        for src, outs in out.items():
            for dst, share in outs:
                mass[dst] += ranks[src] * share
        ranks = {n: round(0.15 / 3 + 0.85 * mass[n], 9) for n in "abc"}
    for n in "abc":
        assert abs(got[n] - ranks[n]) < 1e-9


def test_link_prediction_predicts_chain_gap(spark):
    # chain 1-2, 2-3: the missing 1-3 edge is the only prediction;
    # deg(1)=deg(3)=1, cn=1 -> neighbor_jaccard 1/(1+1-1) = 1.0.
    # A complete triangle (4-5, 4-6, 5-6) must predict NOTHING.
    from codex_data_products_spark.queries.graph import (
        link_prediction_from_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (4, 6), (5, 6)], "a long, b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["common_neighbors"],
            r["neighbor_jaccard"],
        )
        for r in link_prediction_from_pairs(pairs).collect()
    }
    assert got == {(1, 3): (1, 1.0)}


def test_kcore_peel_triangle_survives_tail_peels(spark):
    """Constructed 2-core: a triangle {1,2,3} with a pendant chain
    3-4-5. At k=2 the chain peels over two rounds (5 first, then 4)
    and the triangle is the exact 2-core fixpoint — three bounded
    rounds reach it."""
    from codex_data_products_spark.operators.graphs import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "x long, y long"
    )
    rounds = kcore_peel(edges, 2, 3)
    sizes = [
        (t, e.count(), deg.count()) for t, e, deg in rounds
    ]
    assert sizes[0] == (0, 5, 5)
    assert sizes[1] == (1, 4, 4)   # node 5 (degree 1) peeled
    assert sizes[2] == (2, 3, 3)   # node 4 lost its support, peeled
    assert sizes[3] == (3, 3, 3)   # fixpoint: the triangle
    core = {(r["x"], r["y"]) for r in rounds[3][1].collect()}
    assert core == {(1, 2), (1, 3), (2, 3)}


def test_semantic_dedup_min_id_witness_rule(spark, tmp_path):
    """Constructed SemDeDup cell: vectors a(1), b(2), c(3) in one cell
    where cos(1,2) and cos(1,3) exceed the threshold but cos(2,3) also
    does — every non-minimal vector is dropped with keeper witness 1,
    and vector 1 (no smaller-id duplicate) survives by not appearing
    in the drop list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from codex_data_products_spark.queries.dedup import dedup_semantic

    d = tmp_path / "emb"
    d.mkdir()
    # near-parallel vectors => pairwise cosine ~1 within the cell
    vecs = [
        (1, [1.0, 0.0, 0.01], 0),
        (2, [1.0, 0.0, 0.02], 0),
        (3, [1.0, 0.01, 0.0], 0),
        (9, [0.0, 1.0, 0.0], 1),  # different cell, never paired
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = {
        r["dropped_vec_id"]: (r["kept_by"], r["n_dup_neighbors"])
        for r in dedup_semantic(spark, str(d)).collect()
    }
    assert set(out) == {2, 3}
    assert out[2][0] == 1 and out[3][0] == 1
    assert out[2][1] == 1 and out[3][1] == 2  # 3 has witnesses {1, 2}


def test_containment_flags_exact_subset_doc(spark, tmp_path):
    """A short doc fully embedded in a long doc: Jaccard is tiny but
    containment is 1.0 — the pair the Jaccard passes structurally
    miss and this query exists to catch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from codex_data_products_spark.queries.dedup import dedup_containment

    d = tmp_path / "docs"
    d.mkdir()
    inner = " ".join(f"tok{i}" for i in range(12))
    outer = inner + " " + " ".join(f"pad{i}" for i in range(300))
    other = " ".join(f"zzz{i}" for i in range(40))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([inner, outer, other]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array(
                    [len(inner), len(outer), len(other)], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    rows = dedup_containment(spark, str(d)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    assert got == {(1, 2): 1.0}


def test_min_label_components_hand_checked(spark):
    """Two components (a 4-chain and a 2-clique) plus an isolate; the
    chain exercises pointer jumping and frontier propagation, the
    isolate keeps its own label. The seeded variant relabels each
    component by its minimum seed."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.operators.graphs import (
        min_label_components,
    )

    und = [(10, 11), (11, 12), (12, 13), (20, 21)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "a long, b long"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (10, 11, 12, 13, 20, 21, 30)], "node long"
    )
    got = {
        r["node"]: r["label"]
        for r in min_label_components(nodes, edges).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20, 30: 30}

    seeded = spark.createDataFrame(
        [(10, 105), (11, 101), (12, 107), (13, 102), (20, 7), (21, 9),
         (30, 55)],
        "node long, label long",
    )
    got = {
        r["node"]: r["label"]
        for r in min_label_components(seeded, edges).collect()
    }
    assert got == {10: 101, 11: 101, 12: 101, 13: 101, 20: 7, 21: 7,
                   30: 55}


def test_min_label_components_loop_matches_single_task(spark, monkeypatch):
    """Round 11: small graphs take a single-task vectorized fast path
    (operators/graphs._cc_single_task); the distributed BSP loop
    remains the large-graph path. Force the loop by zeroing the
    fast-path bound and assert both paths label a randomish graph
    (chains + cliques + isolates, seeded and unseeded) identically."""
    from pyspark.sql import functions as F  # noqa: F401

    from codex_data_products_spark.operators import graphs

    und = (
        [(i, i + 1) for i in range(100, 140)]          # long chain
        + [(200 + i, 200 + j) for i in range(6) for j in range(i + 1, 6)]
        + [(139, 205)]                                  # chain↔clique bridge
        + [(300, 301), (302, 303), (301, 302)]
    )
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "a long, b long"
    )
    node_ids = sorted({n for e in und for n in e} | {400, 401})
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    seeded = spark.createDataFrame(
        [(n, 10_000 - n) for n in node_ids], "node long, label long"
    )

    def labels(nd, ed):
        return {
            r["node"]: r["label"]
            for r in graphs.min_label_components(nd, ed).collect()
        }

    fast_unseeded, fast_seeded = labels(nodes, edges), labels(seeded, edges)
    monkeypatch.setattr(graphs, "SMALL_GRAPH_EDGES", 0)
    loop_unseeded, loop_seeded = labels(nodes, edges), labels(seeded, edges)
    assert fast_unseeded == loop_unseeded
    assert fast_seeded == loop_seeded
    # sanity: the chain+clique merged through the bridge
    assert fast_unseeded[205] == 100 and fast_unseeded[303] == 300


def test_pagerank_loop_matches_single_task(spark, monkeypatch):
    """Round 12 (VERDICT r11 #8): graphs whose measured edge count fits
    one task take a single-task vectorized kernel
    (operators/graphs._pr_single_task) with the same per-iteration
    HALF_UP rounding; the distributed BSP loop remains the large-graph
    path (and the only path for non-integral weights). Force the loop
    by zeroing the bound and assert both paths rank a graph with
    dangling nodes, no-in-edge nodes and skewed integer weights
    BIT-identically."""
    from codex_data_products_spark.operators import graphs

    rows = (
        [("a", "b", 3), ("b", "c", 1), ("c", "a", 7), ("a", "c", 2)]
        + [("d", "a", 5)]                      # d: no in-edges
        + [("c", "e", 1)]                      # e: dangling (no out)
        + [(f"h{i}", "a", i + 1) for i in range(40)]   # hub fan-in
        + [("a", f"h{i}", 1) for i in range(40)]
    )
    edges = spark.createDataFrame(rows, "src string, dst string, w long")

    def ranks():
        return {
            r["node"]: r["rank"]
            for r in graphs.pagerank(edges, n_iter=4).collect()
        }

    fast = ranks()
    monkeypatch.setattr(graphs, "SMALL_PR_EDGES", 0)
    loop = ranks()
    assert fast == loop  # exact float equality, not approx
    # dangling node e leaks its mass by design, so total < 1 but close
    assert 0.9 < sum(fast.values()) <= 1.0 + 1e-9
    # long node ids exercise the non-string schema branch
    int_edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 1, 1)], "src long, dst long, w long"
    )
    monkeypatch.setattr(graphs, "SMALL_PR_EDGES", 4_000_000)
    fast_i = {
        r["node"]: r["rank"]
        for r in graphs.pagerank(int_edges, n_iter=3).collect()
    }
    monkeypatch.setattr(graphs, "SMALL_PR_EDGES", 0)
    loop_i = {
        r["node"]: r["rank"]
        for r in graphs.pagerank(int_edges, n_iter=3).collect()
    }
    assert fast_i == loop_i
