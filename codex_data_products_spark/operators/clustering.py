"""Clustering operators: distributed Lloyd's k-means over an embedding
column.

The iterative-ML counterpart of the connected-components loop (see
queries/dedup.py): each round is one broadcast assignment pass plus one
decimal-exact centroid aggregate, with ``localCheckpoint`` truncating
lineage so the plan does not grow with the iteration count. Used to
*train* the IVF cells that ``knn_ivf`` probes — the knn_recall
operator showed the synthetic ``label`` column is not a cosine
clustering, which is exactly the situation where you re-train cells.

Determinism: initialization is farthest-point (the vector with the
minimum id seeds cluster 0; each next seed is the vector farthest from
all chosen seeds, ties on the lower id) — no RNG, and unlike modulo or
random init it cannot collapse symmetric blobs into one cell.
Assignment ties break on the lower cluster id and centroid sums
aggregate in DECIMAL, so the same run twice is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _centroids_of(assigned: DataFrame, cluster_col: str) -> DataFrame:
    """(cluster, cvec): decimal-exact per-dimension means."""
    longf = assigned.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode("v").alias("dim", "c"),
    ).select(
        "cluster", "dim", F.col("c").cast("decimal(20,10)").alias("c")
    )
    cent = longf.groupBy("cluster", "dim").agg(
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("cv")
    )
    return (
        cent.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("p"))
        .select(
            "cluster", F.transform("p", lambda s: s["cv"]).alias("cvec")
        )
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means → (assignments, centroids).

    assignments: (vec_id, cluster); centroids: (cluster, cvec).
    Stops early when no vector changes cluster. Each iteration is one
    broadcast nested-loop over k centroids (k is small by definition)
    plus one hash aggregate — no corpus self-join anywhere.
    """
    base = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).localCheckpoint()

    def _seed_frame(seeds):
        # Arrow-backed local relation: a list-of-rows createDataFrame
        # is a defaultParallelism-partition Python RDD — every job
        # referencing it pays one Python worker round-trip per
        # partition (round 11; see streaming/dedup_ivm._empty)
        import pandas as pd

        return base.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "c_id": pd.array(
                        [s[0] for s in seeds], dtype="int32"
                    ),
                    "cvec": [list(s[1]) for s in seeds],
                }
            ),
            schema="c_id int, cvec array<double>",
        )

    # farthest-point init: k driver-side argmax rounds (k is small)
    first = base.orderBy("vec_id").limit(1).collect()[0]
    seeds = [(0, list(first["v"]))]
    for i in range(1, k):
        seed_df = F.broadcast(_seed_frame(seeds))
        d2 = (
            _dot(F.col("v"), F.col("v"))
            - 2 * _dot(F.col("v"), F.col("cvec"))
            + _dot(F.col("cvec"), F.col("cvec"))
        )
        farthest = (
            base.crossJoin(seed_df)
            .select("vec_id", "v", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("dmin"), F.first("v").alias("v"))
            .orderBy(F.col("dmin").desc(), F.col("vec_id"))
            .limit(1)
            .collect()[0]
        )
        seeds.append((i, list(farthest["v"])))
    seed_df = F.broadcast(_seed_frame(seeds))
    d2_init = (
        _dot(F.col("v"), F.col("v"))
        - 2 * _dot(F.col("v"), F.col("cvec"))
        + _dot(F.col("cvec"), F.col("cvec"))
    )
    assigned = (
        base.crossJoin(seed_df)
        .select("vec_id", "v", "c_id", d2_init.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(F.col("c_id"), F.struct("d2", "c_id")).alias("cluster"),
            F.first("v").alias("v"),
        )
        .select("vec_id", "v", F.col("cluster").cast("int").alias("cluster"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        cents = F.broadcast(
            _centroids_of(assigned, "cluster").withColumnRenamed(
                "cluster", "c_id"
            )
        )
        d2 = (
            _dot(F.col("v"), F.col("v"))
            - 2 * _dot(F.col("v"), F.col("cvec"))
            + _dot(F.col("cvec"), F.col("cvec"))
        )
        best = (
            base.crossJoin(cents)
            .select("vec_id", "v", "c_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.col("c_id"), F.struct("d2", "c_id")
                ).alias("cluster"),
                F.first("v").alias("_drop"),
            )
            .drop("_drop")
            .join(base, "vec_id")
            .select("vec_id", "v", F.col("cluster").cast("int").alias("cluster"))
            .localCheckpoint()
        )
        moved = (
            best.alias("n")
            .join(assigned.alias("o"), "vec_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        assigned = best
        if moved == 0:
            break

    return (
        assigned.select("vec_id", "cluster"),
        _centroids_of(assigned, "cluster"),
    )


def within_cluster_ss(assigned_vectors: DataFrame, centroids: DataFrame) -> float:
    """Total within-cluster sum of squared distances (the k-means
    objective) — for convergence tests and elbow diagnostics."""
    joined = assigned_vectors.join(centroids, "cluster")
    d2 = (
        _dot(F.col("v"), F.col("v"))
        - 2 * _dot(F.col("v"), F.col("cvec"))
        + _dot(F.col("cvec"), F.col("cvec"))
    )
    row = joined.agg(F.sum(d2).alias("ss")).collect()[0]
    return float(row["ss"])


def auto_nprobe(
    n_cells: int,
    expected_scan_frac: float,
    target_scan_frac: float = 0.2,
    lo: int = 1,
    hi: int | None = None,
) -> int:
    """Choose the IVF probe count FROM THE MEASURED INDEX BALANCE (the
    ``knn_ivf_cell_balance`` audit) — the ANN twin of how
    ``join_cardinality`` feeds ``plan_join``: measure, then let the
    measurement pick the plan.

    ``expected_scan_frac`` is the audit's nprobe=1 expected scan
    fraction Σ(n_c/N)² (queries land in cells proportionally to cell
    mass). Each extra probe adds roughly that fraction again, so the
    largest probe count that keeps expected scanned vectors within the
    ``target_scan_frac`` budget is ``target / esf``, floored. On a
    balanced index (esf = 1/n_cells) this buys ``target · n_cells``
    probes of recall headroom; on a skewed index (esf → hot-cell mass)
    it backs off toward 1 — scanning the hot cell once already costs
    the budget, and extra probes would blow it without the recall
    payoff. Clamped to [lo, hi]; hi defaults to the cell count."""
    if expected_scan_frac <= 0:
        raise ValueError("expected_scan_frac must be positive")
    hi = n_cells if hi is None else hi
    need = int(target_scan_frac / expected_scan_frac)
    return max(lo, min(hi, need))
