"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths per SURVEY's extension mandate:
  * brute-force cosine top-k — the exactness baseline; a cross join of a
    small broadcast query set against the corpus (linear scan, the thing
    you fall back to when recall must be 1.0);
  * IVF-style top-k — the 100 TB scale path: the corpus is coarsely
    partitioned (here the ``label`` column stands in for a k-means cell
    assignment) and each query probes only its own cell, cutting the
    scanned fraction to 1/n_cells. Same code shape works with real
    centroids: assign label = argmin distance at write time.

Determinism: ranking is by *rounded* cosine with a vec_id tie-break so
both engines cut identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.queries.dedup import cosine_expr
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import spread, table as T

QUERY_STRIDE = 50  # every 50th vector is a query
TOP_K = 5

_SQL_COS = (
    "round(list_dot_product(q.v, c.v)"
    " / sqrt(list_dot_product(q.v, q.v) * list_dot_product(c.v, c.v)), 6)"
)

_BRUTE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT * FROM e WHERE vec_id % {QUERY_STRIDE} = 0),
c AS (SELECT * FROM e),
scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    {_SQL_COS} AS cosine,
    row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY {_SQL_COS} DESC, c.vec_id
    ) AS rn
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= {TOP_K}
"""


@register("knn_brute_force", sql=_BRUTE_SQL)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = F.round(cosine_expr(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        spread(emb, "vec_id").join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT * FROM e WHERE vec_id % {QUERY_STRIDE} = 0),
c AS (SELECT * FROM e),
scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    {_SQL_COS} AS cosine,
    row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY {_SQL_COS} DESC, c.vec_id
    ) AS rn
  FROM q JOIN c ON q.label = c.label AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= {TOP_K}
"""


@register("knn_ivf", sql=_IVF_SQL)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    cos = F.round(cosine_expr(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        spread(emb, "vec_id").join(
            F.broadcast(queries),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )
