"""Set operations — SURVEY.md §2.7 (U1-U3) plus intersect/except.

U1 (outer union-by-name) is THE core operator of the reference
(anndata.concat(join="outer"), bin/concatenate.py:412); in Spark it is
``unionByName(allowMissingColumns=True)`` — a zero-shuffle narrow op.
U3 (block-diagonal graph union) degenerates to a plain union because the
engine keys edges by globally-unique string ids instead of positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# union_by_name — U1: vertical union with outer schema alignment; the
# missing column is null-filled exactly as anndata's outer concat
# materializes missing channels (bin/concatenate.py:412).
# ---------------------------------------------------------------------------

_UNION_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders WHERE o_orderstatus = 'F'
UNION ALL BY NAME
SELECT o_orderkey, o_totalprice, o_orderstatus, NULL AS o_orderpriority
FROM orders WHERE o_orderstatus = 'O'
"""


@register("union_by_name", sql=_UNION_SQL)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    left = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    # Different column order + a missing column: unionByName aligns by
    # name and null-fills, like the reference's outer concat.
    right = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return left.unionByName(right, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# set_intersect — U2: the reference's order-preserving list intersection
# (bin/concatenate.py:251-254) as a distinct INTERSECT on the key set.
# ---------------------------------------------------------------------------

_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_intersect", sql=_INTERSECT_SQL)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# ---------------------------------------------------------------------------
# set_except_all — multiset difference (absent from the reference; Spark
# built-in exceptAll ↔ ANSI EXCEPT ALL).
# ---------------------------------------------------------------------------

_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_except_all", sql=_EXCEPT_SQL)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


# ---------------------------------------------------------------------------
# block_diag_union — U3: the reference merges per-dataset adjacency
# matrices via scipy block_diag with positional offsets
# (bin/concatenate.py:333-336,413-416). With globally-unique string keys
# (E3: concat_ws global ids, bin/concatenate.py:273-275) the block-diagonal
# structure is free: a plain unionByName of per-partition edge frames.
# Emulated here by splitting events into per-type "datasets" and unioning
# with constructed global ids.
# ---------------------------------------------------------------------------

_BLOCK_SQL = """
SELECT concat_ws('-', 'click', CAST(event_id AS VARCHAR)) AS global_id,
       user_id, value
FROM events WHERE event_type = 'click'
UNION ALL
SELECT concat_ws('-', 'view', CAST(event_id AS VARCHAR)) AS global_id,
       user_id, value
FROM events WHERE event_type = 'view'
"""


@register("block_diag_union", sql=_BLOCK_SQL)
def block_diag_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")

    def block(etype: str) -> DataFrame:
        return events.filter(F.col("event_type") == etype).select(
            F.concat_ws("-", F.lit(etype), F.col("event_id").cast("string")).alias(
                "global_id"
            ),
            "user_id",
            "value",
        )

    return block("click").unionByName(block("view"))
