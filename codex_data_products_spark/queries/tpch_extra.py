"""Extended TPC-H-style suite: correlated subqueries, EXISTS/NOT EXISTS,
scalar subqueries, disjunctive predicates, and ratio aggregates.

The reference engine (hubmapconsortium/codex-data-products) has no query
language — its joins top out at a single broadcast-dim merge
(bin/concatenate.py:300-307) and semi-filters via ``isin``
(bin/concatenate.py:284-286,318-320). This module exercises the
relational surface a drop-in engine must still provide, adapted to the
driver's reduced TPC-H schema (no partsupp; no commit/receipt dates —
"late" is re-expressed as ``l_shipdate > o_orderdate + INTERVAL N DAYS``).

Scale notes (100 TB): every query here is one declarative DataFrame
chain — Catalyst turns EXISTS into left-semi hash joins, NOT EXISTS into
anti joins, and pushes all date/brand/size predicates into the parquet
scan. Self-joins on lineitem shuffle on l_orderkey once and reuse that
exchange; dims (nation/supplier/part at TPC-H proportions) broadcast.
Deterministic money math via functions.compat (exact DECIMAL, round
once at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import (
    dsum,
    money,
    one_minus,
    rate,
    sql_dsum,
    sql_money,
    sql_one_minus,
    sql_rate,
)
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

_REV = f"({sql_money('l_extendedprice')} * {sql_one_minus('l_discount')})"


def _rev() -> F.Column:
    return money("l_extendedprice") * one_minus("l_discount")


# ---------------------------------------------------------------------------
# q4_order_priority — EXISTS → left-semi join (TPC-H Q4 shape; "late"
# adapted to shipdate vs orderdate). At scale: orders and lineitem both
# hash-partition on orderkey; the semi join deduplicates map-side.
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", sql=_Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7: nation-pair trade volume by year. Both
# nation hops broadcast; the orders⋈lineitem join is the only shuffle.
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year, {_REV} AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", sql=_Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q8_market_share — TPC-H Q8: one nation's share of regional PROMO-part
# volume per year. Ratio of two exact decimal sums, rounded once after a
# double division (cross-engine deterministic, see functions.compat).
# ---------------------------------------------------------------------------

_Q8_SQL = f"""
SELECT o_year,
       round(CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                 ELSE 0 END), 2) AS DOUBLE)
             / CAST(round(sum(volume), 2) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", sql=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = T(spark, sf_dir, "customer")
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = _rev()
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                dsum(nation_volume) / dsum(volume),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9 adapted (no partsupp: supply cost proxied
# as 60% of p_retailprice). Profit per supplier nation per year.
# ---------------------------------------------------------------------------

_COST = f"(CAST(0.60 AS {('DECIMAL(4,2)')}) * {sql_money('p_retailprice')} * {sql_money('l_quantity')})"

_Q9_SQL = f"""
SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {_REV} - {_COST} AS amount
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE contains(p_name, 'r')
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", sql=_Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    part = T(spark, sf_dir, "part").filter(F.col("p_name").contains("r"))
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    amount = _rev() - (
        F.lit(0.60).cast("decimal(4,2)") * money("p_retailprice") * money("l_quantity")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10: top-20 customers by returned revenue.
# TakeOrderedAndProject after one agg shuffle on custkey.
# ---------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT c_custkey, c_name, {sql_dsum(_REV)} AS revenue,
       CAST({sql_money('c_acctbal')} AS DOUBLE) AS acctbal, n_name
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", sql=_Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = T(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            money("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
        )
        .agg(dsum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12_priority_shipping — TPC-H Q12 shape (shipmode → ship-year): late
# lines split into high/low priority counts via conditional aggregation.
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY ship_year
"""


@register("q12_priority_shipping", sql=_Q12_SQL)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13_customer_distribution — TPC-H Q13: LEFT OUTER join + two-level agg
# (orders-per-customer histogram). The only query shape whose first agg
# keys on the *join* key — one shuffle serves both the join and the agg.
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON o_custkey = c_custkey
    AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", sql=_Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14: promo share of monthly revenue
# (conditional sum ratio, single scan of lineitem ⋈ broadcast part).
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT round(100.0 * CAST(round(sum(CASE WHEN p_type = 'PROMO'
                                        THEN {_REV} ELSE 0 END), 2) AS DOUBLE)
             / CAST(round(sum({_REV}), 2) AS DOUBLE), 6) AS promo_revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register("q14_promo_revenue", sql=_Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = T(spark, sf_dir, "part")
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(F.lit(100.0) * dsum(promo) / dsum(rev), 6).alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15: scalar subquery over an aggregate (the
# max-revenue supplier). Spark: window max over the agg result — the agg
# output is tiny (|supplier| rows), so the window is a no-shuffle step
# after an AQE-coalesced exchange.
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", sql=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = T(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return best.join(
        F.broadcast(supp), best.supplier_no == supp.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


# ---------------------------------------------------------------------------
# q17_small_quantity — TPC-H Q17: correlated scalar subquery (per-part
# average quantity) decorrelated into an aggregate self-join. At scale
# the per-part agg is tiny relative to lineitem → broadcast back.
# ---------------------------------------------------------------------------

_Q17_SQL = f"""
SELECT round(CAST(round(sum({sql_money('l_extendedprice')}), 2) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS agg_partkey,
         round(CAST(sum({sql_money('l_quantity')}) AS DOUBLE)
               / count(*), 6) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) part_agg ON agg_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 10
  AND l_quantity < 0.5 * avg_qty
"""


@register("q17_small_quantity", sql=_Q17_SQL)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10)
    )
    part_agg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.round(
            F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(part_agg), li.l_partkey == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.round(F.sum(money("l_extendedprice")), 2).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q18_large_volume — TPC-H Q18: HAVING over a big agg feeding an IN
# subquery → semi join on the agg output; orders/lineitem co-partition
# on orderkey so the second pass reuses the exchange.
# ---------------------------------------------------------------------------

_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST({sql_money('o_totalprice')} AS DOUBLE) AS totalprice,
       {sql_dsum(sql_money('l_quantity'))} AS sum_qty
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY c_custkey, c_name, o_orderkey, totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 50
"""


@register("q18_large_volume", sql=_Q18_SQL)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            money("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(dsum(money("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q19_discounted_revenue — TPC-H Q19: three-way disjunctive predicate
# over the join. The join condition stays an equi-join (partkey) with the
# OR-of-ANDs as a post-join filter Catalyst can partially push to both
# scans (brand/size to part; quantity envelope to lineitem).
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {sql_dsum(_REV)} AS revenue, count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_discounted_revenue", sql=_Q19_SQL)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# q21_waiting_supplier — TPC-H Q21 shape: suppliers that were the SOLE
# late shipper in a multi-supplier finished order. EXISTS → left-semi,
# NOT EXISTS → left-anti, both self-joins of lineitem on l_orderkey (one
# exchange, reused three ways).
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
"""


@register("q21_waiting_supplier", sql=_Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = T(spark, sf_dir, "supplier")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    from pyspark import StorageLevel

    # late1 feeds the probe side AND the anti side below — persist the
    # lineitem ⋈ orders join once instead of running it twice
    # (guide §2.4; the two references have different join keys, so
    # exchange reuse never applies)
    late1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    others = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_late = late1.select(
        F.col("l_orderkey").alias("ol_key"), F.col("l_suppkey").alias("ol_supp")
    )
    sole_late = (
        late1.join(
            others,
            (F.col("l_orderkey") == F.col("o_key"))
            & (F.col("l_suppkey") != F.col("o_supp")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l_orderkey") == F.col("ol_key"))
            & (F.col("l_suppkey") != F.col("ol_supp")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q22_global_sales — TPC-H Q22 shape: scalar subquery (global average
# positive balance, broadcast as a 1-row cross join) + NOT EXISTS → anti
# join against orders. Country code proxied by nationkey bucket.
# ---------------------------------------------------------------------------

_Q22_SQL = f"""
SELECT cntrycode, count(*) AS numcust,
       {sql_dsum(sql_money('c_acctbal'))} AS totacctbal
FROM (
  SELECT c_nationkey % 5 AS cntrycode, c_acctbal
  FROM customer c
  WHERE c_acctbal > (
    SELECT round(CAST(sum({sql_money('c_acctbal')}) AS DOUBLE) / count(*), 6)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_totalprice > 350000)
) custsale
GROUP BY cntrycode
"""


@register("q22_global_sales", sql=_Q22_SQL)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_custkey")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.round(
                F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal")).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 essence without partsupp: derive the
# supplier catalog from lineitem history (avg unit price per part ×
# supplier), then pick each part's cheapest EUROPE supplier
# (argmin-per-group via rank-1 window, suppkey tie-break). The derived
# catalog aggregates once on (part, supplier); the window partitions by
# part — both shuffles are on the same key family, and AQE coalesces
# the tiny post-filter output.
# ---------------------------------------------------------------------------

_Q2_SQL = f"""
SELECT p_partkey, p_brand, s_suppkey, s_name, unit_cost
FROM (
  SELECT p_partkey, p_brand, s_suppkey, s_name, unit_cost,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY unit_cost, s_suppkey) AS rn
  FROM (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           round(CAST(sum({sql_money('l_extendedprice')}) AS DOUBLE)
                 / CAST(sum({sql_money('l_quantity')}) AS DOUBLE), 6)
             AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
  ) ps
  JOIN part     ON p_partkey = ps_partkey
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE' AND p_size < 15
)
WHERE rn = 1
ORDER BY unit_cost, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", sql=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(
            F.sum(money("l_extendedprice")).cast("double")
            / F.sum(money("l_quantity")).cast("double"),
            6,
        ).alias("unit_cost")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("ps_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_cost")
        .orderBy("unit_cost", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q11_important_parts — TPC-H Q11 shape without partsupp: parts whose
# revenue exceeds a fraction of GLOBAL revenue. The global total is a
# scalar subquery over the SAME aggregate — Spark computes the per-part
# agg once, derives the 1-row total from it, and broadcasts it back;
# the fact table is scanned once, not twice.
# ---------------------------------------------------------------------------

_Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {sql_dsum(_REV)} AS part_rev
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, part_rev
FROM per_part
WHERE part_rev > (SELECT sum(part_rev) * 0.0008 FROM per_part)
"""


@register("q11_important_parts", sql=_Q11_SQL)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    li = T(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy("l_partkey")
        .agg(dsum(_rev()).alias("part_rev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    threshold = per_part.agg(
        (F.sum("part_rev") * 0.0008).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_rev") > F.col("threshold"))
        .select("l_partkey", "part_rev")
    )


# ---------------------------------------------------------------------------
# q16_supplier_part_count — TPC-H Q16 shape without partsupp: the
# supplier↔part relation is recovered as DISTINCT (l_partkey, l_suppkey)
# pairs from lineitem; "complaint" suppliers are adapted to negative
# account balance (the reference schema has no comment column). NOT IN →
# left-anti join against a tiny broadcast exclusion list; the part
# predicates (brand/type/size) all push into the parquet scan. At scale
# the distinct pair extraction is the only lineitem shuffle and it
# map-side combines; part and the exclusion list broadcast.
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT sp.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
JOIN part ON p_partkey = sp.l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND sp.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_part_count", sql=_Q16_SQL)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    complaints = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        sp.join(
            F.broadcast(complaints),
            sp.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), sp.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q20_excess_stock — TPC-H Q20 shape without partsupp: suppliers in two
# nations whose shipped quantity of 'small%' parts is dominated by old
# stock (total > 2× recent). The nested IN chain becomes two left-semi
# joins; Q20's correlated availqty subquery collapses into one grouped
# aggregate with two conditional sums over the SAME scan — no second
# lineitem pass. Part list and nation dim broadcast; the only shuffle
# is the (suppkey, partkey) groupBy.
# ---------------------------------------------------------------------------

_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) >
           2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                        THEN l_quantity ELSE 0 END)
  )
"""


@register("q20_excess_stock", sql=_Q20_SQL)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem")
    qualified = (
        li.join(
            F.broadcast(small_parts),
            li.l_partkey == small_parts.p_partkey,
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    >= F.lit("1998-01-01").cast("timestamp"),
                    F.col("l_quantity"),
                ).otherwise(F.lit(0.0))
            ).alias("recent_qty"),
        )
        .filter(F.col("total_qty") > 2 * F.col("recent_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nations = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = T(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(nations),
            supp.s_nationkey == nations.n_nationkey,
            "left_semi",
        )
        .join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
