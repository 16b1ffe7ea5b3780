"""Aggregations — SURVEY.md §2.5 (A1-A5) plus distinct/rollup/cube.

All are single-shuffle hash aggregates with map-side partial aggregation;
collect-list shapes are made deterministic by sorting (the driver's value
hash is order-insensitive across *rows* but not inside a string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import davg, dsum, money, sql_davg, sql_dsum, sql_money
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# agg_distinct — distinct aggregates (absent from the reference,
# SURVEY §2.5 note; Spark expands to a two-phase aggregate).
# ---------------------------------------------------------------------------

_DISTINCT_SQL = """
SELECT
  c_mktsegment,
  count(DISTINCT c_nationkey) AS n_nations,
  count(*)                    AS n_customers
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_distinct", sql=_DISTINCT_SQL)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# agg_stats — A1 (count) + min/max/sum/avg family over money columns
# (deterministic decimal arithmetic, see functions.compat).
# ---------------------------------------------------------------------------

_STATS_SQL = f"""
SELECT
  c_nationkey,
  count(*)                              AS n_customers,
  min(c_acctbal)                        AS min_bal,
  max(c_acctbal)                        AS max_bal,
  {sql_dsum(sql_money('c_acctbal'))}    AS sum_bal,
  {sql_davg(sql_money('c_acctbal'))}    AS avg_bal
FROM customer
GROUP BY c_nationkey
"""


@register("agg_stats", sql=_STATS_SQL)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        dsum(money("c_acctbal")).alias("sum_bal"),
        davg(money("c_acctbal")).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# agg_collect_sorted — A4: the reference collects uuid/hubmap_id lists for
# the manifest (bin/concatenate.py:342). Deterministic form: sorted
# collect_set joined to a string.
# ---------------------------------------------------------------------------

_COLLECT_SQL = """
SELECT
  c_nationkey,
  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
  count(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""


@register("agg_collect_sorted", sql=_COLLECT_SQL)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# agg_first_match — A5: the reference takes the first matching antibody row
# per name (bin/concatenate.py:212-220). Deterministic re-expression:
# min_by over a unique key (arg_min in DuckDB).
# ---------------------------------------------------------------------------

_FIRST_SQL = """
SELECT
  p_brand,
  arg_min(p_type, p_partkey) AS first_type,
  min(p_partkey)             AS first_partkey,
  count(*)                   AS n_parts
FROM part
GROUP BY p_brand
"""


@register("agg_first_match", sql=_FIRST_SQL)
def agg_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.min_by("p_type", "p_partkey").alias("first_type"),
        F.min("p_partkey").alias("first_partkey"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# agg_rollup / agg_cube — hierarchical aggregates (absent from the
# reference, SURVEY §2.5 note; Spark Expand operator feeds one hash agg).
# Subtotal rows carry NULL group keys in both engines.
# ---------------------------------------------------------------------------

_ROLLUP_SQL = f"""
SELECT
  r_name,
  n_name,
  count(*)                           AS n_customers,
  {sql_dsum(sql_money('c_acctbal'))} AS sum_bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("agg_rollup", sql=_ROLLUP_SQL)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(money("c_acctbal")).alias("sum_bal"),
    )


_CUBE_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", sql=_CUBE_SQL)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# agg_variance — population variance/stddev from exact decimal moments
# (sum, sum of squares): order-free, so both engines agree bit-for-bit —
# the same exactness rule the streaming anomaly operator uses.
# ---------------------------------------------------------------------------

_VARIANCE_SQL = """
WITH m AS (
  SELECT
    l_returnflag,
    count(*) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  round(s2 / n - (s1 / n) * (s1 / n), 6)       AS var_pop,
  round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS stddev_pop
FROM m
"""


@register("agg_variance", sql=_VARIANCE_SQL)
def agg_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    var = F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (
        F.col("s1") / F.col("n")
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_pop"),
        F.round(F.sqrt(var), 6).alias("stddev_pop"),
    )


# ---------------------------------------------------------------------------
# agg_correlation — Pearson correlation from the five exact decimal
# moments (n, Σx, Σy, Σx², Σy², Σxy): the sums are order-free DECIMAL,
# so any partitioning produces identical moments, and the one float
# expression at the end is evaluated with the same IEEE ops in both
# engines. The built-in corr() is a float running aggregate whose
# result depends on row order — unusable for a cross-engine gate.
# ---------------------------------------------------------------------------

_CORR_SQL = """
WITH m AS (
  SELECT
    l_returnflag,
    count(*) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)       AS sx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)  AS sy,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)     AS sxx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag, n,
  round((n * sxy - sx * sy)
        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
  round((n * sxy - sx * sy) / (n * CAST(n AS DOUBLE)), 6)     AS covar_pop
FROM m
"""


@register("agg_correlation", sql=_CORR_SQL)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    covar = (n * sxy - sx * sy) / (n * n.cast("double"))
    return m.select(
        "l_returnflag",
        "n",
        F.round(corr, 6).alias("corr_qty_price"),
        F.round(covar, 6).alias("covar_pop"),
    )


# ---------------------------------------------------------------------------
# agg_listagg — ordered string aggregation (LISTAGG / string_agg): the
# report-formatting aggregate. Determinism rule: ALWAYS sort before
# joining — collect_list order is partition-dependent, so the unsorted
# variant is nondeterministic on ANY parallel engine. Spark builds it
# as array_join(array_sort(collect_set(...))) — one hash agg, no extra
# shuffle over the plain distinct-agg.
# ---------------------------------------------------------------------------

_LISTAGG_SQL = """
SELECT n_name,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
         AS segments,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
FROM customer JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
"""


@register("agg_listagg", sql=_LISTAGG_SQL)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    return (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
        )
    )


# ---------------------------------------------------------------------------
# orders_time_rollup — the BI time-hierarchy rollup (year → quarter →
# month) with grouping_id distinguishing subtotal levels. One pass,
# partial+final agg per grouping set; at 100 TB a date-partitioned
# fact table prunes to the requested years before the rollup runs.
# ---------------------------------------------------------------------------

_TIME_ROLLUP_SQL = f"""
SELECT
  CAST(year(o_orderdate) AS BIGINT)    AS o_year,
  CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
  CAST(month(o_orderdate) AS BIGINT)   AS o_month,
  CAST(grouping(o_year) * 4
     + grouping(o_quarter) * 2
     + grouping(o_month) AS BIGINT) AS gid,
  count(*) AS n_orders,
  {sql_dsum(sql_money('o_totalprice'))} AS revenue
FROM orders
GROUP BY ROLLUP (o_year, o_quarter, o_month)
"""


@register("orders_time_rollup", sql=_TIME_ROLLUP_SQL)
def orders_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("long").alias("o_year")
    q = F.quarter("o_orderdate").cast("long").alias("o_quarter")
    m = F.month("o_orderdate").cast("long").alias("o_month")
    return (
        orders.rollup(y, q, m)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# pivot_multi_agg — pivot with TWO aggregates per cell (count + exact
# decimal revenue): Spark's pivot produces the {value}_{agg} column
# grid natively; the oracle spells each cell as a conditional
# aggregate. Same single-shuffle plan as a plain groupBy — pivot is
# projection sugar, not an extra pass.
# ---------------------------------------------------------------------------

_PIVOT_MULTI_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F_n,
       {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN " + sql_money('o_totalprice') + " ELSE 0 END")} AS F_rev,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O_n,
       {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN " + sql_money('o_totalprice') + " ELSE 0 END")} AS O_rev,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P_n,
       {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN " + sql_money('o_totalprice') + " ELSE 0 END")} AS P_rev
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_multi_agg", sql=_PIVOT_MULTI_SQL)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(money("o_totalprice")).alias("rev"),
        )
    )
