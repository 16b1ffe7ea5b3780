"""Core relational queries: scans, filters, projections, scalar functions.

Covers SURVEY.md §2.1 (S1-S3 scan semantics), §2.3 (F1-F8 filters), §2.8
(E1-E13 scalar functions) on the driver's synthetic tables. Reference
behaviors cited per query; implementations are Spark-first (declarative
DataFrame chains → Catalyst pushes filters/pruning into the parquet scan).

Determinism: money/rate aggregates use exact DECIMAL arithmetic (see
``functions.compat``); every top-k has a unique-key tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import (
    dratio,
    davg,
    dsum,
    money,
    one_minus,
    one_plus,
    rate,
    sql_davg,
    sql_dsum,
    sql_money,
    sql_one_minus,
    sql_one_plus,
    sql_rate,
)
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# q1_pricing_summary — flagship aggregation (SURVEY §2.5 A2/A3: the
# reference consumes per-group sum ("total") and mean ("meanAll") matrices,
# bin/concatenate.py:240-263; here computed as a single hash aggregate with
# map-side partial aggregation, one shuffle on the 2 grouping keys).
# ---------------------------------------------------------------------------

_REV = f"({sql_money('l_extendedprice')} * {sql_one_minus('l_discount')})"
_CHARGE = f"({_REV} * {sql_one_plus('l_tax')})"

_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum(sql_money('l_quantity'))}      AS sum_qty,
  {sql_dsum(sql_money('l_extendedprice'))} AS sum_base_price,
  {sql_dsum(_REV)}                         AS sum_disc_price,
  {sql_dsum(_CHARGE)}                      AS sum_charge,
  {sql_davg(sql_money('l_quantity'))}      AS avg_qty,
  {sql_davg(sql_money('l_extendedprice'))} AS avg_price,
  {sql_davg(sql_rate('l_discount'))}       AS avg_disc,
  count(*)                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", sql=_Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    charge = revenue * one_plus("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity")).alias("sum_qty"),
            dsum(money("l_extendedprice")).alias("sum_base_price"),
            dsum(revenue).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(money("l_quantity")).alias("avg_qty"),
            davg(money("l_extendedprice")).alias("avg_price"),
            davg(rate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3_shipping_priority — broadcast-dim join + agg + deterministic top-k
# (SURVEY §2.4 J1: uuids⋈obs broadcast-hash join, bin/concatenate.py:300-307).
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT
  l_orderkey,
  {sql_dsum(_REV)} AS revenue,
  count(*)         AS n_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", sql=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            dsum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5_region_revenue — multi-way join chain with two dim hops
# (SURVEY §2.4: J1 broadcast joins composed; Catalyst reorders/broadcasts).
# ---------------------------------------------------------------------------

_Q5_SQL = f"""
SELECT
  n_name,
  {sql_dsum(_REV)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_region_revenue", sql=_Q5_SQL)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# filter_regex — F5: the reference drops channels matching
# ^Channel:\d+:\d+$ or containing 'blank' case-insensitively
# (bin/concatenate.py:443-447). Same shape applied to part names.
# ---------------------------------------------------------------------------

_FILTER_REGEX_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT regexp_matches(p_name, '^small .*')
  AND NOT contains(lower(p_name), 'bolt')
  AND regexp_matches(p_brand, '^Brand#[0-9]+$')
"""


@register("filter_regex", sql=_FILTER_REGEX_SQL)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part")
    return part.filter(
        ~F.col("p_name").rlike("^small .*")
        & ~F.lower(F.col("p_name")).contains("bolt")
        & F.col("p_brand").rlike("^Brand#[0-9]+$")
    ).select("p_partkey", "p_name", "p_brand")


# ---------------------------------------------------------------------------
# filter_predicates — F2 (null predicate), F3 (drop-null), F4 (membership),
# F8 (existence): bin/concatenate.py:339-342, make_directory.py:113,
# bin/concatenate.py:284-286, make_uuids_tsv.py:15-34.
# ---------------------------------------------------------------------------

_FILTER_PRED_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_orderpriority NOT LIKE '5%'
  AND o_custkey IS NOT NULL
  AND o_totalprice BETWEEN 1000 AND 400000
"""


@register("filter_predicates", sql=_FILTER_PRED_SQL)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderstatus").isin("F", "P")
        & ~F.col("o_orderpriority").startswith("5")
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").between(1000, 400000)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# ---------------------------------------------------------------------------
# scalar_functions — E1-E7/E13: regex-strip chains (bin/concatenate.py:63-71),
# lower/trim normalize (:74-81), concat_ws global-id construction (:273-275),
# casts (:305), coalesce fallbacks (:256-263), string formatting (:163-168).
# ---------------------------------------------------------------------------

_SCALAR_SQL = f"""
SELECT
  c_custkey,
  regexp_replace(c_name, '^Customer#0*', '')               AS name_id,
  lower(trim(c_mktsegment))                                AS segment_norm,
  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS global_id,
  CAST(round({sql_money('c_acctbal')}, 0) AS BIGINT)       AS acctbal_int,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')      AS segment_bucket,
  substr(c_name, 1, 8)                                     AS name_prefix,
  CAST(length(c_name) AS BIGINT)                           AS name_len
FROM customer
"""


@register("scalar_functions", sql=_SCALAR_SQL)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_replace("c_name", "^Customer#0*", "").alias("name_id"),
        F.lower(F.trim(F.col("c_mktsegment"))).alias("segment_norm"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "global_id"
        ),
        F.round(money("c_acctbal"), 0).cast("long").alias("acctbal_int"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_bucket"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# date_functions — temporal scalar functions over order dates (the
# reference only stamps str(datetime.now()), bin/concatenate.py:433; this
# exercises the full date-part family the harness needs).
# ---------------------------------------------------------------------------

_DATE_SQL = f"""
SELECT
  CAST(year(o_orderdate) AS BIGINT)            AS order_year,
  CAST(month(o_orderdate) AS BIGINT)           AS order_month,
  count(*)                                     AS n_orders,
  {sql_dsum(sql_money('o_totalprice'))}        AS total_price,
  CAST(min(dayofmonth(o_orderdate)) AS BIGINT) AS min_dom,
  CAST(max(quarter(o_orderdate)) AS BIGINT)    AS max_quarter
FROM orders
GROUP BY order_year, order_month
"""


@register("date_functions", sql=_DATE_SQL)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice")).alias("total_price"),
            F.min(F.dayofmonth("o_orderdate")).cast("long").alias("min_dom"),
            F.max(F.quarter("o_orderdate")).cast("long").alias("max_quarter"),
        )
    )


# ---------------------------------------------------------------------------
# json_extraction — E12: nested JSON field gets with defaults over REST
# hits (make_uuids_tsv.py:77-102). events.props is a JSON string column.
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT
  event_type,
  count(*) AS n_events,
  CAST((2 * CAST((sum(CAST(json_extract_string(props, '$.k') AS BIGINT))) AS BIGINT) * 1000000 + CAST((count(*)) AS BIGINT)) // (2 * CAST((count(*)) AS BIGINT)) AS DOUBLE) / 1000000.0
                                                                      AS avg_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT))              AS max_k
FROM events
GROUP BY event_type
"""


@register("json_extraction", sql=_JSON_SQL)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dratio(F.sum(k), F.count(F.lit(1)), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# top_k_orders — ORDER BY + LIMIT with unique-key determinism (SURVEY §2.9:
# absent from the reference; Spark plans TakeOrderedAndProject — no full
# sort, per-partition top-k then merge on the driver).
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("top_k_orders", sql=_TOPK_SQL)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6: the pure scan-filter-agg query (no
# join); at 100 TB this is the bandwidth benchmark — every predicate
# must reach the parquet reader (verified: PushedFilters carries all
# three ranges).
# ---------------------------------------------------------------------------

_Q6_SQL = f"""
SELECT
  {sql_dsum(f"({sql_money('l_extendedprice')} * {sql_rate('l_discount')})")}
    AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", sql=_Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money("l_extendedprice") * rate("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# string_functions — the wider string scalar family (lpad/rpad,
# translate, split_part, left/right, repeat, reverse, position).
# ---------------------------------------------------------------------------

_STRING_SQL = """
SELECT
  s_suppkey,
  lpad(CAST(s_suppkey AS VARCHAR), 8, '0')        AS padded_key,
  rpad(s_name, 20, '.')                           AS padded_name,
  translate(s_name, '#', '-')                     AS translated,
  split_part(s_name, '#', 2)                      AS name_id,
  left(s_name, 8)                                 AS name_left,
  right(s_name, 2)                                AS name_right,
  reverse(s_name)                                 AS name_rev,
  repeat('ab', 3)                                 AS repeated,
  CAST(strpos(s_name, '#') AS BIGINT)             AS hash_pos
FROM supplier
"""


@register("string_functions", sql=_STRING_SQL)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = T(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.rpad("s_name", 20, ".").alias("padded_name"),
        F.translate("s_name", "#", "-").alias("translated"),
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias("name_id"),
        F.substring("s_name", 1, 8).alias("name_left"),
        F.substring(F.col("s_name"), -2, 2).alias("name_right"),
        F.reverse(F.col("s_name").cast("string")).alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.instr("s_name", "#").cast("long").alias("hash_pos"),
    )


# ---------------------------------------------------------------------------
# null_semantics — the null-handling contract: NULL forms its own group,
# count(col) skips nulls while count(*) doesn't, null-safe equality
# (<=> / IS NOT DISTINCT FROM) matches nulls, and coalesce rewrites the
# null group label. The testdata has no null columns, so the nullable
# key is derived with nullif — the semantics under test are the same.
# ---------------------------------------------------------------------------

_NULL_SQL = """
SELECT coalesce(seg, '<null>')          AS seg_label,
       count(*)                         AS n_rows,
       count(seg)                       AS n_nonnull,
       CAST(sum(CASE WHEN seg IS NOT DISTINCT FROM 'MACHINERY'
                     THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_machinery,
       CAST(sum(CASE WHEN seg = 'MACHINERY'
                     THEN 1 ELSE 0 END) AS BIGINT) AS eq_machinery,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM (SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_nationkey FROM customer)
GROUP BY seg
"""


@register("null_semantics", sql=_NULL_SQL)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    staged = cust.select(seg.alias("seg"), "c_nationkey")
    return (
        staged.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("seg").alias("n_nonnull"),
            F.sum(
                F.when(F.col("seg").eqNullSafe(F.lit("MACHINERY")), 1).otherwise(0)
            )
            .cast("long")
            .alias("nullsafe_machinery"),
            F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0))
            .cast("long")
            .alias("eq_machinery"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
        )
        .select(
            F.coalesce(F.col("seg"), F.lit("<null>")).alias("seg_label"),
            "n_rows",
            "n_nonnull",
            "nullsafe_machinery",
            "eq_machinery",
            "n_nations",
        )
    )


# ---------------------------------------------------------------------------
# try_arithmetic — ANSI-mode safety functions: Spark 4 runs ANSI SQL
# (division by zero THROWS), so production pipelines use try_divide /
# try_* to get null-on-error semantics without disabling ANSI. The
# oracle emulates with explicit CASE guards — same contract. Null
# ratios are summed as exact decimals (order-free) for determinism.
# ---------------------------------------------------------------------------

_TRY_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_by_zero,
       CAST(round(sum(CASE WHEN l_quantity <> 25
                     THEN CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
                               / (l_quantity - 25), 6) AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END), 6) AS DOUBLE)
         AS sum_safe_ratio
FROM lineitem
GROUP BY l_returnflag
"""


@register("try_arithmetic", sql=_TRY_SQL)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    ratio = F.try_divide(money("l_extendedprice"), F.col("l_quantity") - 25)
    safe = F.coalesce(
        F.round(ratio, 6).cast("decimal(18,6)"), F.lit(0).cast("decimal(18,6)")
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(ratio.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_div_by_zero"),
        F.round(F.sum(safe), 6).cast("double").alias("sum_safe_ratio"),
    )
