"""Advanced relational operators beyond the reference's own surface
(SURVEY §2.4/§2.5/§2.9 "not present in reference" rows): range join,
RANGE window frames, exact percentiles, GROUPING SETS, and the
conditional/math scalar family.

Scale notes: the range join broadcasts the 25-row band dim (a
non-equi broadcast-nested-loop over a tiny side — the only sane plan;
an equi-join rewrite via floor(price/width) would be used if bands were
uniform and numerous). The RANGE frame sorts within customer partitions
only. GROUPING SETS computes one shuffle wide-agg with grouping-id
expansion, not three separate scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import dsum, money
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# join_range — non-equi (range) join of orders against 25 price bands
# derived from nation keys (lo = key*20k, hi = lo+20k).
# ---------------------------------------------------------------------------

BAND_WIDTH = 20_000

_RANGE_SQL = f"""
WITH bands AS (
  SELECT n_nationkey AS band_idx,
         n_nationkey * {BAND_WIDTH} AS lo,
         (n_nationkey + 1) * {BAND_WIDTH} AS hi
  FROM nation
)
SELECT
  b.band_idx,
  count(*) AS n_orders,
  round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2)::DOUBLE AS total_price
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_idx
"""


@register("join_range", sql=_RANGE_SQL)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    nation = T(spark, sf_dir, "nation")
    bands = nation.select(
        F.col("n_nationkey").alias("band_idx"),
        (F.col("n_nationkey") * BAND_WIDTH).alias("lo"),
        ((F.col("n_nationkey") + 1) * BAND_WIDTH).alias("hi"),
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# window_range_frame — RANGE BETWEEN 30 PRECEDING AND CURRENT ROW over
# epoch-day order time per customer: 30-day trailing spend.
# ---------------------------------------------------------------------------

_RANGE_FRAME_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', TIMESTAMP '1990-01-01', o_orderdate) AS day_no,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
)
SELECT
  o_orderkey,
  o_custkey,
  CAST(day_no AS BIGINT) AS day_no,
  round(sum(price) OVER (
    PARTITION BY o_custkey ORDER BY day_no
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
  ), 2)::DOUBLE AS trailing_30d_spend
FROM o
"""


@register("window_range_frame", sql=_RANGE_FRAME_SQL)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1990-01-01")).cast("long").alias(
            "day_no"
        ),
        money("o_totalprice").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day_no",
        F.round(F.sum("price").over(w), 2)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------------------
# agg_percentiles — exact continuous percentiles (sort-based agg; both
# engines interpolate a + (b-a)*frac with IEEE doubles).
# ---------------------------------------------------------------------------

_PCT_SQL = """
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS q25,
  quantile_cont(l_quantity, 0.5)  AS q50,
  quantile_cont(l_quantity, 0.75) AS q75,
  quantile_cont(l_quantity, 0.9)  AS q90
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentiles", sql=_PCT_SQL)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.expr("percentile(l_quantity, 0.9)").alias("q90"),
    )


# ---------------------------------------------------------------------------
# agg_grouping_sets — explicit GROUPING SETS with grouping_id (cube and
# rollup live in aggregates.py; this is the general form).
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
  count(*) AS n_rows,
  round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2)::DOUBLE AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", sql=_GSETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
            AS gid,
          count(*) AS n_rows,
          CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
            AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# conditional_math — CASE/IF/NULLIF/GREATEST/LEAST + the deterministic
# math scalar family (abs/floor/ceil/sign/mod/sqrt/integer power).
# ---------------------------------------------------------------------------

_COND_SQL = """
SELECT
  l_orderkey,
  l_linenumber,
  CASE WHEN l_quantity < 10 THEN 'low'
       WHEN l_quantity < 35 THEN 'mid'
       ELSE 'high' END                                   AS qty_bucket,
  greatest(l_quantity, 25.0)                             AS qty_floor25,
  least(l_quantity, 25.0)                                AS qty_cap25,
  nullif(l_quantity, 50.0)                               AS qty_not_max,
  abs(l_quantity - 25.0)                                 AS dist_from_25,
  floor(l_quantity / 7.0)                                AS qty_div7,
  ceil(l_quantity / 7.0)                                 AS qty_div7_up,
  CAST(sign(l_quantity - 25.0) AS DOUBLE)                AS sign_off_mid,
  -- floor() BEFORE the integer cast: DuckDB casts 25.5 -> 26
  -- (round-to-nearest) where Spark truncates to 25, so a bare cast
  -- diverges on fractional quantities (the supplier_concentration
  -- contract; caught by the sf0.5 stress sweep's fractional rows)
  CAST(CAST(floor(l_quantity) AS BIGINT) % 7 AS BIGINT)  AS qty_mod7,
  sqrt(l_quantity)                                       AS qty_sqrt,
  l_quantity * l_quantity                                AS qty_sq
FROM lineitem
"""


@register("conditional_math", sql=_COND_SQL)
def conditional_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(q < 10, "low").when(q < 35, "mid").otherwise("high").alias(
            "qty_bucket"
        ),
        F.greatest(q, F.lit(25.0)).alias("qty_floor25"),
        F.least(q, F.lit(25.0)).alias("qty_cap25"),
        F.nullif(q, F.lit(50.0)).alias("qty_not_max"),
        F.abs(q - 25.0).alias("dist_from_25"),
        F.floor(q / 7.0).cast("double").alias("qty_div7"),
        F.ceil(q / 7.0).cast("double").alias("qty_div7_up"),
        F.signum(q - 25.0).cast("double").alias("sign_off_mid"),
        (F.floor(q).cast("long") % 7).cast("long").alias("qty_mod7"),
        F.sqrt(q).alias("qty_sqrt"),
        (q * q).alias("qty_sq"),
    )


# ---------------------------------------------------------------------------
# array_functions — the array scalar family (construct, sort, distinct,
# set-ops, slice, search, fold) as row-local operations on tokenized
# part names. No shuffle at all: one codegen stage over the scan.
# ---------------------------------------------------------------------------

_ARRAY_SQL = r"""
SELECT p_partkey,
       array_to_string(words, '|')                        AS words,
       array_to_string(list_sort(words), '|')             AS words_sorted,
       array_to_string(list_sort(list_distinct(words)), '|') AS words_distinct,
       CAST(len(words) AS BIGINT)                         AS n_words,
       list_contains(words, 'red')                        AS has_red,
       array_to_string(words[1:2], '|')                   AS first_two,
       -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
       coalesce(array_to_string(list_sort(list_intersect(words, ['red', 'blue', 'small'])), '|'), '')
                                                          AS color_hits,
       CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
                                                          AS total_chars,
       array_to_string(list_reverse(words), '-')          AS joined
FROM (
  SELECT p_partkey, string_split(p_name, ' ') AS words FROM part
)
"""


@register("array_functions", sql=_ARRAY_SQL)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("words")
    )
    # Arrays stay internal; every output column is serialized with
    # array_join so the registry contract (scalar-only output schemas,
    # tests/test_oracle_module.py) holds and external comparators can
    # hash rows. The array ops themselves are still exercised.
    return part.select(
        "p_partkey",
        F.array_join("words", "|").alias("words"),
        F.array_join(F.sort_array("words"), "|").alias("words_sorted"),
        # sorted: DuckDB's list_distinct does not preserve element order
        F.array_join(F.sort_array(F.array_distinct("words")), "|").alias(
            "words_distinct"
        ),
        F.size("words").cast("long").alias("n_words"),
        F.array_contains("words", "red").alias("has_red"),
        F.array_join(F.slice("words", 1, 2), "|").alias("first_two"),
        F.array_join(
            F.sort_array(
                F.array_intersect(
                    "words", F.array(F.lit("red"), F.lit("blue"), F.lit("small"))
                )
            ),
            "|",
        ).alias("color_hits"),
        F.aggregate(
            F.transform("words", F.length), F.lit(0), lambda a, x: a + x
        )
        .cast("long")
        .alias("total_chars"),
        # reversed-order join: exercises reverse(), a distinct path from
        # words_sorted (ADVICE r2: the two were byte-identical before)
        F.array_join(F.reverse("words"), "-").alias("joined"),
    )


# ---------------------------------------------------------------------------
# map_functions — the map scalar family (construct, extract, keys,
# cardinality, null-safe miss) used for E11-style code→description
# lookups when the dim is tiny enough to inline as a literal map.
# Row-local; maps never reach the output schema (cross-engine map
# comparison is ill-defined — extract to scalars instead).
# ---------------------------------------------------------------------------

_MAP_SQL = """
SELECT p_partkey,
       m['brand'][1]                      AS brand_val,
       m['type'][1]                       AS type_val,
       array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted,
       CAST(cardinality(m) AS BIGINT)     AS n_keys,
       coalesce(m['missing'][1], 'none')  AS miss
FROM (
  SELECT p_partkey, MAP {'brand': p_brand, 'type': p_type} AS m FROM part
)
"""


@register("map_functions", sql=_MAP_SQL)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.create_map(
            F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
        ).alias("m"),
    )
    return part.select(
        "p_partkey",
        F.try_element_at("m", F.lit("brand")).alias("brand_val"),
        F.try_element_at("m", F.lit("type")).alias("type_val"),
        F.array_join(F.sort_array(F.map_keys("m")), "|").alias("keys_sorted"),
        F.size("m").cast("long").alias("n_keys"),
        F.coalesce(F.try_element_at("m", F.lit("missing")), F.lit("none")).alias(
            "miss"
        ),
    )


# ---------------------------------------------------------------------------
# agg_mad — median absolute deviation: the robust dispersion measure
# needs TWO dependent passes (median, then median of |x - median|),
# the canonical "aggregate of an aggregate" shape. The per-group
# medians are a |groups|-row table broadcast back onto the fact scan —
# same decorrelation pattern as Q17 — so at 100 TB the cost is two
# scans and two sort-aggs, never a correlated per-row subquery.
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(any_value(m.med), 6) AS median_qty,
       round(quantile_cont(abs(l.l_quantity - m.med), 0.5), 6) AS mad_qty
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag
"""


@register("agg_mad", sql=_MAD_SQL)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.first("med"), 6).alias("median_qty"),
            F.round(
                F.expr("percentile(abs(l_quantity - med), 0.5)"), 6
            ).alias("mad_qty"),
        )
    )


# ---------------------------------------------------------------------------
# lateral_topk — correlated LATERAL subquery through the raw SQL
# surface: top-2 suppliers per nation, written as spark.sql() over
# temp views instead of the DataFrame API (every other query here is
# DataFrame-first; this one proves the engine's SQL entry point is the
# same Catalyst plan). Spark decorrelates the LATERAL into a ranked
# window + filter — identical physical shape to the argmin pattern in
# q2 — so nothing is executed per-outer-row.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.s_name, t.s_acctbal, t.rnk
FROM nation n,
LATERAL (
  SELECT s_name, s_acctbal,
         CAST(row_number() OVER (ORDER BY s_acctbal DESC, s_name)
              AS BIGINT) AS rnk
  FROM supplier s WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT 2
) t
"""


@register("lateral_topk", sql=_LATERAL_SQL)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "nation"):
        T(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# agg_distinct_hll — COUNT(DISTINCT) vs a portable HyperLogLog sketch
# (operators/sketches.py): md5-derived 63-bit hashes, integer-only
# register ranks, and an exact-integer harmonic sum make the estimate
# the same IEEE double on both engines — so even the approximate path
# is hash-checkable. At 100 TB the register table (64 rows per group)
# is mergeable across partitions/days, which exact distinct is not;
# the query reports both plus the realized relative error.
# ---------------------------------------------------------------------------

from codex_data_products_spark.operators.sketches import (  # noqa: E402
    HLL_ALPHA,
    HLL_LOW_BITS,
    HLL_M,
    _HLL_RMAX,
    hll_estimate,
    hll_register_rows,
)

_HLL_SQL = f"""
WITH items AS (
  SELECT o_orderstatus AS g, CAST(o_custkey AS VARCHAR) AS item FROM orders
),
h AS (
  SELECT g,
         (CAST(concat('0x', substring(md5(item), 1, 1)) AS BIGINT) % 8)
           * (CAST(1 AS BIGINT) << 60)
         + CAST(concat('0x', substring(md5(item), 2, 15)) AS BIGINT) AS hv
  FROM items
),
reg AS (
  SELECT g, hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} > 0
                  THEN {HLL_LOW_BITS} - length(format('{{:b}}', hv // {HLL_M})) + 1
                  ELSE {HLL_LOW_BITS + 1} END) AS rank
  FROM h GROUP BY g, hv % {HLL_M}
),
est AS (
  SELECT g,
         round({HLL_ALPHA} * {HLL_M * HLL_M} * pow(2.0, {_HLL_RMAX})
               / CAST(sum(CAST(pow(2.0, {_HLL_RMAX} - rank) AS DECIMAL(38,0)))
                      + CAST({HLL_M} - count(*) AS DECIMAL(38,0))
                        * CAST(pow(2.0, {_HLL_RMAX}) AS DECIMAL(38,0))
                      AS DOUBLE), 4) AS hll_estimate
  FROM reg GROUP BY g
),
ex AS (
  SELECT g, count(DISTINCT item) AS exact_distinct FROM items GROUP BY g
)
SELECT ex.g AS o_orderstatus,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       est.hll_estimate,
       round(abs(est.hll_estimate - ex.exact_distinct)
             / ex.exact_distinct, 4) AS rel_err
FROM ex JOIN est ON est.g = ex.g
"""


@register("agg_distinct_hll", sql=_HLL_SQL)
def agg_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = T(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"),
        F.col("o_custkey").cast("string").alias("item"),
    )
    registers = hll_register_rows(items, "item", ["g"])
    est = hll_estimate(registers, ["g"])
    exact = items.groupBy("g").agg(
        F.count_distinct("item").alias("exact_distinct")
    )
    return exact.join(est, "g").select(
        F.col("g").alias("o_orderstatus"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        "hll_estimate",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# profile_orders — one-pass data profiling (the ANALYZE/data-quality
# sweep a pipeline runs before trusting a new drop): per column the
# row/null/distinct counts and min/max, computed as ONE wide aggregate
# over a single scan and unpivoted to long form JVM-side. At 100 TB
# this is the shape that matters: 6 columns profiled for the price of
# one pass, no per-column jobs. min/max stringify via exact decimal /
# date formatting so both engines render identical text.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)"),
    ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d')"),
    ("o_orderpriority", "o_orderpriority"),
]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({name}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {expr.replace(name, f'min({name})')} AS min_value,
       {expr.replace(name, f'max({name})')} AS max_value
FROM orders"""
    for name, expr in _PROFILE_COLS
)


@register("profile_orders", sql=_PROFILE_SQL)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")

    def s(col: "F.Column", name: str) -> "F.Column":
        # min/max run on the NATIVE type (numeric/date ordering), then
        # stringify with exact decimal / date formatting
        if name == "o_totalprice":
            return col.cast("decimal(12,2)").cast("string")
        if name == "o_orderdate":
            return F.date_format(col, "yyyy-MM-dd")
        return col.cast("string")

    aggs = []
    for name, _ in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__rows"),
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__null"),
            F.count_distinct(name).alias(f"{name}__distinct"),
            s(F.min(name), name).alias(f"{name}__min"),
            s(F.max(name), name).alias(f"{name}__max"),
        ]
    wide = orders.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"{name}__rows").cast("long").alias("n_rows"),
                F.col(f"{name}__null").cast("long").alias("n_null"),
                F.col(f"{name}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name, _ in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# market_basket_pairs — association mining over order baskets: which
# part pairs co-occur more than chance (the a-priori first pass every
# recommender bootstrap runs). The pair generator is an equi self-join
# ON THE ORDER KEY (co-partitioned, pairs per order are C(n,2) of a
# small n — never a corpus cartesian); item frequencies aggregate to
# |parts| rows and broadcast back for the lift denominator. Exact
# integer counts; one rounded division at the end.
# ---------------------------------------------------------------------------

_BASKET_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
),
n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
freq AS (SELECT pkey, count(*) AS item_n FROM items GROUP BY pkey),
pairs AS (
  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS pair_n
  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
  GROUP BY a.pkey, b.pkey
)
SELECT part_a, part_b, CAST(pair_n AS BIGINT) AS pair_n,
       round(CAST(pair_n AS DOUBLE) * n.n_orders
             / (fa.item_n * fb.item_n), 6) AS lift
FROM pairs
JOIN freq fa ON fa.pkey = part_a
JOIN freq fb ON fb.pkey = part_b
CROSS JOIN n
WHERE pair_n >= 2
"""


@register("market_basket_pairs", sql=_BASKET_SQL)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # items is referenced four times (count, freq, both self-join
    # sides); persist the distinct once instead of re-running the
    # lineitem-wide shuffle per reference (guide §2.4)
    items = (
        T(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_orders = items.agg(F.count_distinct("okey").alias("n_orders"))
    freq = items.groupBy("pkey").agg(F.count(F.lit(1)).alias("item_n"))
    a = items.alias("a")
    b = items.select(
        F.col("okey").alias("okey_b"), F.col("pkey").alias("pkey_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("okey") == F.col("okey_b"))
            & (F.col("pkey") < F.col("pkey_b")),
        )
        .groupBy(
            F.col("pkey").alias("part_a"), F.col("pkey_b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    fa = freq.select(
        F.col("pkey").alias("part_a"), F.col("item_n").alias("n_a")
    )
    fb = freq.select(
        F.col("pkey").alias("part_b"), F.col("item_n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.round(
                F.col("pair_n").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# orders_pareto — revenue concentration (the 80/20 audit): customers
# ranked by exact-decimal revenue, folded into deciles, each decile
# reporting its revenue share and the running cumulative share. The
# window input is the |customers|-sized pre-aggregate, never the
# order-grain table; the grand total joins back as a broadcast scalar.
# All shares derive from ONE division of exact decimal sums.
# ---------------------------------------------------------------------------

_PARETO_SQL = """
WITH cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, rev,
         ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
  FROM cust
),
tot AS (SELECT sum(rev) AS total_rev FROM cust),
deciles AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         sum(rev) AS decile_rev
  FROM ranked GROUP BY decile
)
SELECT decile,
       n_customers,
       CAST(decile_rev AS DOUBLE) AS decile_rev,
       round(CAST(decile_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
         AS revenue_share,
       round(CAST(sum(decile_rev) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(total_rev AS DOUBLE), 6) AS cumulative_share
FROM deciles CROSS JOIN tot
"""


@register("orders_pareto", sql=_PARETO_SQL)
def orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    ranked = cust.withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.col("rev").desc(), F.col("o_custkey"))
        ),
    )
    deciles = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev").alias("decile_rev"),
    )
    total = cust.agg(F.sum("rev").alias("total_rev"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        deciles.join(F.broadcast(total))
        .withColumn(
            "cum_rev", F.sum("decile_rev").over(w)
        )
        .select(
            "decile",
            "n_customers",
            F.col("decile_rev").cast("double").alias("decile_rev"),
            F.round(
                F.col("decile_rev").cast("double")
                / F.col("total_rev").cast("double"),
                6,
            ).alias("revenue_share"),
            F.round(
                F.col("cum_rev").cast("double")
                / F.col("total_rev").cast("double"),
                6,
            ).alias("cumulative_share"),
        )
    )


# ---------------------------------------------------------------------------
# join_cardinality — the planner primitive: predict |lineitem ⋈ orders
# ⋈ per-key| output sizes WITHOUT executing the join. Per join key,
# |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k); the per-key count tables are
# key-cardinality-sized (tiny next to the facts), so the estimate costs
# two grouped counts + one join of the COUNT tables — this is exactly
# the histogram-product estimator a cost-based optimizer consults
# before picking a join strategy, and the skew diagnosis (max per-key
# product) is what decides salting vs AQE. Reported per key column.
# ---------------------------------------------------------------------------

_JOIN_CARD_SQL = """
WITH a AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY k),
b AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY k),
j AS (
  SELECT a.k, a.n * b.n AS prod FROM a JOIN b ON a.k = b.k
)
SELECT 'l_orderkey=o_orderkey' AS join_key,
       CAST((SELECT count(*) FROM a) AS BIGINT)  AS n_keys_left,
       CAST((SELECT count(*) FROM b) AS BIGINT)  AS n_keys_right,
       CAST(count(*) AS BIGINT)                  AS n_keys_matched,
       CAST(sum(prod) AS BIGINT)                 AS predicted_rows,
       CAST(max(prod) AS BIGINT)                 AS max_key_product
FROM j
"""


@register("join_cardinality", sql=_JOIN_CARD_SQL)
def join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    na = a.agg(F.count(F.lit(1)).alias("n_keys_left"))
    nb = b.agg(F.count(F.lit(1)).alias("n_keys_right"))
    j = a.join(b, "k").select((F.col("n_a") * F.col("n_b")).alias("prod"))
    stats = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_matched"),
        F.sum("prod").cast("long").alias("predicted_rows"),
        F.max("prod").cast("long").alias("max_key_product"),
    )
    return (
        stats.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.lit("l_orderkey=o_orderkey").alias("join_key"),
            F.col("n_keys_left").cast("long").alias("n_keys_left"),
            F.col("n_keys_right").cast("long").alias("n_keys_right"),
            "n_keys_matched",
            "predicted_rows",
            "max_key_product",
        )
    )


# ---------------------------------------------------------------------------
# supplier_concentration — Herfindahl–Hirschman index of supplier
# concentration per part: HHI = Σ share_i² where share_i is supplier
# i's fraction of the part's shipped quantity. The float hazard (a sum
# of squared ratios over an unordered set) is eliminated by algebra:
# HHI = Σ qty_i² / (Σ qty_i)² — BOTH sums are exact integers, and the
# single division happens once per part. Two hash-aggs, no window, no
# join; the supply-chain-risk sweep a procurement pipeline runs.
# ---------------------------------------------------------------------------

# Rounding the quotient DOUBLE ties at real boundaries: HHI is a ratio
# of small exact integers, so 6-decimal midpoints (e.g. 14616/230400 =
# 0.0634375 exactly) genuinely occur — Spark's ROUND rounds the
# shortest decimal repr HALF_UP (-> ...438) while DuckDB rounds the
# scaled binary value (-> ...437). Caught by the sf1.0 fingerprint
# sweep. The fix rounds in EXACT integer arithmetic on both engines:
# half_up(a/b, 6) = (2*a*10^6 + b) intdiv (2*b), then one exact
# int->double division — bit-identical everywhere. Magnitudes: 2*a*10^6
# <= 2e18 while per-part quantities stay under ~1e6, inside int64.
_HHI_SQL = """
WITH q AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(qty) AS BIGINT) AS total_qty,
         CAST(sum(qty * qty) AS BIGINT) AS sum_sq
  FROM q GROUP BY l_partkey
)
SELECT l_partkey, n_suppliers, total_qty,
       CAST((2 * sum_sq * 1000000 + total_qty * total_qty)
            // (2 * total_qty * total_qty) AS DOUBLE) / 1000000.0
         AS hhi
FROM tot
WHERE n_suppliers >= 2
"""


@register("supplier_concentration", sql=_HHI_SQL)
def supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    # floor() before the integer cast on BOTH engines: Spark's
    # decimal→long cast truncates while DuckDB's rounds to nearest, so a
    # bare cast silently diverges on fractional quantities (ADVICE r4).
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("qty")
    )
    tot = q.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sum_sq"),
    )
    # exact integer half-up at scale 6 (see the oracle SQL note): the
    # double round ties on real midpoints because HHI is a small-integer
    # ratio, and the two engines break the tie differently
    return tot.filter(F.col("n_suppliers") >= 2).select(
        "l_partkey",
        "n_suppliers",
        "total_qty",
        (
            F.expr(
                "(2 * sum_sq * 1000000 + total_qty * total_qty)"
                " div (2 * total_qty * total_qty)"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# orders_cohort_revenue — monthly acquisition-cohort revenue retention:
# customers are stamped with their first-order month, and every order's
# revenue rolls up to (cohort_month, months_since_acquisition) — the
# triangle a subscription/commerce dashboard draws. The cohort stamp is
# a per-customer aggregate joined back (customer-dimension-sized, no
# window over the fact), month arithmetic runs on month-TRUNCATED dates
# so both engines see integer month deltas, and revenue is exact
# decimal.
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH first AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT strftime(f.cohort_month, '%Y-%m') AS cohort_month,
         CAST(date_diff('month', f.cohort_month,
                        date_trunc('month', o.o_orderdate)) AS BIGINT)
           AS months_since,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(16,2)))
              AS DECIMAL(18,2)) AS revenue,
         CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_customers
  FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT cohort_month, months_since,
       CAST(revenue AS DOUBLE) AS revenue, active_customers
FROM rev
"""


@register("orders_cohort_revenue", sql=_COHORT_SQL)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    j = orders.join(first, "o_custkey")
    months_since = (
        F.months_between(
            F.date_trunc("month", "o_orderdate"), F.col("cohort_month")
        )
        .cast("long")
        .alias("months_since")
    )
    return (
        j.groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
            months_since,
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(16,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
            F.countDistinct("o_custkey").cast("long").alias(
                "active_customers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# revenue_monthly_growth — month-over-month revenue growth per supplier
# nation: exact-decimal monthly rollup, one lag window over the tiny
# (nation × month) grain, single rounded ratio. The growth-rate lag
# never touches the fact table — the classic trap is windowing raw
# lineitem; here the window input is ~nations × months rows.
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
WITH m AS (
  SELECT n_name AS nation, date_trunc('month', o_orderdate) AS month,
         -- full-scale exact decimal: reducing scale would hit the
         -- engines' different rounding modes (half-up vs half-even)
         sum(CAST(l_extendedprice AS DECIMAL(14,2))
             * CAST(1 - l_discount AS DECIMAL(6,4))) AS rev
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT nation, month, rev,
         lag(rev) OVER (PARTITION BY nation ORDER BY month) AS prev
  FROM m
)
SELECT nation, strftime(month, '%Y-%m') AS month,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
         AS mom_growth
FROM lagged WHERE prev IS NOT NULL AND prev > 0
"""


@register("revenue_monthly_growth", sql=_GROWTH_SQL)
def revenue_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    m = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (1 - F.col("l_discount")).cast("decimal(6,4)")
            ).alias("rev")
        )
    )
    w = Window.partitionBy("nation").orderBy("month")
    lagged = m.withColumn("prev", F.lag("rev").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    )
    return lagged.select(
        "nation",
        F.date_format("month", "yyyy-MM").alias("month"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev") - F.col("prev")).cast("double")
            / F.col("prev").cast("double"),
            6,
        ).alias("mom_growth"),
    )


# ---------------------------------------------------------------------------
# market_basket_rules — directional association rules on top of the
# basket pair counts: for each co-occurring part pair, both rules
# a→b and b→a with exact support counts, confidence (pair/antecedent)
# and lift. Same scale shape as market_basket_pairs (self-join on the
# order key only, item frequencies broadcast back); the direction
# expansion is a row-local explode of each undirected pair into its two
# directed rules — no extra shuffle. Green-field recommender surface.
# ---------------------------------------------------------------------------

_BASKET_RULES_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
),
n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
freq AS (SELECT pkey, count(*) AS item_n FROM items GROUP BY pkey),
pairs AS (
  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS pair_n
  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
  GROUP BY a.pkey, b.pkey
  HAVING count(*) >= 2
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, pair_n FROM pairs
  UNION ALL
  SELECT part_b AS antecedent, part_a AS consequent, pair_n FROM pairs
)
SELECT antecedent, consequent,
       CAST(pair_n AS BIGINT)                                  AS pair_n,
       round(CAST(pair_n AS DOUBLE) / fa.item_n, 6)            AS confidence,
       round(CAST(pair_n AS DOUBLE) * n.n_orders
             / (fa.item_n * fb.item_n), 6)                     AS lift
FROM rules
JOIN freq fa ON fa.pkey = antecedent
JOIN freq fb ON fb.pkey = consequent
CROSS JOIN n
"""


@register("market_basket_rules", sql=_BASKET_RULES_SQL)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # same four-reference pattern as market_basket_pairs: persist the
    # lineitem-wide distinct once (guide §2.4)
    items = (
        T(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_orders = items.agg(F.count_distinct("okey").alias("n_orders"))
    freq = items.groupBy("pkey").agg(F.count(F.lit(1)).alias("item_n"))
    b = items.select(
        F.col("okey").alias("okey_b"), F.col("pkey").alias("pkey_b")
    )
    pairs = (
        items.join(
            b,
            (F.col("okey") == F.col("okey_b"))
            & (F.col("pkey") < F.col("pkey_b")),
        )
        .groupBy(
            F.col("pkey").alias("part_a"), F.col("pkey_b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    # direction expansion as the row-local explode the scale note
    # promises — the former unionByName of two selects re-ran the whole
    # pair self-join + aggregate twice (pairs is not persisted)
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("antecedent"),
                    F.col("part_b").alias("consequent"),
                    F.col("pair_n"),
                ),
                F.struct(
                    F.col("part_b").alias("antecedent"),
                    F.col("part_a").alias("consequent"),
                    F.col("pair_n"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    fa = freq.select(
        F.col("pkey").alias("antecedent"), F.col("item_n").alias("n_a")
    )
    fb = freq.select(
        F.col("pkey").alias("consequent"), F.col("item_n").alias("n_b")
    )
    return (
        rules.join(F.broadcast(fa), "antecedent")
        .join(F.broadcast(fb), "consequent")
        .join(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.round(
                F.col("pair_n").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            F.round(
                F.col("pair_n").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# orders_fulfillment_lag — order-to-ship latency per priority class:
# exact p50/p90/max of datediff(l_shipdate, o_orderdate), the SLA
# metric an ops dashboard alarms on per priority. Same scale recipe as
# the other exact-quantile queries: the co-partitioned fact join
# reduces straight to the (priority, distinct lag-day) grain — bounded
# by priorities × calendar span, never row count — then one cumulative
# window over that tiny frame and integer-rank picks.
# ---------------------------------------------------------------------------

_FULFILL_SQL = """
WITH lags AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
buckets AS (
  SELECT priority, lag_days, count(*) AS c FROM lags
  GROUP BY priority, lag_days
),
cum AS (
  SELECT priority, lag_days, c,
         sum(c) OVER (PARTITION BY priority ORDER BY lag_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER (PARTITION BY priority) AS n
  FROM buckets
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_lines,
       CAST(min(CASE WHEN cum_c >= n - n // 2  THEN lag_days END) AS BIGINT)
         AS p50_days,
       CAST(min(CASE WHEN cum_c >= n - n // 10 THEN lag_days END) AS BIGINT)
         AS p90_days,
       CAST(max(lag_days) AS BIGINT) AS max_days
FROM cum
GROUP BY priority
"""


@register("orders_fulfillment_lag", sql=_FULFILL_SQL)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lags = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("lag_days"),
    )
    buckets = lags.groupBy("priority", "lag_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("priority")
    cum = buckets.select(
        "priority",
        "lag_days",
        F.sum("c")
        .over(
            wp.orderBy("lag_days").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum_c"),
        F.sum("c").over(wp).alias("n"),
    )

    def pick(div: int):
        t = F.col("n") - F.expr(f"n div {div}")
        return F.min(F.when(F.col("cum_c") >= t, F.col("lag_days"))).cast(
            "long"
        )

    return cum.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_lines"),
        pick(2).alias("p50_days"),
        pick(10).alias("p90_days"),
        F.max("lag_days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# orders_survival_curve — customer-lifetime survival: for each tenure
# month k, the share of customers still active at k months among those
# OBSERVABLE for at least k months (right-censoring: a customer whose
# first order is near the dataset end can't be held against long
# tenures). Lifetime = months between first and last order; observable
# horizon = months between first order and the global max date. Both
# distributions collapse to the distinct-month grain (≤ data-span
# months), the curve is two cumulative windows over that tiny frame —
# the retention analysis every subscription/marketplace team runs.
# ---------------------------------------------------------------------------

_SURVIVAL_SQL = """
WITH mi AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS m_idx
  FROM orders
),
span AS (
  -- explicit integer month indexes (year*12 + month): identical
  -- month-boundary arithmetic in both engines, no fractional-month
  -- or day-of-month semantics to diverge on
  SELECT o_custkey,
         max(m_idx) - min(m_idx) AS lifetime_m,
         (SELECT max(m_idx) FROM mi) - min(m_idx) AS observable_m
  FROM mi GROUP BY o_custkey
),
life AS (SELECT lifetime_m AS m, count(*) AS c FROM span GROUP BY lifetime_m),
obs AS (SELECT observable_m AS m, count(*) AS c FROM span GROUP BY observable_m),
months AS (
  SELECT DISTINCT m FROM (SELECT m FROM life UNION ALL SELECT m FROM obs)
),
curve AS (
  SELECT months.m AS tenure_months,
         (SELECT coalesce(sum(c), 0) FROM life WHERE life.m >= months.m)
           AS n_survived,
         (SELECT coalesce(sum(c), 0) FROM obs WHERE obs.m >= months.m)
           AS n_observable
  FROM months
)
SELECT CAST(tenure_months AS BIGINT) AS tenure_months,
       CAST(n_observable AS BIGINT)  AS n_observable,
       CAST(n_survived AS BIGINT)    AS n_survived,
       round(CAST(n_survived AS DOUBLE) / n_observable, 6) AS survival_rate
FROM curve
WHERE n_observable > 0
"""


@register("orders_survival_curve", sql=_SURVIVAL_SQL)
def orders_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    mi = T(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m_idx"),
    )
    global_max = mi.agg(F.max("m_idx").alias("global_max"))
    span = (
        mi.groupBy("o_custkey")
        .agg(F.min("m_idx").alias("first_m"), F.max("m_idx").alias("last_m"))
        .crossJoin(F.broadcast(global_max))
        .select(
            (F.col("last_m") - F.col("first_m")).alias("lifetime_m"),
            (F.col("global_max") - F.col("first_m")).alias("observable_m"),
        )
    )
    life = span.groupBy(F.col("lifetime_m").alias("m")).agg(
        F.count(F.lit(1)).alias("c_life")
    )
    obs = span.groupBy(F.col("observable_m").alias("m")).agg(
        F.count(F.lit(1)).alias("c_obs")
    )
    months = (
        life.select("m")
        .unionByName(obs.select("m"))
        .distinct()
        .join(life, "m", "left")
        .join(obs, "m", "left")
        .select(
            "m",
            F.coalesce("c_life", F.lit(0)).alias("c_life"),
            F.coalesce("c_obs", F.lit(0)).alias("c_obs"),
        )
    )
    # suffix sums: count of customers with value >= m, via a cumulative
    # window ordered DESC over the distinct-month grain
    wd = Window.orderBy(F.col("m").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = months.select(
        F.col("m").alias("tenure_months"),
        F.sum("c_obs").over(wd).alias("n_observable"),
        F.sum("c_life").over(wd).alias("n_survived"),
    )
    return curve.filter(F.col("n_observable") > 0).select(
        F.col("tenure_months").cast("long").alias("tenure_months"),
        F.col("n_observable").cast("long").alias("n_observable"),
        F.col("n_survived").cast("long").alias("n_survived"),
        F.round(
            F.col("n_survived").cast("double") / F.col("n_observable"), 6
        ).alias("survival_rate"),
    )


# ---------------------------------------------------------------------------
# stats_equidepth_histogram — the ANALYZE TABLE primitive: a 16-bucket
# equi-depth histogram of o_totalprice, the statistic a cost-based
# optimizer stores per column. Exact percentile boundaries on a
# near-unique numeric domain would demand a global sort; the scalable
# (and production-standard) answer picks boundaries at the EDGES of a
# bounded-width pre-bucketing — one pass to the width-1000 bucket
# grain, a cumulative window over that ~|max/1000|-row grain, integer
# rank arithmetic for the 15 interior boundaries, and a tiny
# cross-join to assign each width-1000 cell to its depth bucket.
# Output: 16 (lo, hi, n_rows) rows whose fill spread IS the
# histogram-quality audit.
# ---------------------------------------------------------------------------

_DEPTH_K = 16

_EQUIDEPTH_SQL = f"""
WITH b AS (
  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY bucket
),
cum AS (
  SELECT bucket, c,
         sum(c) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER () AS n
  FROM b
),
ks AS (SELECT unnest(range(1, {_DEPTH_K})) AS k),
bounds AS (
  SELECT k,
         min(CASE WHEN cum_c >= (k * n + {_DEPTH_K - 1}) // {_DEPTH_K}
                  THEN bucket END) AS eb
  FROM cum CROSS JOIN ks GROUP BY k
),
assign AS (
  SELECT c.bucket, c.c,
         count(CASE WHEN b2.eb < c.bucket THEN 1 END) AS d
  FROM cum c CROSS JOIN bounds b2
  GROUP BY c.bucket, c.c
)
SELECT CAST(d AS INT)                          AS depth_bucket,
       CAST(min(bucket) * 1000 AS BIGINT)      AS lo,
       CAST((max(bucket) + 1) * 1000 AS BIGINT) AS hi,
       CAST(sum(c) AS BIGINT)                  AS n_rows
FROM assign GROUP BY d
"""


@register("stats_equidepth_histogram", sql=_EQUIDEPTH_SQL)
def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    # the fact reduces ONCE to the width-1000 bucket grain; both
    # consumers (boundary picking, depth assignment) read the
    # checkpointed grain instead of re-scanning orders
    b = (
        orders.select(
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    cum = b.select(
        "bucket",
        "c",
        F.sum("c")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum_c"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    ks = spark.range(1, _DEPTH_K).select(F.col("id").alias("k"))
    bounds = (
        cum.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.min(
                F.when(
                    F.col("cum_c")
                    >= F.expr(f"(k * n + {_DEPTH_K - 1}) div {_DEPTH_K}"),
                    F.col("bucket"),
                )
            ).alias("eb")
        )
    )
    assign = (
        cum.crossJoin(F.broadcast(bounds))
        .groupBy("bucket", "c")
        .agg(
            F.count(F.when(F.col("eb") < F.col("bucket"), 1)).alias("d")
        )
    )
    return assign.groupBy(F.col("d").cast("int").alias("depth_bucket")).agg(
        (F.min("bucket") * 1000).cast("long").alias("lo"),
        ((F.max("bucket") + 1) * 1000).cast("long").alias("hi"),
        F.sum("c").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# stats_selectivity_eval — close the optimizer-statistics loop the way
# join_cardinality->plan_join closed the join one: ESTIMATE predicate
# selectivities from the equi-depth histogram (uniform-within-bucket
# interpolation, the textbook CBO formula) and measure them against
# the exact counts in the same output row. The per-bucket
# contributions are quantized to DECIMAL(20,6) before summing, so the
# 16-term sum is associative-exact and both engines agree bit-for-bit
# regardless of hash-aggregation order.
#
# Scale shape: the histogram side is 16 rows x 3 predicates; the
# exact side is ONE conditional-count scan of orders. A production
# system runs only the estimate (that is the point of statistics) —
# the exact pass here is the eval harness.
# ---------------------------------------------------------------------------

_SEL_PREDS = [  # (pred_id, a, b): estimate F(b) - F(a)
    ("between_50k_150k", 50_000, 150_000),
    ("le_100k", 0, 100_000),
    ("gt_200k", 200_000, 10_000_000),
]

_SEL_PRED_SQL = " UNION ALL ".join(
    f"SELECT '{p}' AS pred, CAST({a} AS DOUBLE) AS a, CAST({b} AS DOUBLE) AS b"
    for p, a, b in _SEL_PREDS
)

_SEL_EXACT_SQL = " UNION ALL ".join(
    f"SELECT '{p}' AS pred, CAST(sum(CASE WHEN o_totalprice >= {a} "
    f"AND o_totalprice <= {b} THEN 1 ELSE 0 END) AS BIGINT) AS exact_rows "
    "FROM orders"
    for p, a, b in _SEL_PREDS
)

_SELECTIVITY_SQL = f"""
WITH hist AS ({_EQUIDEPTH_SQL}),
preds AS ({_SEL_PRED_SQL}),
contrib AS (
  SELECT p.pred,
         CAST(round(
           h.n_rows * (
             least(greatest((p.b - h.lo) / (h.hi - h.lo), 0.0), 1.0)
             - least(greatest((p.a - h.lo) / (h.hi - h.lo), 0.0), 1.0)
           ), 6) AS DECIMAL(20,6)) AS est_part
  FROM preds p CROSS JOIN hist h
),
est AS (
  SELECT pred, CAST(sum(est_part) AS DOUBLE) AS est_rows
  FROM contrib GROUP BY pred
),
exact AS ({_SEL_EXACT_SQL})
SELECT est.pred,
       round(est.est_rows, 6) AS est_rows,
       exact.exact_rows,
       round((est.est_rows - exact.exact_rows)
             / nullif(CAST(exact.exact_rows AS DOUBLE), 0), 6) AS rel_err
FROM est JOIN exact ON est.pred = exact.pred
"""


@register("stats_selectivity_eval", sql=_SELECTIVITY_SQL)
def stats_selectivity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = stats_equidepth_histogram(spark, sf_dir)
    from codex_data_products_spark.tables import local_frame

    preds = local_frame(
        spark,
        [(p, float(a), float(b)) for p, a, b in _SEL_PREDS],
        "pred string, a double, b double",
    )
    frac = lambda x: F.least(  # noqa: E731
        F.greatest(
            (x - F.col("lo")) / (F.col("hi") - F.col("lo")), F.lit(0.0)
        ),
        F.lit(1.0),
    )
    contrib = preds.crossJoin(F.broadcast(hist)).select(
        "pred",
        F.round(
            F.col("n_rows") * (frac(F.col("b")) - frac(F.col("a"))), 6
        )
        .cast("decimal(20,6)")
        .alias("est_part"),
    )
    est = contrib.groupBy("pred").agg(
        F.sum("est_part").cast("double").alias("est_rows")
    )
    orders = T(spark, sf_dir, "orders")
    exact = orders.agg(
        *[
            F.sum(
                (
                    (F.col("o_totalprice") >= a)
                    & (F.col("o_totalprice") <= b)
                ).cast("int")
            )
            .cast("long")
            .alias(p)
            for p, a, b in _SEL_PREDS
        ]
    ).select(
        F.expr(
            "stack("
            + str(len(_SEL_PREDS))
            + ", "
            + ", ".join(f"'{p}', {p}" for p, _, _ in _SEL_PREDS)
            + ") AS (pred, exact_rows)"
        )
    )
    return est.join(exact, "pred").select(
        "pred",
        F.round("est_rows", 6).alias("est_rows"),
        "exact_rows",
        F.round(
            (F.col("est_rows") - F.col("exact_rows"))
            / F.nullif(F.col("exact_rows").cast("double"), F.lit(0.0)),
            6,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# bloom_fpr_eval — measure the Bloom filter itself. bloom_semi_join
# proves the sketch never changes answers; this query closes its
# TUNING loop: build the filter from high-balance customers, probe it
# with a key set KNOWN disjoint (the complement predicate on a unique
# key), and report the realized false-positive rate next to the
# textbook prediction (1 - (1-1/m)^(k·n))^k. A fleet sizes m and k
# from exactly this comparison.
#
# Scale shape: the build side collapses to <= m bit positions
# (broadcast); probes evaluate k hash expressions row-locally; both
# counts are exact integers and the theory term is one row-local
# double expression identical on both engines.
# ---------------------------------------------------------------------------

from codex_data_products_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_probe,
)

_FPR_M = 65536
_FPR_HASHES = ((2654435761, 7), (40503, 131), (2246822519, 1031))

_FPR_POS_SQL = " UNION ".join(
    f"SELECT DISTINCT (c_custkey * {mu} + {a}) % {_FPR_M} AS pos FROM build"
    for mu, a in _FPR_HASHES
)

_FPR_SQL = f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 4500
),
bpos AS ({_FPR_POS_SQL}),
probe AS (
  SELECT c_custkey FROM customer WHERE c_acctbal <= 4500
),
hits AS (
  SELECT p.c_custkey
  FROM probe p
  JOIN bpos h1 ON (p.c_custkey * {_FPR_HASHES[0][0]} + {_FPR_HASHES[0][1]})
                  % {_FPR_M} = h1.pos
  JOIN bpos h2 ON (p.c_custkey * {_FPR_HASHES[1][0]} + {_FPR_HASHES[1][1]})
                  % {_FPR_M} = h2.pos
  JOIN bpos h3 ON (p.c_custkey * {_FPR_HASHES[2][0]} + {_FPR_HASHES[2][1]})
                  % {_FPR_M} = h3.pos
)
SELECT CAST((SELECT count(*) FROM build) AS BIGINT)  AS n_build,
       CAST((SELECT count(*) FROM probe) AS BIGINT)  AS n_probe,
       CAST((SELECT count(*) FROM hits) AS BIGINT)   AS n_false_pos,
       round(CAST((SELECT count(*) FROM hits) AS DOUBLE)
             / nullif((SELECT count(*) FROM probe), 0), 6) AS fp_rate,
       round(pow(1.0 - pow(1.0 - 1.0 / {_FPR_M},
                           3.0 * (SELECT count(*) FROM build)), 3.0), 6)
         AS fp_theory
"""


@register("bloom_fpr_eval", sql=_FPR_SQL)
def bloom_fpr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_acctbal") > 4500).select("c_custkey")
    probe = cust.filter(F.col("c_acctbal") <= 4500).select("c_custkey")
    bloom = bloom_build(build, "c_custkey", m=_FPR_M, hashes=_FPR_HASHES)
    hits = bloom_probe(
        probe, bloom, "c_custkey", m=_FPR_M, hashes=_FPR_HASHES
    )
    nb = build.agg(F.count(F.lit(1)).cast("long").alias("n_build"))
    np_ = probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe"))
    nf = hits.agg(F.count(F.lit(1)).cast("long").alias("n_false_pos"))
    return (
        nb.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nf))
        .select(
            "n_build",
            "n_probe",
            "n_false_pos",
            F.round(
                F.col("n_false_pos").cast("double")
                / F.nullif(F.col("n_probe"), F.lit(0)),
                6,
            ).alias("fp_rate"),
            F.round(
                F.pow(
                    1.0
                    - F.pow(
                        F.lit(1.0 - 1.0 / _FPR_M),
                        3.0 * F.col("n_build"),
                    ),
                    F.lit(3.0),
                ),
                6,
            ).alias("fp_theory"),
        )
    )


# ---------------------------------------------------------------------------
# hll_set_ops_eval — HLL SET ALGEBRA with its honesty check: distinct
# clickers (A) and viewers (B) as register tables, their union by
# register max-merge (the only set op HLL supports natively), and the
# intersection by inclusion-exclusion |A|+|B|-|A∪B| — the estimator
# every sketch warehouse exposes and every practitioner distrusts,
# because its error is relative to the UNION, not the (often much
# smaller) intersection. The exact intersection and the realized
# relative error sit in the same row — the audit that says whether
# inclusion-exclusion is usable on this data.
#
# Scale shape: everything flows through the 64-row-per-set register
# grain (the mergeable ANALYZE artifact); the exact side is one
# (user)-grain aggregate. Estimates use the repo's integer-exact
# harmonic sum, so even the approximations hash-match across engines.
# ---------------------------------------------------------------------------

_HLL_EST_EXPR = f"""round({HLL_ALPHA} * {HLL_M * HLL_M} * pow(2.0, {_HLL_RMAX})
               / CAST(sum(CAST(pow(2.0, {_HLL_RMAX} - rank) AS DECIMAL(38,0)))
                      + CAST({HLL_M} - count(*) AS DECIMAL(38,0))
                        * CAST(pow(2.0, {_HLL_RMAX}) AS DECIMAL(38,0))
                      AS DOUBLE), 4)"""

_HLL_SETOPS_SQL = f"""
WITH items AS (
  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS g,
         CAST(user_id AS VARCHAR) AS item
  FROM events WHERE event_type IN ('click', 'view')
),
h AS (
  SELECT g,
         (CAST(concat('0x', substring(md5(item), 1, 1)) AS BIGINT) % 8)
           * (CAST(1 AS BIGINT) << 60)
         + CAST(concat('0x', substring(md5(item), 2, 15)) AS BIGINT) AS hv
  FROM items
),
reg AS (
  SELECT g, hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} > 0
                  THEN {HLL_LOW_BITS}
                       - length(format('{{:b}}', hv // {HLL_M})) + 1
                  ELSE {HLL_LOW_BITS + 1} END) AS rank
  FROM h GROUP BY g, hv % {HLL_M}
),
allreg AS (
  SELECT g, bucket, rank FROM reg
  UNION ALL
  SELECT 'u' AS g, bucket, max(rank) AS rank FROM reg GROUP BY bucket
),
est AS (SELECT g, {_HLL_EST_EXPR} AS e FROM allreg GROUP BY g),
p AS (
  SELECT min(CASE WHEN g = 'a' THEN e END) AS ea,
         min(CASE WHEN g = 'b' THEN e END) AS eb,
         min(CASE WHEN g = 'u' THEN e END) AS eu
  FROM est
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
    SELECT user_id FROM events WHERE event_type IN ('click', 'view')
    GROUP BY user_id
    HAVING max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
       AND max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
  )
)
SELECT round(ea, 4) AS est_clickers,
       round(eb, 4) AS est_viewers,
       round(eu, 4) AS est_union,
       round(ea + eb - eu, 4) AS est_intersect,
       ex.exact_intersect,
       round(abs(ea + eb - eu - ex.exact_intersect)
             / nullif(CAST(ex.exact_intersect AS DOUBLE), 0), 4)
         AS rel_err
FROM p, ex
"""


@register("hll_set_ops_eval", sql=_HLL_SETOPS_SQL)
def hll_set_ops_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    items = ev.select(
        F.when(F.col("event_type") == "click", "a")
        .otherwise("b")
        .alias("g"),
        F.col("user_id").cast("string").alias("item"),
    )
    regs = hll_register_rows(items, "item", ["g"])
    union_regs = regs.groupBy("bucket").agg(
        F.max("rank").alias("rank")
    ).select(F.lit("u").alias("g"), "bucket", "rank")
    allreg = regs.select("g", "bucket", "rank").unionByName(union_regs)
    est = hll_estimate(allreg, ["g"])
    p = est.agg(
        F.min(F.when(F.col("g") == "a", F.col("hll_estimate"))).alias("ea"),
        F.min(F.when(F.col("g") == "b", F.col("hll_estimate"))).alias("eb"),
        F.min(F.when(F.col("g") == "u", F.col("hll_estimate"))).alias("eu"),
    )
    ex = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        )
        .filter((F.col("c") == 1) & (F.col("v") == 1))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    return p.crossJoin(F.broadcast(ex)).select(
        F.round("ea", 4).alias("est_clickers"),
        F.round("eb", 4).alias("est_viewers"),
        F.round("eu", 4).alias("est_union"),
        F.round(F.col("ea") + F.col("eb") - F.col("eu"), 4).alias(
            "est_intersect"
        ),
        "exact_intersect",
        F.round(
            F.abs(F.col("ea") + F.col("eb") - F.col("eu")
                  - F.col("exact_intersect"))
            / F.nullif(
                F.col("exact_intersect").cast("double"), F.lit(0.0)
            ),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# orders_exact_median — the EXACT median of a near-unique numeric
# column with bounded memory: the two-pass refinement every
# distributed engine uses when "exact" is non-negotiable (billing,
# SLAs) and a global sort is off the table. Pass 1 reduces to the
# width-1000 bucket histogram and integer-rank arithmetic locates the
# bucket holding the lower-median rank (n+1)//2; pass 2 scans ONLY
# that bucket's rows (n/|buckets| of the table) and picks the exact
# element by rank. Output: the median, its bucket, and how small the
# refinement scan was — the refinement factor IS the scale story.
#
# Cross-engine exactness: ranks are integers; the in-bucket selection
# orders by (price, orderkey) — a total order — so both engines pick
# the identical row even among duplicate prices.
# ---------------------------------------------------------------------------

_EXACT_MEDIAN_SQL = """
WITH b AS (
  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY bucket
),
cum AS (
  SELECT bucket, c,
         sum(c) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER () AS n
  FROM b
),
target AS (
  SELECT min(n) AS n, (min(n) + 1) // 2 AS rk,
         min(CASE WHEN cum_c >= (n + 1) // 2 THEN bucket END) AS mb,
         min(CASE WHEN cum_c >= (n + 1) // 2 THEN cum_c - c END)
           AS rows_before
  FROM cum
),
ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey)
           AS r,
         t.rk, t.rows_before, t.n, t.mb,
         count(*) OVER () AS bucket_rows
  FROM orders, target t
  WHERE CAST(floor(o_totalprice / 1000) AS BIGINT) = t.mb
)
SELECT CAST(round(CAST(o_totalprice AS DECIMAL(14,2)), 2) AS DOUBLE)
         AS exact_median,
       CAST(n AS BIGINT)            AS n_rows,
       CAST(mb AS BIGINT)           AS median_bucket,
       CAST(bucket_rows AS BIGINT)  AS refined_rows,
       round(CAST(bucket_rows AS DOUBLE) / n, 6) AS refine_fraction
FROM ranked
WHERE r = rk - rows_before
"""


@register("orders_exact_median", sql=_EXACT_MEDIAN_SQL)
def orders_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 1000).cast("long")
    b = (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum = b.select(
        "bucket",
        "c",
        F.sum("c")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum_c"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    hit = F.col("cum_c") >= F.expr("(n + 1) div 2")
    target = cum.agg(
        F.min("n").alias("n"),
        F.expr("(min(n) + 1) div 2").alias("rk"),
        F.min(F.when(hit, F.col("bucket"))).alias("mb"),
        F.min(F.when(hit, F.col("cum_c") - F.col("c"))).alias(
            "rows_before"
        ),
    )
    # pass 2: only the median bucket's rows are ranked — a window over
    # n/|buckets| rows, never the table
    ranked = (
        orders.crossJoin(F.broadcast(target))
        .filter(bucket == F.col("mb"))
        .select(
            "o_totalprice",
            "rk",
            "rows_before",
            "n",
            "mb",
            F.row_number()
            .over(Window.orderBy("o_totalprice", "o_orderkey"))
            .alias("r"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .alias("bucket_rows"),
        )
    )
    return ranked.filter(
        F.col("r") == F.col("rk") - F.col("rows_before")
    ).select(
        F.round(F.col("o_totalprice").cast("decimal(14,2)"), 2)
        .cast("double")
        .alias("exact_median"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("mb").cast("long").alias("median_bucket"),
        F.col("bucket_rows").cast("long").alias("refined_rows"),
        F.round(
            F.col("bucket_rows").cast("double") / F.col("n"), 6
        ).alias("refine_fraction"),
    )


# ---------------------------------------------------------------------------
# skyline_parts — 2-D skyline (Pareto-optimal front): parts that no
# other part dominates on (retailprice low, size low). Dominance:
# a beats b iff a.price <= b.price AND a.size <= b.size with at least
# one strict. The naive plan is the O(n^2) NOT EXISTS self-join (the
# oracle below); the engine computes it in two window passes:
#
#   1. LOCAL skyline per price bucket — window partitioned by bucket,
#      embarrassingly parallel, prunes almost everything (a bucket's
#      survivors <= its distinct sizes).
#   2. GLOBAL skyline over the survivors — the unpartitioned running-
#      min window is fine HERE because stage 1 already shrank the
#      input to skyline-candidate size; running it over the raw table
#      would serialize the corpus through one partition at 100 TB.
#
# Survivor rule per ordered prefix: keep a row iff its size equals its
# own price group's min AND is strictly below every cheaper price's
# min size (<= would be dominated via strict price).
# ---------------------------------------------------------------------------

_SKYLINE_SQL = """
SELECT p.p_partkey AS partkey,
       p.p_retailprice AS price,
       CAST(p.p_size AS INT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
"""


def _skyline_pass(df: DataFrame, *partition: str) -> DataFrame:
    """One skyline pass over (partkey, price, size), optionally within
    ``partition`` columns. Keeps a row iff no row in the same scope
    dominates it — exact within the scope.

    The strict-prefix min must range over all STRICTLY cheaper prices;
    a RANGE frame with a -1 offset is value-based (it would skip
    cheaper prices within one currency unit), so the running min runs
    on the distinct-price grain instead — one row per price, where a
    ROWS frame's "previous row" IS the previous distinct price. The
    surviving (price, min size) pairs are skyline-sized, so they
    broadcast back onto the row grain."""
    grp = df.groupBy(*partition, "price").agg(
        F.min("size").alias("_gmin")
    )
    w = (
        Window.partitionBy(*partition)
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    surv = (
        grp.withColumn("_smin", F.min("_gmin").over(w))
        .filter(F.col("_smin").isNull() | (F.col("_gmin") < F.col("_smin")))
        .select(
            *[F.col(c).alias(f"_s_{c}") for c in partition],
            F.col("price").alias("_s_price"),
            "_gmin",
        )
    )
    from functools import reduce as _reduce

    cond = _reduce(
        lambda a, b: a & b,
        [F.col(c) == F.col(f"_s_{c}") for c in partition]
        + [
            F.col("price") == F.col("_s_price"),
            F.col("size") == F.col("_gmin"),
        ],
    )
    return df.join(F.broadcast(surv), cond, "inner").select(
        "partkey", "price", "size"
    )


@register("skyline_parts", sql=_SKYLINE_SQL)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("int").alias("size"),
    )
    bucket = F.floor(F.col("price") / 100).alias("bucket")
    local = _skyline_pass(parts.withColumn("bucket", bucket), "bucket")
    return _skyline_pass(local.drop("bucket"))
