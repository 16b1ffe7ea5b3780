"""Data-quality expectation scan (Deequ/Great-Expectations-shaped).

Green-field surface: the reference validates its inputs implicitly
(dropna on uuid, leaf-dataset filters — SURVEY F2/F3); a production
pipeline at 100 TB runs an explicit rule scan and gates downstream jobs
on the violation counts. ``dq_violations`` evaluates a fixed rule suite
over ``lineitem``/``orders``/``customer`` and returns one row per rule:
``(rule, n_checked, n_violations)``.

Scale shape — the whole suite is ONE pass over each fact:

* lineitem rules fold into a per-order partial aggregate (map-side
  combine collapses 4-7 lines per order before the shuffle), which is
  then FULL-OUTER-joined once against orders — that single join yields
  the referential rules in both directions (orphan lineitems, empty
  orders) AND the order-total reconciliation, with no second scan of
  either fact.
* the customer side is one more equi join on the same frame.
* every count is an integer and the reconciliation is exact DECIMAL
  arithmetic kept under precision 38 on both engines (the gross sum is
  re-quantized to DECIMAL(18,4) before comparing), so the oracle matches
  bit-for-bit — no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import dratio
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# reconciliation tolerance: |o_totalprice - sum(gross)| <= 1% of total
_TOL = "0.01"

_DQ_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey,
         count(*) AS n_lines,
         sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS v_qty,
         sum(CASE WHEN l_discount NOT BETWEEN 0 AND 0.5 THEN 1 ELSE 0 END) AS v_disc,
         sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price,
         sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_shipnull,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                  * CAST(1 - l_discount AS DECIMAL(6,4))
                  * CAST(1 + l_tax AS DECIMAL(6,4))) AS DECIMAL(18,4)) AS gross
  FROM lineitem GROUP BY l_orderkey
),
fo AS (
  SELECT p.*, o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
         c.c_custkey
  FROM per_order p
  FULL OUTER JOIN orders o ON o.o_orderkey = p.l_orderkey
  LEFT JOIN customer c ON c.c_custkey = o.o_custkey
),
m AS (
  SELECT
    CAST(sum(coalesce(n_lines, 0)) AS BIGINT)    AS n_li,
    CAST(sum(coalesce(v_qty, 0)) AS BIGINT)      AS v_qty,
    CAST(sum(coalesce(v_disc, 0)) AS BIGINT)     AS v_disc,
    CAST(sum(coalesce(v_price, 0)) AS BIGINT)    AS v_price,
    CAST(sum(coalesce(v_shipnull, 0)) AS BIGINT) AS v_shipnull,
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN n_lines ELSE 0 END) AS BIGINT)
      AS v_orphan_li,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_ord,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND o_orderdate IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS v_odate,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND o_totalprice <= 0
             THEN 1 ELSE 0 END) AS BIGINT) AS v_ototal,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND c_custkey IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS v_orphan_ord,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS v_empty_ord,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_recon,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                  AND abs(CAST(o_totalprice AS DECIMAL(16,2)) - gross)
                      > CAST(o_totalprice AS DECIMAL(16,2))
                        * CAST({_TOL} AS DECIMAL(4,2))
             THEN 1 ELSE 0 END) AS BIGINT) AS v_recon
  FROM fo
)
SELECT r.rule, r.n_checked, r.n_violations
FROM m, LATERAL (VALUES
  ('lineitem_quantity_in_1_50',     m.n_li,    m.v_qty),
  ('lineitem_discount_in_0_0.5',    m.n_li,    m.v_disc),
  ('lineitem_positive_price',       m.n_li,    m.v_price),
  ('lineitem_shipdate_not_null',    m.n_li,    m.v_shipnull),
  ('lineitem_has_order',            m.n_li,    m.v_orphan_li),
  ('orders_orderdate_not_null',     m.n_ord,   m.v_odate),
  ('orders_positive_totalprice',    m.n_ord,   m.v_ototal),
  ('orders_has_customer',           m.n_ord,   m.v_orphan_ord),
  ('orders_has_lineitems',          m.n_ord,   m.v_empty_ord),
  ('orders_totalprice_reconciles',  m.n_recon, m.v_recon)
) AS r(rule, n_checked, n_violations)
"""


@register("dq_violations", sql=_DQ_SQL)
def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")

    def _viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _viol(~F.col("l_quantity").between(1, 50)).alias("v_qty"),
        _viol(~F.col("l_discount").between(0, 0.5)).alias("v_disc"),
        _viol(F.col("l_extendedprice") <= 0).alias("v_price"),
        _viol(F.col("l_shipdate").isNull()).alias("v_shipnull"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(14,2)")
            * (1 - F.col("l_discount")).cast("decimal(6,4)")
            * (1 + F.col("l_tax")).cast("decimal(6,4)")
        )
        .cast("decimal(18,4)")
        .alias("gross"),
    )
    fo = per_order.join(
        orders, per_order.l_orderkey == orders.o_orderkey, "full_outer"
    ).join(
        cust.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    o_present = F.col("o_orderkey").isNotNull()
    li_present = F.col("l_orderkey").isNotNull()
    total_dec = F.col("o_totalprice").cast("decimal(16,2)")
    recon_bad = F.abs(total_dec - F.col("gross")) > total_dec * F.lit(
        _TOL
    ).cast("decimal(4,2)")
    b = lambda c: c.cast("long")  # noqa: E731
    m = fo.agg(
        b(F.sum(F.coalesce("n_lines", F.lit(0)))).alias("n_li"),
        b(F.sum(F.coalesce("v_qty", F.lit(0)))).alias("v_qty"),
        b(F.sum(F.coalesce("v_disc", F.lit(0)))).alias("v_disc"),
        b(F.sum(F.coalesce("v_price", F.lit(0)))).alias("v_price"),
        b(F.sum(F.coalesce("v_shipnull", F.lit(0)))).alias("v_shipnull"),
        b(
            F.sum(F.when(~o_present, F.col("n_lines")).otherwise(0))
        ).alias("v_orphan_li"),
        b(_viol(o_present)).alias("n_ord"),
        b(_viol(o_present & F.col("o_orderdate").isNull())).alias("v_odate"),
        b(_viol(o_present & (F.col("o_totalprice") <= 0))).alias("v_ototal"),
        b(_viol(o_present & F.col("c_custkey").isNull())).alias(
            "v_orphan_ord"
        ),
        b(_viol(o_present & ~li_present)).alias("v_empty_ord"),
        b(_viol(o_present & li_present)).alias("n_recon"),
        b(_viol(o_present & li_present & recon_bad)).alias("v_recon"),
    )
    rules = [
        ("lineitem_quantity_in_1_50", "n_li", "v_qty"),
        ("lineitem_discount_in_0_0.5", "n_li", "v_disc"),
        ("lineitem_positive_price", "n_li", "v_price"),
        ("lineitem_shipdate_not_null", "n_li", "v_shipnull"),
        ("lineitem_has_order", "n_li", "v_orphan_li"),
        ("orders_orderdate_not_null", "n_ord", "v_odate"),
        ("orders_positive_totalprice", "n_ord", "v_ototal"),
        ("orders_has_customer", "n_ord", "v_orphan_ord"),
        ("orders_has_lineitems", "n_ord", "v_empty_ord"),
        ("orders_totalprice_reconciles", "n_recon", "v_recon"),
    ]
    stack_args = ", ".join(
        f"'{name}', {nc}, {nv}" for name, nc, nv in rules
    )
    return m.select(
        F.expr(
            f"stack({len(rules)}, {stack_args})"
            " AS (rule, n_checked, n_violations)"
        )
    )


# ---------------------------------------------------------------------------
# skew_profile — partition-key distribution audit: for each candidate
# shuffle key, the per-key count distribution summarized as hot-key
# stats (max rows, top-1 share, max/avg skew ratio) plus an exact Gini
# coefficient — the number a planner (operators/joins.plan_join) or an
# SRE reads before picking salting / AQE skew handling.
#
# Scale shape — NO window ever sees the |keys| grain: Gini needs the
# rank-weighted sum S1 = Σ rank·cnt over counts sorted ascending, and
# keys tied on the same cnt occupy consecutive ranks, so each tie
# group contributes cnt·(g·keys_before + g(g+1)/2) in closed form.
# The plan is therefore: per-key hash agg (|keys| rows, map-side
# combined) → second hash agg to the DISTINCT-count-value grain
# (heavy-tailed integers — tiny) → one cumulative window over that
# tiny frame → scalar fold. The fact table is scanned once per audit
# and never shuffled at row grain; exact integers until the three
# final divisions (Gini = (2·S1 − (n+1)·S) / (n·S)).
# ---------------------------------------------------------------------------


def _skew_audit_sql(label: str, table: str, key: str) -> str:
    return f"""
  SELECT '{label}' AS audit_key,
         CAST(sum(g) AS BIGINT)                             AS n_keys,
         CAST(sum(cnt * g) AS BIGINT)                       AS n_rows,
         CAST(max(cnt) AS BIGINT)                           AS max_rows,
         CAST((2 * CAST((max(cnt)) AS BIGINT) * 1000000 + CAST((sum(cnt * g)) AS BIGINT)) // (2 * CAST((sum(cnt * g)) AS BIGINT)) AS DOUBLE) / 1000000.0  AS top_share,
         CAST((2 * CAST((max(cnt) * sum(g)) AS BIGINT) * 1000000 + CAST((sum(cnt * g)) AS BIGINT)) // (2 * CAST((sum(cnt * g)) AS BIGINT)) AS DOUBLE) / 1000000.0
                                                            AS skew_ratio,
         round((sum(cnt * (2 * g * before + g * (g + 1)))
                - (sum(g) + 1.0) * sum(cnt * g))
               / (CAST(sum(g) AS DOUBLE) * sum(cnt * g)), 6) AS gini
  FROM (
    SELECT cnt, g,
           coalesce(sum(g) OVER (ORDER BY cnt
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM (
      SELECT cnt, count(*) AS g
      FROM (SELECT {key} AS k, count(*) AS cnt FROM {table} GROUP BY {key})
      GROUP BY cnt
    )
  )
"""


_SKEW_SQL = (
    _skew_audit_sql("events.user_id", "events", "user_id")
    + "UNION ALL"
    + _skew_audit_sql("lineitem.l_suppkey", "lineitem", "l_suppkey")
)


@register("skew_profile", sql=_SKEW_SQL)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    def audit(label: str, table: str, key: str) -> DataFrame:
        counts = (
            T(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        tie_groups = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("g"))
        # cumulative keys strictly below this count value — the window
        # input is the distinct-count-value grain, NOT |keys|.
        w = Window.orderBy("cnt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        grouped = tie_groups.select(
            "cnt", "g", F.coalesce(F.sum("g").over(w), F.lit(0)).alias("before")
        )
        g, cnt, before = F.col("g"), F.col("cnt"), F.col("before")
        n, s = F.sum(g), F.sum(cnt * g)
        s1x2 = F.sum(cnt * (2 * g * before + g * (g + 1)))
        return grouped.agg(
            F.lit(label).alias("audit_key"),
            n.cast("long").alias("n_keys"),
            s.cast("long").alias("n_rows"),
            F.max(cnt).cast("long").alias("max_rows"),
            # integer ratios -> exact half-up (compat.dratio): the
            # double round ties on terminating expansions
            dratio(F.max(cnt), s, 6).alias("top_share"),
            dratio(F.max(cnt) * n, s, 6).alias("skew_ratio"),
            F.round(
                (s1x2 - (n + F.lit(1.0)) * s) / (n.cast("double") * s),
                6,
            ).alias("gini"),
        )

    return audit("events.user_id", "events", "user_id").unionByName(
        audit("lineitem.l_suppkey", "lineitem", "l_suppkey")
    )


# ---------------------------------------------------------------------------
# orders_priority_drift — categorical-distribution drift check: the
# order-priority mix before vs from mid-1998, as a chi-square decomposition
# per category (the test a DQ gate runs on any label/enum column
# between yesterday's batch and today's). Plan: ONE pass over orders to
# the |priorities|×2 contingency grain, totals via a window over that
# tiny frame, and each category's chi-square contribution computed
# ROW-LOCAL from exact integer counts — no cross-row float sum exists
# anywhere, so there is no aggregation-order nondeterminism to guard.
# ---------------------------------------------------------------------------

_PRIORITY_DRIFT_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS priority,
         sum(CASE WHEN o_orderdate <  DATE '1998-07-01' THEN 1 ELSE 0 END)
           AS n_early,
         sum(CASE WHEN o_orderdate >= DATE '1998-07-01' THEN 1 ELSE 0 END)
           AS n_late
  FROM orders GROUP BY o_orderpriority
),
tot AS (
  SELECT priority, n_early, n_late,
         sum(n_early) OVER () AS tot_early,
         sum(n_late) OVER ()  AS tot_late
  FROM cells
)
SELECT priority,
       CAST(n_early AS BIGINT) AS n_early,
       CAST(n_late AS BIGINT)  AS n_late,
       CAST((2 * CAST((n_early) AS BIGINT) * 1000000 + CAST((NULLIF(tot_early, 0)) AS BIGINT)) // (2 * CAST((NULLIF(tot_early, 0)) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS share_early,
       CAST((2 * CAST((n_late) AS BIGINT) * 1000000 + CAST((NULLIF(tot_late, 0)) AS BIGINT)) // (2 * CAST((NULLIF(tot_late, 0)) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS share_late,
       round(
         pow(n_early - CAST((n_early + n_late) * tot_early AS DOUBLE)
                        / (tot_early + tot_late), 2)
           / NULLIF(CAST((n_early + n_late) * tot_early AS DOUBLE)
              / (tot_early + tot_late), 0)
         + pow(n_late - CAST((n_early + n_late) * tot_late AS DOUBLE)
                         / (tot_early + tot_late), 2)
           / NULLIF(CAST((n_early + n_late) * tot_late AS DOUBLE)
              / (tot_early + tot_late), 0), 6) AS chi2_contrib
FROM tot
"""


@register("orders_priority_drift", sql=_PRIORITY_DRIFT_SQL)
def orders_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pivot = F.lit("1998-07-01").cast("date")
    cells = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(
                F.when(F.to_date("o_orderdate") < pivot, 1).otherwise(0)
            ).alias("n_early"),
            F.sum(
                F.when(F.to_date("o_orderdate") >= pivot, 1).otherwise(0)
            ).alias("n_late"),
        )
    )
    w = Window.partitionBy()
    tot = cells.select(
        "priority",
        "n_early",
        "n_late",
        F.sum("n_early").over(w).alias("tot_early"),
        F.sum("n_late").over(w).alias("tot_late"),
    )
    n_e, n_l = F.col("n_early"), F.col("n_late")
    t_e, t_l = F.col("tot_early"), F.col("tot_late")
    # nullif-guarded denominators: a degenerate split (all orders on
    # one side of the pivot) yields NULL on BOTH engines instead of
    # Spark-NULL vs DuckDB inf/error divergence.
    e_early = ((n_e + n_l) * t_e).cast("double") / (t_e + t_l)
    e_late = ((n_e + n_l) * t_l).cast("double") / (t_e + t_l)
    nz = lambda c: F.nullif(c, F.lit(0))  # noqa: E731
    return tot.select(
        "priority",
        n_e.cast("long").alias("n_early"),
        n_l.cast("long").alias("n_late"),
        dratio(n_e, nz(t_e), 6).alias("share_early"),
        dratio(n_l, nz(t_l), 6).alias("share_late"),
        F.round(
            F.pow(n_e - e_early, 2) / nz(e_early)
            + F.pow(n_l - e_late, 2) / nz(e_late),
            6,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# dq_profile — Deequ-style column profiler (Schelter et al., "Automating
# large-scale data quality verification", VLDB 2018: the ColumnProfiler
# pass): per column, row count, null count, exact distinct count, and
# min/max — the statistics a pipeline owner reads before writing rules
# like the dq_violations suite. All values profile through a canonical
# VARCHAR cast so one schema covers every column type (keys, enums,
# dates) and both engines compare identical strings.
#
# This is the deliberate HIGH-CARDINALITY twin of
# queries/advanced.profile_orders: that one computes the same stats as
# ONE wide driver-row aggregate (count_distinct per column => Catalyst
# Expand, |cols| x rows shuffle input collapsing to a single row) —
# unbeatable for low-cardinality enum columns. This one stacks to the
# (column, value) grain and aggregates twice, so the shuffle is
# bounded by the sum of per-column CARDINALITIES and the distinct
# count is a group count — the shape that survives profiling a
# billion-distinct key column, where the wide single-row aggregate
# concentrates every distinct value into one reducer. A profiler owner
# picks per column class; the engine ships both plans, oracle-checked.
#
# Scale shape: ONE scan of orders; stack() fans each row out to the
# (column, value) grain row-locally, then a two-level hash aggregate —
# (column, value) partials (map-side combine collapses repeated enum
# values before the shuffle) collapse to the |columns| grain. The exact
# distinct count is the first-level group count, so no per-column
# count(DISTINCT) expansion and no second scan. At 100 TB the shuffle
# is bounded by sum of per-column cardinalities, not rows x columns.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_orderkey",
    "o_custkey",
    "o_orderdate",
]

_PROFILE_SQL = (
    "WITH stacked AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS v"
        " FROM orders"
        for c in _PROFILE_COLS
    )
    + """
),
g AS (
  SELECT column_name, v, count(*) AS cnt
  FROM stacked GROUP BY column_name, v
)
SELECT column_name,
       CAST(sum(cnt) AS BIGINT)                                 AS n_rows,
       CAST(sum(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT)
                                                                AS n_null,
       CAST(count(v) AS BIGINT)                                 AS n_distinct,
       min(v)                                                   AS min_v,
       max(v)                                                   AS max_v
FROM g
GROUP BY column_name
"""
)


@register("dq_profile", sql=_PROFILE_SQL)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    stacked = orders.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, v)"
        )
    )
    g = stacked.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return g.groupBy("column_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.count("v").cast("long").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


# ---------------------------------------------------------------------------
# dq_drift_psi — population-stability-index drift between two
# deterministic halves of orders (the production data-drift alarm:
# PSI = sum over categories of (p_a - p_b) * ln(p_a / p_b), with the
# conventional gates PSI < 0.1 stable / > 0.25 action). Halves come
# from the Knuth hash of o_orderkey, so the audit is reproducible and,
# on synthetic uniform data, PSI ~ 0 — the query pins the ARITHMETIC,
# and swapping one half for a new drop turns it into the real alarm.
# Laplace +1 smoothing keeps every category's ratio finite even when a
# value appears in only one half (the standard epsilon treatment).
#
# Determinism: category counts are exact integers; each category's PSI
# contribution is computed ROW-LOCAL from those integers, and the
# per-column sum folds over the category-sorted list (float addition
# order fixed on both engines — the mixture_temperature discipline).
# Scale: one scan, stack() fan-out, (column, value) hash agg; the fold
# runs on the per-column category list, enum-sized by construction —
# profile high-cardinality columns through dq_profile buckets first.
# ---------------------------------------------------------------------------

_DRIFT_COLS = ["o_orderstatus", "o_orderpriority"]

_DRIFT_SQL = (
    "WITH st AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS v,"
        " ((o_orderkey * 2654435761) % 4294967296) % 2 AS half"
        " FROM orders"
        for c in _DRIFT_COLS
    )
    + """
),
g AS (
  SELECT column_name, v,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM st GROUP BY column_name, v
),
tot AS (
  SELECT column_name,
         CAST(sum(na) AS BIGINT)   AS ta,
         CAST(sum(nb) AS BIGINT)   AS tb,
         CAST(count(*) AS BIGINT)  AS k
  FROM g GROUP BY column_name
),
c AS (
  SELECT g.column_name, g.v, t.ta, t.tb, t.k,
         (CAST(g.na + 1 AS DOUBLE) / (t.ta + t.k)
          - CAST(g.nb + 1 AS DOUBLE) / (t.tb + t.k))
         * ln((CAST(g.na + 1 AS DOUBLE) / (t.ta + t.k))
              / (CAST(g.nb + 1 AS DOUBLE) / (t.tb + t.k))) AS contrib
  FROM g JOIN tot t ON t.column_name = g.column_name
)
SELECT column_name,
       min(k)  AS n_categories,
       min(ta) AS n_half_a,
       min(tb) AS n_half_b,
       round(list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY v)),
         (acc, y) -> acc + y), 6) AS psi
FROM c
GROUP BY column_name
"""
)


@register("dq_drift_psi", sql=_DRIFT_SQL)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    half = (
        (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296) % 2
    )
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _DRIFT_COLS
    )
    st = orders.select(
        half.alias("half"),
        F.expr(
            f"stack({len(_DRIFT_COLS)}, {stack_args}) AS (column_name, v)"
        ),
    )
    # g feeds both the totals and the contribution branch; it is
    # enum-sized, so one localCheckpoint keeps the orders scan single.
    g = st.groupBy("column_name", "v").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    ).localCheckpoint()
    tot = g.groupBy("column_name").agg(
        F.sum("na").cast("long").alias("ta"),
        F.sum("nb").cast("long").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    pa = (F.col("na") + 1).cast("double") / (F.col("ta") + F.col("k"))
    pb = (F.col("nb") + 1).cast("double") / (F.col("tb") + F.col("k"))
    c = g.join(F.broadcast(tot), "column_name").select(
        "column_name",
        "v",
        "ta",
        "tb",
        "k",
        ((pa - pb) * F.log(pa / pb)).alias("contrib"),
    )
    psi = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("v", "contrib"))),
            lambda r: r["contrib"],
        ),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )
    return c.groupBy("column_name").agg(
        F.min("k").alias("n_categories"),
        F.min("ta").alias("n_half_a"),
        F.min("tb").alias("n_half_b"),
        F.round(psi, 6).alias("psi"),
    )


# ---------------------------------------------------------------------------
# dq_benford — Benford's-law first-digit audit over o_totalprice: the
# classic fraud/synthetic-data screen (Hill 1995) a DQ pipeline runs on
# monetary columns. Observed first-significant-digit counts vs the
# Benford expectation p(d) = log10(1 + 1/d), one chi-square
# contribution per digit. TPC-H totalprice is NOT Benford-distributed
# (it is a bounded sum of uniforms), so the audit fires — which is the
# interesting output: the query is the alarm, the data is the control.
#
# Scale shape: first_digit is a row-local substring of the decimal's
# canonical string form (always positive, no leading zeros), so the
# whole audit is ONE scan + one 9-row hash aggregate; the Benford
# expectation and chi-square are per-digit float ops on exact integer
# counts, rounded to 6dp on both engines. Nothing shuffles more than
# 9 groups at 100 TB.
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
WITH d AS (
  SELECT substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS digit
  FROM orders
),
g AS (
  SELECT digit, count(*) AS n_obs FROM d GROUP BY digit
),
t AS (
  SELECT g.*, sum(n_obs) OVER () AS n_total FROM g
)
SELECT CAST(digit AS BIGINT)                                AS digit,
       CAST(n_obs AS BIGINT)                                AS n_obs,
       round(log10(1 + 1.0 / CAST(digit AS BIGINT)), 6)     AS benford_share,
       CAST((2 * CAST((n_obs) AS BIGINT) * 1000000 + CAST((n_total) AS BIGINT)) // (2 * CAST((n_total) AS BIGINT)) AS DOUBLE) / 1000000.0            AS observed_share,
       round(pow(n_obs - n_total * log10(1 + 1.0 / CAST(digit AS BIGINT)), 2)
             / (n_total * log10(1 + 1.0 / CAST(digit AS BIGINT))), 6)
                                                            AS chi2_contrib
FROM t
"""


@register("dq_benford", sql=_BENFORD_SQL)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    g = (
        T(spark, sf_dir, "orders")
        .select(
            F.substring(F.col("o_totalprice").cast("string"), 1, 1).alias(
                "digit"
            )
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = g.select(
        "digit", "n_obs", F.sum("n_obs").over(Window.partitionBy()).alias("n_total")
    )
    dig = F.col("digit").cast("long")
    share = F.log10(1 + 1.0 / dig)
    exp_n = F.col("n_total") * share
    return t.select(
        dig.alias("digit"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(share, 6).alias("benford_share"),
        dratio(F.col("n_obs"), F.col("n_total"), 6).alias(
            "observed_share"
        ),
        F.round(F.pow(F.col("n_obs") - exp_n, 2) / exp_n, 6).alias(
            "chi2_contrib"
        ),
    )


# ---------------------------------------------------------------------------
# orders_winsorize — robust-moment preprocessing: clamp o_totalprice at
# the p01/p99 HISTOGRAM-EDGE thresholds and report raw vs winsorized
# means plus clamp counts — the outlier treatment a feature pipeline
# applies before training on heavy-tailed monetary columns.
#
# Exact percentiles of a continuous column would need a global sort of
# a near-unique domain — the anti-pattern this repo's percentile
# queries avoid. Winsorization doesn't need them: clamping to the EDGE
# of the bucket containing the percentile is the standard
# histogram-sketch answer (what approx_percentile-based clamps do in
# production), and it's exact-integer decidable: bucket to a bounded
# width-1000 domain, one cumulative window over the ~|max/1000| bucket
# grain, pick thresholds by integer rank (ceil via (n+99)//100 — no
# float), then one more scan clamps and folds exact DECIMAL moments.
# Thresholds are a 1-row broadcast; two scans total, both
# column-pruned to o_totalprice.
# ---------------------------------------------------------------------------

_WINSORIZE_SQL = """
WITH b AS (
  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS bucket, count(*) AS c
  FROM orders GROUP BY bucket
),
cum AS (
  SELECT bucket,
         sum(c) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER () AS n
  FROM b
),
thr AS (
  SELECT min(CASE WHEN cum_c >= (n + 99) // 100 THEN bucket END) * 1000
           AS lo_clamp,
         (min(CASE WHEN cum_c >= (99 * n + 99) // 100 THEN bucket END) + 1)
           * 1000 AS hi_clamp,
         min(n) AS n
  FROM cum
),
w AS (
  SELECT CAST(o_totalprice AS DECIMAL(14,2)) AS v,
         greatest(least(CAST(o_totalprice AS DECIMAL(14,2)),
                        CAST(hi_clamp AS DECIMAL(14,2))),
                  CAST(lo_clamp AS DECIMAL(14,2))) AS wv,
         lo_clamp, hi_clamp, n
  FROM orders, thr
)
SELECT CAST(min(n) AS BIGINT)                         AS n_orders,
       CAST(min(lo_clamp) AS BIGINT)                  AS lo_clamp,
       CAST(min(hi_clamp) AS BIGINT)                  AS hi_clamp,
       CAST(sum(CASE WHEN v < lo_clamp THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_clamped_lo,
       CAST(sum(CASE WHEN v > hi_clamp THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_clamped_hi,
       round(CAST(round(sum(v), 2) AS DOUBLE) / count(*), 6)  AS mean_raw,
       round(CAST(round(sum(wv), 2) AS DOUBLE) / count(*), 6) AS mean_winsorized
FROM w
"""


@register("orders_winsorize", sql=_WINSORIZE_SQL)
def orders_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = T(spark, sf_dir, "orders")
    b = (
        orders.select(
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # both windows run over the ~|max_price/1000| bucket grain — a few
    # hundred rows regardless of order count
    cum = b.select(
        "bucket",
        F.sum("c")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum_c"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    p01_rank = F.expr("(n + 99) div 100")
    p99_rank = F.expr("(99 * n + 99) div 100")
    thr = cum.agg(
        (
            F.min(F.when(F.col("cum_c") >= p01_rank, F.col("bucket"))) * 1000
        ).alias("lo_clamp"),
        (
            (
                F.min(F.when(F.col("cum_c") >= p99_rank, F.col("bucket")))
                + 1
            )
            * 1000
        ).alias("hi_clamp"),
        F.min("n").alias("n"),
    )
    v = F.col("o_totalprice").cast("decimal(14,2)")
    w = orders.crossJoin(F.broadcast(thr)).select(
        v.alias("v"),
        F.greatest(
            F.least(v, F.col("hi_clamp").cast("decimal(14,2)")),
            F.col("lo_clamp").cast("decimal(14,2)"),
        ).alias("wv"),
        "lo_clamp",
        "hi_clamp",
        "n",
    )
    return w.agg(
        F.min("n").cast("long").alias("n_orders"),
        F.min("lo_clamp").cast("long").alias("lo_clamp"),
        F.min("hi_clamp").cast("long").alias("hi_clamp"),
        F.sum((F.col("v") < F.col("lo_clamp")).cast("int"))
        .cast("long")
        .alias("n_clamped_lo"),
        F.sum((F.col("v") > F.col("hi_clamp")).cast("int"))
        .cast("long")
        .alias("n_clamped_hi"),
        F.round(
            F.round(F.sum("v"), 2).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_raw"),
        F.round(
            F.round(F.sum("wv"), 2).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_winsorized"),
    )


# ---------------------------------------------------------------------------
# kanon_audit — k-anonymity of the customer table under the
# quasi-identifier (nation, market segment, account-balance decile):
# how many customers sit in QI equivalence classes smaller than k=5,
# i.e. are re-identifiable by joining public attributes? The audit a
# training-data pipeline runs before releasing "anonymized" rows.
# Output: one row per class-size bucket (1, 2-4, 5-19, 20+) with the
# class and customer counts plus each bucket's share of all customers
# — share_at_risk is the 1 + 2-4 mass.
#
# Scale shape: two stacked hash aggregates — rows to QI classes
# (bounded by the QI domain), classes to 4 size buckets. The balance
# decile comes from integer bucketing (width 1100 on the [-1000,10000]
# domain), not a percentile sort. Nothing row-grain crosses a second
# shuffle.
# ---------------------------------------------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor((c_acctbal + 1000) / 1100) AS BIGINT) AS bal_decile,
         count(*) AS class_size
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, bal_decile
),
bucketed AS (
  SELECT CASE WHEN class_size = 1 THEN 'unique'
              WHEN class_size < 5 THEN 'lt_5'
              WHEN class_size < 20 THEN 'lt_20'
              ELSE 'ge_20' END AS size_bucket,
         class_size
  FROM qi
)
SELECT size_bucket,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_customers,
       round(CAST(sum(class_size) AS DOUBLE)
             / sum(sum(class_size)) OVER (), 6) AS share
FROM bucketed GROUP BY size_bucket
"""


@register("kanon_audit", sql=_KANON_SQL)
def kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = T(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor((F.col("c_acctbal") + 1000) / 1100)
        .cast("long")
        .alias("bal_decile"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    bucketed = qi.select(
        F.when(F.col("class_size") == 1, "unique")
        .when(F.col("class_size") < 5, "lt_5")
        .when(F.col("class_size") < 20, "lt_20")
        .otherwise("ge_20")
        .alias("size_bucket"),
        "class_size",
    )
    agg = bucketed.groupBy("size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_customers"),
    )
    return agg.select(
        "size_bucket",
        "n_classes",
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(Window.partitionBy()),
            6,
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# pii_deletion_plan — the right-to-be-forgotten WORK ESTIMATE: given a
# forget set (here the deterministic user_id % 97 == 0 sample), report
# per (table, month-partition) how many rows a GDPR erasure would
# rewrite and how many of the table's partitions it touches — the plan
# a deletion job consults to schedule partition rewrites. Wide-spread
# users (events) touch almost every partition; the audit quantifies
# exactly that amplification before any file is rewritten.
#
# Scale shape: the forget membership test is a row-local modulus (a
# real system broadcasts the forget-key set); each fact reduces in ONE
# pass to its (month) partition grain; output is |tables| x |months|.
# ---------------------------------------------------------------------------

_DELETION_SQL = """
WITH ev AS (
  SELECT strftime(ts, '%Y-%m') AS month,
         CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rows_delete,
         CAST(count(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END)
              AS BIGINT) AS n_subjects
  FROM events GROUP BY month
),
ord AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rows_delete,
         CAST(count(DISTINCT CASE WHEN o_custkey % 97 = 0 THEN o_custkey END)
              AS BIGINT) AS n_subjects
  FROM orders GROUP BY month
)
SELECT * FROM (
  SELECT 'events' AS table_name, month, n_rows_delete, n_subjects,
         CAST(count(*) OVER () AS BIGINT) AS table_partitions
  FROM ev
) WHERE n_rows_delete > 0
UNION ALL
SELECT * FROM (
  SELECT 'orders' AS table_name, month, n_rows_delete, n_subjects,
         CAST(count(*) OVER () AS BIGINT) AS table_partitions
  FROM ord
) WHERE n_rows_delete > 0
"""


@register("pii_deletion_plan", sql=_DELETION_SQL)
def pii_deletion_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    def plan_for(
        df: DataFrame, tname: str, time_col: str, key_col: str
    ) -> DataFrame:
        # ONE pass per fact: conditional aggregates compute the forget
        # mass per month while every month still reaches the grain, so
        # the partition total is a window over the month grain — no
        # second scan
        month = F.date_format(time_col, "yyyy-MM").alias("month")
        forget = F.col(key_col) % 97 == 0
        grain = df.groupBy(month).agg(
            F.sum(forget.cast("int")).cast("long").alias("n_rows_delete"),
            F.count_distinct(F.when(forget, F.col(key_col)))
            .cast("long")
            .alias("n_subjects"),
        )
        return (
            grain.withColumn(
                "table_partitions",
                F.count(F.lit(1))
                .over(Window.partitionBy())
                .cast("long"),
            )
            .filter(F.col("n_rows_delete") > 0)
            .select(
                F.lit(tname).alias("table_name"),
                "month",
                "n_rows_delete",
                "n_subjects",
                "table_partitions",
            )
        )

    ev = plan_for(T(spark, sf_dir, "events"), "events", "ts", "user_id")
    orders = plan_for(
        T(spark, sf_dir, "orders"), "orders", "o_orderdate", "o_custkey"
    )
    return ev.unionByName(orders)


# ---------------------------------------------------------------------------
# table_fingerprint — order-independent per-partition content hashes:
# every row serializes to a canonical string, hashes to a 60-bit
# integer, and each (table, month) partition reports the SUM of its
# row hashes mod 2^60 — a fingerprint any copy of the data reproduces
# regardless of row order, file layout, or partitioning. This is the
# replication/migration validation primitive (distcp checksum, table
# diff at the partition grain): fingerprints disagree => that
# partition diverged, without ever joining the two copies row-by-row.
#
# Scale shape: one scan per fact, row-local md5, one hash aggregate to
# the month grain. Addition is commutative/associative and the
# DECIMAL(38,0) accumulator is exact, so shuffle order can never
# change the fingerprint — the property that makes it comparable
# ACROSS engines and clusters (DuckDB derives the identical value).
# The canonical serialization pins decimals to 2 places, exactly the
# cross-engine rendering dq_profile already proves out.
# ---------------------------------------------------------------------------

_FP_MOD = 1 << 60

_FINGERPRINT_SQL = f"""
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(concat('0x', substring(md5(
           CAST(o_orderkey AS VARCHAR) || '|' ||
           CAST(o_custkey AS VARCHAR) || '|' ||
           o_orderstatus || '|' ||
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
           o_orderpriority
         ), 2, 15)) AS BIGINT) AS hv
  FROM orders
),
l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(concat('0x', substring(md5(
           CAST(l_orderkey AS VARCHAR) || '|' ||
           CAST(l_linenumber AS VARCHAR) || '|' ||
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
           l_returnflag
         ), 2, 15)) AS BIGINT) AS hv
  FROM lineitem
)
SELECT 'orders' AS table_name, month,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(hv AS DECIMAL(38,0))) % {_FP_MOD} AS BIGINT)
         AS fingerprint
FROM o GROUP BY month
UNION ALL
SELECT 'lineitem' AS table_name, month,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(hv AS DECIMAL(38,0))) % {_FP_MOD} AS BIGINT)
         AS fingerprint
FROM l GROUP BY month
"""


@register("table_fingerprint", sql=_FINGERPRINT_SQL)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, tname: str, month_col, canon) -> DataFrame:
        hv = F.conv(F.substring(F.md5(canon), 2, 15), 16, 10).cast(
            "bigint"
        )
        return (
            df.select(month_col.alias("month"), hv.alias("hv"))
            .groupBy("month")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.sum(F.col("hv").cast("decimal(38,0)")) % _FP_MOD)
                .cast("long")
                .alias("fingerprint"),
            )
            .select(
                F.lit(tname).alias("table_name"),
                "month",
                "n_rows",
                "fingerprint",
            )
        )

    orders = T(spark, sf_dir, "orders")
    o_canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.col("o_orderpriority"),
    )
    li = T(spark, sf_dir, "lineitem")
    l_canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string"),
        F.col("l_returnflag"),
    )
    return fp(
        orders, "orders", F.date_format("o_orderdate", "yyyy-MM"), o_canon
    ).unionByName(
        fp(li, "lineitem", F.date_format("l_shipdate", "yyyy-MM"), l_canon)
    )
