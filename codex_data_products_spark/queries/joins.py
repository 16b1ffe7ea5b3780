"""Join operators — SURVEY.md §2.4 (J1-J7) re-expressed Spark-first.

The reference's joins are pandas merges and dict lookups; here each shape
becomes the idiomatic Spark join with the right physical strategy
(broadcast for dims, left-semi/anti for membership, left-outer for
re-indexing against a canonical dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import (
    dsum,
    money,
    sql_dsum,
    sql_money,
)
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# join_semi — J3: membership via left-semi join (the reference uses isin
# masks, bin/concatenate.py:284-286,318-320; semi-join scales where an
# isin literal list cannot).
# ---------------------------------------------------------------------------

_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register("join_semi", sql=_SEMI_SQL)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    urgent = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# join_anti — anti-join (absent from the reference, SURVEY §2.4 note;
# Spark built-in "left_anti").
# ---------------------------------------------------------------------------

_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey
)
"""


@register("join_anti", sql=_ANTI_SQL)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# join_outer_reindex — J5: the reference re-indexes per-dataset annotation
# frames against the unioned channel axis with NaN fill
# (bin/concatenate.py:419-426) = left-outer join against the canonical
# dimension + coalesce.
# ---------------------------------------------------------------------------

_OUTER_SQL = """
SELECT
  n.n_nationkey,
  n.n_name,
  coalesce(s.n_suppliers, 0) AS n_suppliers,
  coalesce(s.total_bal, 0.0) AS total_bal
FROM nation n
LEFT JOIN (
  SELECT
    s_nationkey,
    count(*) AS n_suppliers,
    CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal
  FROM supplier
  GROUP BY s_nationkey
) s ON s.s_nationkey = n.n_nationkey
"""


@register("join_outer_reindex", sql=_OUTER_SQL)
def join_outer_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = T(spark, sf_dir, "nation")
    supp_agg = (
        T(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )
    return (
        nation.join(
            F.broadcast(supp_agg),
            nation.n_nationkey == supp_agg.s_nationkey,
            "left",
        )
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("total_bal", F.lit(0.0)).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# join_synonym — J4: the reference normalizes antibody names via a
# hardcoded synonym dict with strip→lower match and identity fallback
# (bin/concatenate.py:26-42,74-81). Re-expressed as a broadcast join of a
# literal synonym dimension + coalesce fallback — no UDF.
# ---------------------------------------------------------------------------

_SYNONYMS = [
    ("building", "CONSTRUCTION"),
    ("automobile", "AUTO"),
    ("household", "HOME"),
]

_SYN_VALUES = ", ".join(f"('{s}', '{c}')" for s, c in _SYNONYMS)

_SYN_SQL = f"""
SELECT
  c_custkey,
  c_mktsegment,
  coalesce(syn.canonical, c_mktsegment) AS segment_canonical
FROM customer
LEFT JOIN (VALUES {_SYN_VALUES}) AS syn(synonym_lower, canonical)
  ON lower(trim(c_mktsegment)) = syn.synonym_lower
"""


@register("join_synonym", sql=_SYN_SQL)
def join_synonym(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    from codex_data_products_spark.tables import local_frame

    syn = local_frame(
        spark, _SYNONYMS, "synonym_lower string, canonical string"
    )
    return (
        cust.join(
            F.broadcast(syn),
            F.lower(F.trim(cust.c_mktsegment)) == syn.synonym_lower,
            "left",
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("canonical", "c_mktsegment").alias("segment_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# join_map_lookup — J2/E11: scalar code→description lookup (the reference's
# organ_types.yaml dict, bin/concatenate.py:99-103) as a create_map literal
# expression — stays inside whole-stage codegen, zero shuffle.
# ---------------------------------------------------------------------------

_REGION_DESC = {
    "AFRICA": "African region",
    "AMERICA": "American region",
    "ASIA": "Asian region",
    "EUROPE": "European region",
    "MIDDLE EAST": "Middle-Eastern region",
}

_MAP_CASE = " ".join(f"WHEN r_name = '{k}' THEN '{v}'" for k, v in _REGION_DESC.items())

_MAP_SQL = f"""
SELECT
  n_nationkey,
  n_name,
  CASE {_MAP_CASE} ELSE 'UNKNOWN' END AS region_desc
FROM nation
JOIN region ON n_regionkey = r_regionkey
"""


@register("join_map_lookup", sql=_MAP_SQL)
def join_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    lookup = F.create_map(
        *[F.lit(x) for kv in _REGION_DESC.items() for x in kv]
    )
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(lookup[F.col("r_name")], F.lit("UNKNOWN")).alias("region_desc"),
        )
    )


# ---------------------------------------------------------------------------
# bloom_semi_join — sketch-accelerated semi join: a hand-built Bloom
# filter (k=3 multiplicative hashes into an m=1024-bit space, aggregated
# to a broadcast position set) prefilters the fact scan before the exact
# semi join removes the sketch's false positives. The oracle is the
# PLAIN semi join — result equality is the point: the sketch changes the
# plan, never the answer. At 100 TB this is what Spark's runtime row-
# group filtering does internally; building it from primitives shows the
# mechanics (and works where the built-in runtime filter can't reach,
# e.g. pre-shuffle pruning of a custom source).
# ---------------------------------------------------------------------------

_BLOOM_M = 1024
_BLOOM_HASHES = ((2654435761, 7), (40503, 131), (2246822519, 1031))

_BLOOM_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 4500)
GROUP BY o_orderstatus
"""


@register("bloom_semi_join", sql=_BLOOM_SQL)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    cust = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 4500)
    orders = T(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey", m=_BLOOM_M, hashes=_BLOOM_HASHES)
    candidate = bloom_probe(
        orders, bloom, "o_custkey", m=_BLOOM_M, hashes=_BLOOM_HASHES
    )
    # exact semi join clears false positives — sketch never changes results
    exact = candidate.join(
        cust.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return exact.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# fuzzy_join_symdel — similarity self-join at edit distance <= 1 via the
# SymSpell deletion-neighborhood trick: each name emits itself plus every
# single-character deletion as blocking keys; any two strings within one
# edit share a key, so a plain equi-join on the exploded keys finds every
# candidate pair and a final levenshtein() check kills false positives
# (e.g. transpositions, which share keys but are distance 2). The oracle
# is the brute-force quadratic join — same rows, different plan. At
# 100 TB the candidate join hash-partitions on the 8-byte xxhash of the
# key; the quadratic oracle plan would be O(n²) and is exactly what this
# operator replaces. Candidate blow-up is (len+1)× the name count, and
# map-side combine dedups pairs that share several keys.
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT s_name AS name FROM supplier)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 1
"""


def _deletion_keys(col: F.Column) -> F.Column:
    """The string itself plus every single-character deletion."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), F.length(col) - i),
        ),
    )
    return F.array_union(F.array(col), deletions)


@register("fuzzy_join_symdel", sql=_FUZZY_SQL)
def fuzzy_join_symdel(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        T(spark, sf_dir, "supplier")
        .select(F.col("s_name").alias("name"))
        .distinct()
    )
    from pyspark import StorageLevel

    # the deletion-key explode feeds both self-join sides — persist it
    # once (guide §2.4); and evaluate levenshtein once, filtering on the
    # output column instead of re-running it in a separate predicate
    keyed = names.select(
        "name", F.explode(_deletion_keys(F.col("name"))).alias("key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    right = keyed.select(
        F.col("name").alias("name_b"), F.col("key").alias("key_b")
    )
    return (
        keyed.join(
            right,
            (F.col("key") == F.col("key_b"))
            & (F.col("name") < F.col("name_b")),
        )
        .select(F.col("name").alias("name_a"), "name_b")
        .distinct()
        .withColumn(
            "edit_distance",
            F.levenshtein("name_a", "name_b").cast("long"),
        )
        .filter(F.col("edit_distance") <= 1)
    )


# ---------------------------------------------------------------------------
# merge_upsert — MERGE INTO (CDC apply) over the customer dimension: a
# deterministic change feed derived from 1997H2+ orders updates account
# balances, every 97th customer is deleted, and every 211th spawns a
# new inserted key. Implemented via operators.joins.merge_into (one
# full-outer join); the oracle spells the same semantics in SQL. At
# 100 TB the base table is bucketed on the key (plans/layout), making
# the base side of the join shuffle-free — the changes feed is the only
# side that moves.
# ---------------------------------------------------------------------------

_MERGE_SQL = """
WITH changes AS (
  SELECT o_custkey AS key,
         CASE WHEN o_custkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
           AS new_bal
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-06-01'
  GROUP BY o_custkey
  UNION ALL
  SELECT c_custkey + 100000 AS key, 'I' AS op, 0.0 AS new_bal
  FROM customer WHERE c_custkey % 211 = 0
)
SELECT coalesce(b.c_custkey, c.key)            AS c_custkey,
       coalesce(b.c_name, 'Customer#new')      AS c_name,
       CASE WHEN c.op IN ('U', 'I') AND c.new_bal IS NOT NULL
            THEN c.new_bal ELSE b.c_acctbal END AS c_acctbal,
       CASE WHEN c.op IS NULL THEN 'kept'
            WHEN c.op = 'U' THEN 'updated'
            ELSE 'inserted' END                 AS merge_action
FROM customer b
FULL OUTER JOIN changes c ON b.c_custkey = c.key
WHERE c.op IS NULL OR c.op <> 'D'
"""


@register("merge_upsert", sql=_MERGE_SQL)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.operators.joins import merge_into

    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast(
                    "double"
                ),
                2,
            ).alias("new_bal")
        )
        .select(
            "key",
            F.when(F.col("key") % 97 == 0, "D").otherwise("U").alias("op"),
            "new_bal",
        )
    )
    inserts = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 211 == 0)
        .select(
            (F.col("c_custkey") + 100000).alias("key"),
            F.lit("I").alias("op"),
            F.lit(0.0).alias("new_bal"),
        )
    )
    changes = updates.unionByName(inserts)
    return merge_into(
        cust,
        changes,
        key="c_custkey",
        change_key="key",
        op_col="op",
        set_cols={"c_acctbal": "new_bal"},
        insert_defaults={"c_name": F.lit("Customer#new")},
        action_col="merge_action",
    )


# ---------------------------------------------------------------------------
# table_diff — dataset regression diff: which rows the CDC merge
# actually changed, via operators.joins.snapshot_diff between the
# customer base and the merged output. Diffing a table against
# merge_into(table, feed) recovers the effective change feed — the
# closure property that makes diff the universal pipeline-migration
# check. Output is change-sized; unchanged rows never leave the join.
# ---------------------------------------------------------------------------

_DIFF_SQL = f"""
WITH merged AS ({_MERGE_SQL}),
o AS (SELECT c_custkey AS k, c_acctbal FROM customer),
n AS (SELECT c_custkey AS k, c_acctbal FROM merged)
SELECT c_custkey, diff_action, old_c_acctbal, new_c_acctbal FROM (
  SELECT coalesce(o.k, n.k) AS c_custkey,
         CASE WHEN o.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'changed'
         END AS diff_action,
         o.c_acctbal AS old_c_acctbal,
         n.c_acctbal AS new_c_acctbal
  FROM o FULL OUTER JOIN n ON o.k = n.k
)
WHERE diff_action IS NOT NULL
"""


@register("table_diff", sql=_DIFF_SQL)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.operators.joins import snapshot_diff

    old = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    new = merge_upsert(spark, sf_dir).select("c_custkey", "c_acctbal")
    return snapshot_diff(old, new, key="c_custkey")


# ---------------------------------------------------------------------------
# salted_join_orders — the skew-resistant equi-join as a registered,
# oracle-checked query: orders scatter across 16 salt sub-keys, the
# customer dim replicates to all of them, so one hot customer key
# spreads over 16 reducers instead of stalling one straggler task.
# Like the sketch queries, salting changes the PLAN, never the ANSWER —
# the oracle is the plain join. Use when the skewed side is too big to
# broadcast and AQE skew splitting can't see the key (e.g. pre-shuffle
# stages); cost is n_salts copies of the dim.
# ---------------------------------------------------------------------------

_SALTED_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {sql_dsum(sql_money('o_totalprice'))} AS revenue
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("salted_join_orders", sql=_SALTED_SQL)
def salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.operators.joins import salted_join

    orders = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, cust, "custkey", n_salts=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# band_join_buckets — a KEYLESS numeric band join: pair every click
# with every view that happened within ±120 s of it, ACROSS all users
# (no shared equi key exists), and profile the pairs by 30-second gap
# bucket and direction. The naive plan is a theta join (cartesian +
# filter); the scalable rewrite — the one range-join optimizers apply
# — buckets time into eps-width cells, EXPANDS each left row to its
# 3 adjacent cells, and equi-joins on the cell id: every qualifying
# pair lands in exactly one (expanded-cell == right-cell) match, each
# candidate cell holds only eps-local rows, and the residual |gap| <=
# eps filter runs on candidates, never the cross product.
#
# Scale shape: the join is a plain shuffle equi-join on the cell id —
# partitionable, skew-bounded by events-per-2-minutes. Gap arithmetic
# is exact integer MICROSECONDS (unix_micros vs epoch_us), so both
# engines bucket identically; 'div' on the non-negative |gap| floors
# identically too (negative gaps are routed through the direction
# label instead — truncate-vs-floor never fires).
# ---------------------------------------------------------------------------

_BAND_EPS_US = 120_000_000  # +/- 120 s
_BAND_BUCKET_US = 30_000_000  # 30 s histogram buckets

_BAND_SQL = f"""
WITH clicks AS (
  SELECT epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'
),
views AS (
  SELECT epoch_us(ts) AS v_us FROM events WHERE event_type = 'view'
),
pairs AS (
  SELECT c_us, v_us, abs(c_us - v_us) AS gap
  FROM clicks c JOIN views v
    ON abs(c.c_us - v.v_us) <= {_BAND_EPS_US}
)
SELECT CASE WHEN v_us < c_us THEN 'view_first'
            WHEN v_us > c_us THEN 'click_first'
            ELSE 'simultaneous' END                AS direction,
       CAST(gap // {_BAND_BUCKET_US} AS INT)       AS gap_bucket,
       CAST(count(*) AS BIGINT)                    AS n_pairs
FROM pairs
GROUP BY direction, gap_bucket
"""


@register("band_join_buckets", sql=_BAND_SQL)
def band_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros("ts").alias("c_us")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.unix_micros("ts").alias("v_us"),
        (F.unix_micros("ts") - F.unix_micros("ts") % _BAND_EPS_US).alias(
            "v_cell"
        ),
    )
    # expand each click to its cell and both neighbors: any view within
    # eps lies in one of the three, and in exactly ONE right cell — no
    # dedup needed after the residual filter
    expanded = clicks.select(
        "c_us",
        F.explode(
            F.array(
                F.lit(-_BAND_EPS_US),
                F.lit(0),
                F.lit(_BAND_EPS_US),
            )
        ).alias("off"),
    ).select(
        "c_us",
        (
            F.col("c_us") - F.col("c_us") % _BAND_EPS_US + F.col("off")
        ).alias("cell"),
    )
    pairs = expanded.join(
        views, F.col("cell") == F.col("v_cell")
    ).filter(F.abs(F.col("c_us") - F.col("v_us")) <= _BAND_EPS_US)
    return pairs.select(
        F.when(F.col("v_us") < F.col("c_us"), "view_first")
        .when(F.col("v_us") > F.col("c_us"), "click_first")
        .otherwise("simultaneous")
        .alias("direction"),
        F.expr(f"abs(c_us - v_us) div {_BAND_BUCKET_US}")
        .cast("int")
        .alias("gap_bucket"),
    ).groupBy("direction", "gap_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
