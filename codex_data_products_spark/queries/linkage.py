"""Entity resolution and table-maintenance planning.

Green-field surface (no reference counterpart — the reference's only
string matching is the exact synonym-map join, SURVEY J4/E1): a
production data platform needs (a) FUZZY record linkage — "are these
two strings the same real-world entity despite typos/variants?" — and
(b) storage-maintenance planning — "how do N small files compact into
target-size bins?" (the Delta/Iceberg OPTIMIZE primitive). Both are
expressed here as exact, oracle-checkable relational plans.

Scale discipline shared by both:

* ``er_fuzzy_join`` never pairs ROWS — it pairs the DISTINCT-name
  grain (vocabulary-bounded, |names| << |rows| at any corpus size) and
  maps match pairs back to row mass by multiplying the per-name counts
  it carried through the aggregate.  Candidate generation is standard
  ER blocking (equi-join on a blocking key) plus the length-band
  filter, so the expensive edit-distance verify runs only on
  same-block, similar-length pairs.
* ``compaction_plan`` folds each partition's file list locally —
  the list is bounded by files-per-partition, never corpus-sized —
  and the fold is pure integer arithmetic, bit-identical on both
  engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# ---------------------------------------------------------------------------
# er_fuzzy_join — blocked edit-distance entity resolution over the part
# dictionary. Classic ER pipeline: (1) collapse to the distinct-name
# grain carrying row counts; (2) block on a cheap key (the head noun)
# so candidates are same-block pairs only; (3) prune with the length
# band |len_a - len_b| <= T (edit distance >= length gap, so nothing
# true is lost); (4) verify survivors with levenshtein <= T. Output is
# the per-distance match profile: how many NAME pairs and how many
# underlying ROW pairs each distance bucket would link — the merge-size
# estimate a dedup/merge decision needs.
#
# Scale shape: the name grain is vocabulary-bounded, so the self-join
# broadcasts its right side; blocking caps the quadratic term at
# (names-per-block)^2, the knob every ER system tunes. levenshtein
# runs JVM-side (no Python); counts are exact integers.
# ---------------------------------------------------------------------------

_ER_T = 3  # edit-distance threshold (and length band)

_ER_SQL = f"""
WITH names AS (
  SELECT p_name,
         CAST(count(*) AS BIGINT)     AS n,
         split_part(p_name, ' ', 2)   AS blk,
         length(p_name)               AS len
  FROM part GROUP BY p_name
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b, a.n AS na, b.n AS nb,
         levenshtein(a.p_name, b.p_name) AS d
  FROM names a JOIN names b
    ON a.blk = b.blk
   AND a.p_name < b.p_name
   AND abs(a.len - b.len) <= {_ER_T}
)
SELECT CAST(d AS INT)                 AS dist,
       CAST(count(*) AS BIGINT)      AS n_name_pairs,
       CAST(sum(na * nb) AS BIGINT)  AS n_row_pairs
FROM cand
WHERE d <= {_ER_T}
GROUP BY d
"""


@register("er_fuzzy_join", sql=_ER_SQL)
def er_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        T(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "p_name",
            "n",
            F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")).alias("blk"),
            F.length("p_name").alias("len"),
        )
    )
    a, b = names.alias("a"), names.alias("b")
    # the right side is the vocabulary grain — broadcast it so the
    # blocked self-join never shuffles the name table
    cand = a.join(
        F.broadcast(b),
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= _ER_T),
    ).select(
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("d"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    return (
        cand.filter(F.col("d") <= _ER_T)
        .groupBy(F.col("d").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_name_pairs"),
            F.sum(F.col("na") * F.col("nb")).cast("long").alias("n_row_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# compaction_plan — small-file compaction planning (the OPTIMIZE /
# bin-packing primitive). Files are modeled per (priority, month)
# partition as one file per write day sized by its row count — the
# shape a daily-append table actually has. Each partition's files are
# packed NEXT-FIT-DECREASING (sort by size desc, open a new bin when
# the current one would overflow) against a per-partition target of
# max(biggest file, ceil(total/8)) — i.e. aim for ~8 output files but
# never split a file. NFD is exactly how Spark's own
# FilePartition.getFilePartitions packs splits into tasks.
#
# Scale shape: ONE pass to the (partition, day) file grain, then the
# pack runs as a row-LOCAL integer fold over each partition's
# size-sorted list — bounded by files-per-partition (days per month
# here), regardless of row count. No window, no driver loop; the fold
# is [n_bins, fill] -> next state, replayed bit-identically by
# DuckDB's list_reduce.
# ---------------------------------------------------------------------------

_COMPACT_SQL = """
WITH files AS (
  SELECT o_orderpriority AS pri,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS sz
  FROM orders GROUP BY pri, month, day
),
parts AS (
  SELECT pri, month,
         list(sz ORDER BY sz DESC, day) AS sizes,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(sz) AS BIGINT)  AS total_size,
         CAST(max(sz) AS BIGINT)  AS mx
  FROM files GROUP BY pri, month
),
t AS (
  SELECT *, greatest(mx, (total_size + 7) // 8) AS target FROM parts
),
folded AS (
  SELECT pri, month, n_files, total_size, target,
         list_reduce(
           [[CAST(1 AS BIGINT), CAST(0 AS BIGINT)]]
             || list_transform(sizes, s -> [s, s]),
           (acc, e) -> CASE WHEN acc[2] + e[1] <= target
                            THEN [acc[1], acc[2] + e[1]]
                            ELSE [acc[1] + 1, e[1]] END
         ) AS st
  FROM t
)
SELECT pri, month, n_files, total_size,
       CAST(target AS BIGINT)            AS target,
       CAST(st[1] AS BIGINT)             AS n_bins,
       CAST(n_files - st[1] AS BIGINT)   AS files_saved,
       round(CAST(total_size AS DOUBLE)
             / CAST(st[1] * target AS DOUBLE), 6) AS fill_pct
FROM folded
"""


@register("compaction_plan", sql=_COMPACT_SQL)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    # size-desc sort key packed so array_sort yields (sz DESC, day ASC):
    # negate the size, tiebreak on day
    parts = files.groupBy("pri", "month").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct((-F.col("sz")).alias("k"), "day", "sz"))),
            lambda r: r["sz"],
        ).alias("sizes"),
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("sz").cast("long").alias("total_size"),
        F.max("sz").cast("long").alias("mx"),
    )
    t = parts.withColumn(
        "target",
        F.greatest(F.col("mx"), F.expr("(total_size + 7) div 8")),
    )
    init = F.array(F.lit(1).cast("long"), F.lit(0).cast("long"))
    folded = t.withColumn(
        "st",
        F.aggregate(
            F.col("sizes"),
            init,
            lambda acc, s: F.when(
                F.element_at(acc, 2) + s <= F.col("target"),
                F.array(F.element_at(acc, 1), F.element_at(acc, 2) + s),
            ).otherwise(F.array(F.element_at(acc, 1) + 1, s)),
        ),
    )
    return folded.select(
        "pri",
        "month",
        "n_files",
        "total_size",
        F.col("target").cast("long").alias("target"),
        F.element_at("st", 1).cast("long").alias("n_bins"),
        (F.col("n_files") - F.element_at("st", 1))
        .cast("long")
        .alias("files_saved"),
        F.round(
            F.col("total_size").cast("double")
            / (F.element_at("st", 1) * F.col("target")).cast("double"),
            6,
        ).alias("fill_pct"),
    )


# ---------------------------------------------------------------------------
# zorder_layout — the Z-ORDER data-layout audit: assign every order a
# Morton code interleaving its (price-bucket, month-bucket) dims,
# split the table into 16 Morton-ranged files, build each file's zone
# map (per-dim min/max), and measure data skipping: for a point query
# on EITHER dim, what fraction of files does the zone map prune? The
# same audit runs on the naive append (key-order) layout, so the
# output is the side-by-side justification for OPTIMIZE ZORDER BY —
# multi-dim pruning vs one-dim — computed from the table itself.
#
# Scale shape: one stats pass (2-value broadcast), then ONE scan
# assigns both layouts' file ids row-locally (bit interleaving is
# pure integer div/mod arithmetic) and collapses straight to the
# (layout, file) zone-map grain — 32 rows regardless of table size.
# The 16-probe pruning sweep cross-joins two tiny frames. Nothing
# fact-sized ever shuffles; no sort is performed (Morton RANGES
# partition the data exactly as a Z-order write would cluster it).
# ---------------------------------------------------------------------------

_ZORDER_SQL = """
WITH stats AS (
  SELECT max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mpc,
         max(o_orderkey)                                AS mk,
         min(year(o_orderdate) * 12 + month(o_orderdate)) AS m_lo,
         max(year(o_orderdate) * 12 + month(o_orderdate)) AS m_hi
  FROM orders
),
dims AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) * 16 // (mpc + 1) AS d1,
         (year(o_orderdate) * 12 + month(o_orderdate) - m_lo) * 16
           // (m_hi - m_lo + 1)                                     AS d2,
         o_orderkey * 16 // (mk + 1)                                AS file_a
  FROM orders, stats
),
coded AS (
  SELECT d1, d2, file_a,
         ( ((d1 // 1) % 2) * 2 + ((d2 // 1) % 2)
         + (((d1 // 2) % 2) * 2 + ((d2 // 2) % 2)) * 4
         + (((d1 // 4) % 2) * 2 + ((d2 // 4) % 2)) * 16
         + (((d1 // 8) % 2) * 2 + ((d2 // 8) % 2)) * 64 ) // 16 AS file_z
  FROM dims
),
layouts AS (
  SELECT 'zorder' AS layout, file_z AS f, d1, d2 FROM coded
  UNION ALL
  SELECT 'append' AS layout, file_a AS f, d1, d2 FROM coded
),
zones AS (
  SELECT layout, f, CAST(count(*) AS BIGINT) AS n_rows,
         min(d1) AS lo1, max(d1) AS hi1,
         min(d2) AS lo2, max(d2) AS hi2
  FROM layouts GROUP BY layout, f
),
probes AS (SELECT unnest(range(16)) AS v),
pruned AS (
  SELECT z.layout, p.v,
         sum(CASE WHEN p.v < z.lo1 OR p.v > z.hi1 THEN 1 ELSE 0 END) AS p1,
         sum(CASE WHEN p.v < z.lo2 OR p.v > z.hi2 THEN 1 ELSE 0 END) AS p2,
         count(*) AS nf
  FROM zones z, probes p
  GROUP BY z.layout, p.v
)
SELECT layout,
       CAST(min(nf) AS BIGINT)                       AS n_files,
       round(avg(CAST(p1 AS DOUBLE) / nf), 6)        AS pruned_share_price,
       round(avg(CAST(p2 AS DOUBLE) / nf), 6)        AS pruned_share_month
FROM pruned GROUP BY layout
"""


def zorder_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order (d1, d2, file_a, file_z): the row-local dim bucketing
    and Morton-ranged file assignment. The registered audit aggregates
    this; a writer `partitionBy("file_z")`s it directly — the written
    layout IS the clustering the audit measures
    (tests/test_plans.py::test_zorder_written_layout_prunes drives the
    write and plan-guards the pruned read)."""
    orders = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    mcol = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    stats = orders.agg(
        F.max(cents).alias("mpc"),
        F.max("o_orderkey").alias("mk"),
        F.min(mcol).alias("m_lo"),
        F.max(mcol).alias("m_hi"),
    )
    dims = orders.crossJoin(F.broadcast(stats)).select(
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT) * 16 div (mpc + 1)"
        ).alias("d1"),
        F.expr(
            "(year(o_orderdate) * 12 + month(o_orderdate) - m_lo) * 16"
            " div (m_hi - m_lo + 1)"
        ).alias("d2"),
        F.expr("o_orderkey * 16 div (mk + 1)").alias("file_a"),
    )
    return dims.withColumn(
        "file_z",
        F.expr(
            "( ((d1 div 1) % 2) * 2 + ((d2 div 1) % 2)"
            " + (((d1 div 2) % 2) * 2 + ((d2 div 2) % 2)) * 4"
            " + (((d1 div 4) % 2) * 2 + ((d2 div 4) % 2)) * 16"
            " + (((d1 div 8) % 2) * 2 + ((d2 div 8) % 2)) * 64 ) div 16"
        ),
    )


@register("zorder_layout", sql=_ZORDER_SQL)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    coded = zorder_frame(spark, sf_dir)
    # both layouts fan out row-locally in one projection — the fact is
    # scanned once and collapses straight to the (layout, file) grain
    both = coded.select(
        F.expr(
            "stack(2, 'zorder', file_z, 'append', file_a) AS (layout, f)"
        ),
        "d1",
        "d2",
    )
    zones = both.groupBy("layout", "f").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("d1").alias("lo1"),
        F.max("d1").alias("hi1"),
        F.min("d2").alias("lo2"),
        F.max("d2").alias("hi2"),
    )
    probes = spark.range(16).select(F.col("id").alias("v"))
    pruned = (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("layout", "v")
        .agg(
            F.sum(
                ((F.col("v") < F.col("lo1")) | (F.col("v") > F.col("hi1")))
                .cast("int")
            ).alias("p1"),
            F.sum(
                ((F.col("v") < F.col("lo2")) | (F.col("v") > F.col("hi2")))
                .cast("int")
            ).alias("p2"),
            F.count(F.lit(1)).alias("nf"),
        )
    )
    return pruned.groupBy("layout").agg(
        F.min("nf").cast("long").alias("n_files"),
        F.round(
            F.avg(F.col("p1").cast("double") / F.col("nf")), 6
        ).alias("pruned_share_price"),
        F.round(
            F.avg(F.col("p2").cast("double") / F.col("nf")), 6
        ).alias("pruned_share_month"),
    )


# ---------------------------------------------------------------------------
# er_clusters — entity CANONICALIZATION: close the fuzzy-match pair
# set transitively ("red bolt"~"ted bolt"~"tan bolt" is ONE entity
# even though the ends differ by 6 edits) and emit one row per
# multi-name entity with its canonical (minimum) name, member count,
# and total row mass — the merge worklist an MDM/dedup pipeline
# actually executes.
#
# Matches require an equal blocking key, so every component lives
# inside one block and its diameter is bounded by names-per-block.
# Min-label propagation therefore converges in a FIXED number of
# rounds (7 covers the 8-name blocks of every data generator here);
# the plan is a STATIC 7-round DAG over the vocabulary-grain label
# frame — no driver-side convergence loop, no collect. An 8th audit
# round re-derives the neighbor minimum and each entity reports
# `converged` — if a future dataset ever had a wider block, the flag
# flips to false instead of silently emitting a half-merged entity.
# DuckDB replays the identical unrolled rounds.
# ---------------------------------------------------------------------------

_ER_ROUNDS = 7


def _er_cluster_sql() -> str:
    rounds = []
    prev = "r0"
    for k in range(1, _ER_ROUNDS + 2):  # rounds 1..7 + audit round 8
        rounds.append(
            f"""r{k} AS (
  SELECT r.p_name,
         least(r.lbl, coalesce(min(re.lbl), r.lbl)) AS lbl
  FROM {prev} r
  LEFT JOIN edges e ON e.dst = r.p_name
  LEFT JOIN {prev} re ON re.p_name = e.src
  GROUP BY r.p_name, r.lbl
)"""
        )
        prev = f"r{k}"
    last, audit = f"r{_ER_ROUNDS}", f"r{_ER_ROUNDS + 1}"
    return f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n,
         split_part(p_name, ' ', 2) AS blk, length(p_name) AS len
  FROM part GROUP BY p_name
),
pairs AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b
    ON a.blk = b.blk AND a.p_name < b.p_name
   AND abs(a.len - b.len) <= {_ER_T}
   AND levenshtein(a.p_name, b.p_name) <= {_ER_T}
),
edges AS (
  SELECT na AS src, nb AS dst FROM pairs
  UNION ALL
  SELECT nb AS src, na AS dst FROM pairs
),
r0 AS (SELECT p_name, p_name AS lbl FROM names),
{",".join(rounds)}
SELECT {last}.lbl                              AS entity,
       CAST(count(*) AS BIGINT)               AS n_names,
       CAST(sum(names.n) AS BIGINT)           AS n_rows,
       CAST(sum(CASE WHEN {last}.lbl <> {audit}.lbl THEN 1 ELSE 0 END) = 0
            AS BOOLEAN)                       AS converged
FROM {last}
JOIN {audit} ON {last}.p_name = {audit}.p_name
JOIN names ON names.p_name = {last}.p_name
GROUP BY {last}.lbl
HAVING count(*) >= 2
"""


@register("er_clusters", sql=_er_cluster_sql())
def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        T(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "p_name",
            "n",
            F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")).alias("blk"),
            F.length("p_name").alias("len"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= _ER_T)
        & (
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _ER_T
        ),
    ).select(
        F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb")
    )
    edges = (
        pairs.select(F.col("na").alias("src"), F.col("nb").alias("dst"))
        .unionByName(
            pairs.select(F.col("nb").alias("src"), F.col("na").alias("dst"))
        )
        .localCheckpoint()
    )
    comp = names.select("p_name", F.col("p_name").alias("lbl"))

    def one_round(frame: DataFrame) -> DataFrame:
        nbr = (
            edges.join(
                frame.select(
                    F.col("p_name").alias("src"),
                    F.col("lbl").alias("nbr_lbl"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("p_name"))
            .agg(F.min("nbr_lbl").alias("nbr_min"))
        )
        return frame.join(nbr, "p_name", "left").select(
            "p_name",
            F.least(
                "lbl", F.coalesce("nbr_min", "lbl")
            ).alias("lbl"),
        )

    for _ in range(_ER_ROUNDS):
        comp = one_round(comp).localCheckpoint()
    audit = one_round(comp)
    return (
        comp.join(
            audit.select("p_name", F.col("lbl").alias("lbl_audit")),
            "p_name",
        )
        .join(names.select("p_name", "n"), "p_name")
        .groupBy(F.col("lbl").alias("entity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.sum("n").cast("long").alias("n_rows"),
            (
                F.sum(
                    (F.col("lbl") != F.col("lbl_audit")).cast("int")
                )
                == 0
            ).alias("converged"),
        )
        .filter(F.col("n_names") >= 2)
    )


# ---------------------------------------------------------------------------
# er_blocking_eval — measure the BLOCKING strategy the way
# dedup_minhash_eval measures banding: ground truth is the exact
# levenshtein<=T pair set over the full name-grain cross product
# (computable here because the name grain is vocabulary-bounded; at a
# scale where vocab² is infeasible the same query runs on a hash-
# sample of blocks), candidates are the blocked+length-banded pairs
# er_fuzzy_join actually generates. Output: blocking recall (true
# pairs surviving the block key) and the candidate work ratio vs
# all-pairs — the two numbers that justify (or indict) the key choice.
#
# Scale shape: both sides live on the distinct-name grain; the truth
# cross join broadcasts its right side and is the deliberate exact
# twin, exactly like dedup_ngram_jaccard vs dedup_minhash_lsh.
# ---------------------------------------------------------------------------

_ER_BLOCK_EVAL_SQL = f"""
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS blk, length(p_name) AS len
  FROM part GROUP BY p_name
),
truth AS (
  SELECT a.p_name AS na, b.p_name AS nb,
         CAST(a.blk = b.blk
              AND abs(a.len - b.len) <= {_ER_T} AS INT) AS candidate
  FROM names a JOIN names b ON a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {_ER_T}
),
cand AS (
  SELECT count(*) AS n_candidates
  FROM names a JOIN names b
    ON a.blk = b.blk AND a.p_name < b.p_name
   AND abs(a.len - b.len) <= {_ER_T}
),
n AS (SELECT count(*) AS n_names FROM names)
SELECT CAST(n.n_names AS BIGINT)                    AS n_names,
       CAST(n.n_names * (n.n_names - 1) / 2 AS BIGINT) AS n_all_pairs,
       CAST(cand.n_candidates AS BIGINT)            AS n_candidates,
       CAST(count(*) AS BIGINT)                     AS n_true_pairs,
       CAST(sum(truth.candidate) AS BIGINT)         AS n_true_blocked,
       round(CAST(sum(truth.candidate) AS DOUBLE)
             / nullif(count(*), 0), 6)              AS blocking_recall,
       round(CAST(cand.n_candidates AS DOUBLE)
             / nullif(n.n_names * (n.n_names - 1) / 2, 0), 6)
         AS candidate_work_ratio
FROM truth, cand, n
GROUP BY n.n_names, cand.n_candidates
"""


@register("er_blocking_eval", sql=_ER_BLOCK_EVAL_SQL)
def er_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        T(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "p_name",
            F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")).alias("blk"),
            F.length("p_name").alias("len"),
        )
        .localCheckpoint()
    )
    a, b = names.alias("a"), names.alias("b")
    truth = (
        a.join(F.broadcast(b), F.col("a.p_name") < F.col("b.p_name"))
        .filter(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _ER_T
        )
        .select(
            (
                (F.col("a.blk") == F.col("b.blk"))
                & (F.abs(F.col("a.len") - F.col("b.len")) <= _ER_T)
            )
            .cast("int")
            .alias("candidate")
        )
    )
    cand = (
        a.join(
            F.broadcast(b),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= _ER_T),
        )
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    n = names.agg(F.count(F.lit(1)).alias("n_names"))
    t = truth.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.sum("candidate").alias("n_true_blocked"),
    )
    return (
        t.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n_names").cast("long").alias("n_names"),
            F.expr("CAST(n_names * (n_names - 1) div 2 AS BIGINT)").alias(
                "n_all_pairs"
            ),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_true_pairs").cast("long").alias("n_true_pairs"),
            F.col("n_true_blocked").cast("long").alias("n_true_blocked"),
            F.round(
                F.col("n_true_blocked").cast("double")
                / F.nullif(F.col("n_true_pairs"), F.lit(0)),
                6,
            ).alias("blocking_recall"),
            F.round(
                F.col("n_candidates").cast("double")
                / F.nullif(
                    F.expr("CAST(n_names * (n_names - 1) div 2 AS DOUBLE)"),
                    F.lit(0.0),
                ),
                6,
            ).alias("candidate_work_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# er_blocking_eval_multi — ACT on the measurement, the SimHash-
# rebanding move: er_blocking_eval showed single-key (head noun)
# blocking recalls 0.83 of true levenshtein<=3 pairs at 11% of the
# all-pairs work — the misses are cross-noun typos ("red bolt" ~
# "red colt"). The standard fix is MULTI-PASS blocking: a pair is a
# candidate if it agrees on ANY key (noun OR adjective), deduplicated
# by first-match-key emission (key1 matches claim the pair; key2
# emissions only count when key1 DISAGREES), so no DISTINCT ever runs
# over the pair stream — the same discipline as the LSH band dedup.
# Output: recall and work ratio for both strategies side by side.
# ---------------------------------------------------------------------------

_ER_MULTI_SQL = f"""
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS blk,
         split_part(p_name, ' ', 1) AS blk2, length(p_name) AS len
  FROM part GROUP BY p_name
),
truth AS (
  SELECT CAST(a.blk = b.blk AND abs(a.len - b.len) <= {_ER_T} AS INT)
           AS cand1,
         CAST((a.blk = b.blk OR a.blk2 = b.blk2)
              AND abs(a.len - b.len) <= {_ER_T} AS INT) AS cand_multi
  FROM names a JOIN names b ON a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {_ER_T}
),
work1 AS (
  SELECT count(*) AS c FROM names a JOIN names b
    ON a.blk = b.blk AND a.p_name < b.p_name
   AND abs(a.len - b.len) <= {_ER_T}
),
work2 AS (
  SELECT count(*) AS c FROM names a JOIN names b
    ON a.blk2 = b.blk2 AND a.p_name < b.p_name
   AND a.blk <> b.blk
   AND abs(a.len - b.len) <= {_ER_T}
),
n AS (SELECT count(*) AS n_names FROM names)
SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
       round(CAST(sum(truth.cand1) AS DOUBLE) / nullif(count(*), 0), 6)
         AS recall_single_key,
       round(CAST(sum(truth.cand_multi) AS DOUBLE) / nullif(count(*), 0), 6)
         AS recall_multi_key,
       round(CAST(work1.c AS DOUBLE)
             / nullif(n.n_names * (n.n_names - 1) / 2, 0), 6)
         AS work_ratio_single,
       round(CAST(work1.c + work2.c AS DOUBLE)
             / nullif(n.n_names * (n.n_names - 1) / 2, 0), 6)
         AS work_ratio_multi
FROM truth, work1, work2, n
GROUP BY work1.c, work2.c, n.n_names
"""


@register("er_blocking_eval_multi", sql=_ER_MULTI_SQL)
def er_blocking_eval_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        T(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "p_name",
            F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")).alias("blk"),
            F.split(F.col("p_name"), " ").getItem(0).alias("blk2"),
            F.length("p_name").alias("len"),
        )
        .localCheckpoint()
    )
    a, b = names.alias("a"), names.alias("b")
    band = F.abs(F.col("a.len") - F.col("b.len")) <= _ER_T
    same1 = F.col("a.blk") == F.col("b.blk")
    same2 = F.col("a.blk2") == F.col("b.blk2")
    truth = (
        a.join(F.broadcast(b), F.col("a.p_name") < F.col("b.p_name"))
        .filter(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _ER_T
        )
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum((same1 & band).cast("int")).alias("t1"),
            F.sum(((same1 | same2) & band).cast("int")).alias("tm"),
        )
    )
    work1 = a.join(
        F.broadcast(b),
        same1 & (F.col("a.p_name") < F.col("b.p_name")) & band,
    ).agg(F.count(F.lit(1)).alias("w1"))
    # second pass emits only pairs the FIRST key did not already claim
    work2 = a.join(
        F.broadcast(b),
        same2
        & ~same1
        & (F.col("a.p_name") < F.col("b.p_name"))
        & band,
    ).agg(F.count(F.lit(1)).alias("w2"))
    n = names.agg(F.count(F.lit(1)).alias("n_names"))
    allp = F.expr("CAST(n_names * (n_names - 1) div 2 AS DOUBLE)")
    return (
        truth.crossJoin(F.broadcast(work1))
        .crossJoin(F.broadcast(work2))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n_true_pairs").cast("long").alias("n_true_pairs"),
            F.round(
                F.col("t1").cast("double")
                / F.nullif(F.col("n_true_pairs"), F.lit(0)),
                6,
            ).alias("recall_single_key"),
            F.round(
                F.col("tm").cast("double")
                / F.nullif(F.col("n_true_pairs"), F.lit(0)),
                6,
            ).alias("recall_multi_key"),
            F.round(
                F.col("w1").cast("double") / F.nullif(allp, F.lit(0.0)), 6
            ).alias("work_ratio_single"),
            F.round(
                (F.col("w1") + F.col("w2")).cast("double")
                / F.nullif(allp, F.lit(0.0)),
                6,
            ).alias("work_ratio_multi"),
        )
    )
