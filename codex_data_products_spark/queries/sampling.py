"""Deterministic sampling / splitting / packing for training-data curation.

Green-field LLM-pipeline surface (no reference counterpart — the
reference is a batch CODEX ETL, SURVEY.md §2.10): a 100 TB corpus engine
needs reproducible train/test splits, stratified samples, context-window
sequence packing, and mixture rebalancing. All four are expressed as
pure column arithmetic + window functions so the same rows are selected
on any cluster size and by the DuckDB oracle.

Determinism: no ``rand()`` anywhere — pseudo-randomness comes from a
Knuth multiplicative hash of the stable ``doc_id``
(``(doc_id * 2654435761) mod 2^32``), which both engines evaluate
identically in 64-bit integer arithmetic. At scale each op is one
shuffle (hash-agg or window partition); packing partitions by ``source``
so window state never concentrates on one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# Knuth multiplicative hash of doc_id — identical BIGINT math in both
# engines (doc_id < 2^22, so the product stays far below 2^63).
_SQL_HASH = "((doc_id * 2654435761) % 4294967296)"


def _doc_hash() -> F.Column:
    return (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)


def _sql_tokens() -> str:
    return r"len(regexp_split_to_array(lower(trim(text)), '\s+'))"


def _n_tokens() -> F.Column:
    return F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))


# ---------------------------------------------------------------------------
# split_train_test — 90/10 hash split. Reproducible on any partitioning:
# membership depends only on doc_id, never on row order or task layout.
# ---------------------------------------------------------------------------

_SPLIT_SQL = f"""
SELECT
  CASE WHEN {_SQL_HASH} % 100 < 90 THEN 'train' ELSE 'test' END AS split,
  count(*)                                   AS n_docs,
  CAST(sum({_sql_tokens()}) AS BIGINT)       AS n_tokens,
  CAST(sum(n_chars) AS BIGINT)               AS total_chars
FROM documents
GROUP BY split
"""


@register("split_train_test", sql=_SPLIT_SQL)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    split = F.when(_doc_hash() % 100 < 90, "train").otherwise("test")
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_n_tokens()).cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# pack_sequences — fixed-capacity context-window packing: docs in stable
# doc_id order fill 2048-token bins per source (prefix-sum assignment —
# the streaming-friendly variant of greedy first-fit). One window
# partition per source; at 100 TB, sources are further range-bucketed so
# no single partition exceeds executor memory.
# ---------------------------------------------------------------------------

_PACK_SQL = f"""
SELECT source, pack_id,
       count(*)                        AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)   AS pack_tokens
FROM (
  SELECT source, n_tokens,
         CAST(floor(CAST(sum(n_tokens) OVER w - n_tokens AS DOUBLE) / 2048)
              AS BIGINT) AS pack_id
  FROM (SELECT source, doc_id, {_sql_tokens()} AS n_tokens FROM documents)
  WINDOW w AS (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
GROUP BY source, pack_id
"""


@register("pack_sequences", sql=_PACK_SQL)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        "source", "doc_id", _n_tokens().alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = docs.withColumn(
        "pack_id", F.floor(start.cast("double") / 2048).cast("long")
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# sample_stratified — deterministic k-per-stratum sample: rank docs
# inside each language by hashed id and keep the first 40. Same rows on
# every run/cluster; the window shuffles once on lang.
# ---------------------------------------------------------------------------

_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY {_SQL_HASH}, doc_id) <= 40
"""


@register("sample_stratified", sql=_STRATIFIED_SQL)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_doc_hash(), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# mixture_weights — rebalancing factors toward a uniform source mixture:
# weight_s = target_share / observed_share. The agg output is tiny
# (|sources| rows), so the share/weight windows run post-AQE-coalesce on
# a single task — no extra shuffle of the fact table.
# ---------------------------------------------------------------------------

_MIXTURE_SQL = f"""
SELECT source, n_docs, share, tokens_share, weight
FROM (
  SELECT source, n_docs,
         round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6)     AS share,
         round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS tokens_share,
         round((1.0 / count(*) OVER ())
               / (CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ()), 6) AS weight
  FROM (
    SELECT source, count(*) AS n_docs,
           CAST(sum({_sql_tokens()}) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
  )
)
"""


@register("mixture_weights", sql=_MIXTURE_SQL)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_n_tokens()).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
    tokens_share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return per_source.select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round(tokens_share, 6).alias("tokens_share"),
        F.round(target / share, 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# curation_summary — the composed curation funnel as ONE declarative
# plan: quality gate → exact dedup (min doc_id per content hash) →
# deterministic split → per-(split, lang) accounting. Shows the
# pipeline stages fuse: Catalyst plans a single job with two shuffles
# (dedup window on the content hash, final agg), not four passes over
# the corpus like a sequential tool chain would.
# ---------------------------------------------------------------------------

_CURATION_SQL = f"""
SELECT split, lang,
       count(*)                             AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)        AS n_tokens,
       CAST(sum(n_chars) AS BIGINT)         AS n_chars
FROM (
  SELECT lang, n_chars, n_tokens,
         CASE WHEN {_SQL_HASH} % 100 < 90 THEN 'train' ELSE 'test' END AS split
  FROM (
    SELECT doc_id, lang, n_chars, n_tokens,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM (
      SELECT doc_id, lang, n_chars, text, {_sql_tokens()} AS n_tokens
      FROM documents
    )
    WHERE n_tokens >= 10
  )
  WHERE rn = 1
)
GROUP BY split, lang
"""


@register("curation_summary", sql=_CURATION_SQL)
def curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", "n_chars", "text", _n_tokens().alias("n_tokens")
    ).filter(F.col("n_tokens") >= 10)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = staged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    split = F.when(_doc_hash() % 100 < 90, "train").otherwise("test")
    return (
        deduped.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# split_contamination — train/test leakage audit: which test documents
# share 8-gram shingles with ANY train document (the standard benchmark-
# contamination check run before an eval set ships). ONE shingle
# explosion, then distinct (shingle, doc_id, split) pairs, then a
# per-shingle window max flags shingles any train doc shares — still a
# single corpus scan and no join. Deliberately NOT a per-shingle
# collect_set-of-test-docs aggregation: a boilerplate 8-gram shared by
# a large fraction of the test set would concentrate an unbounded
# in-memory array in one task, where the window's sort-based runner
# spills to disk instead — and the pair-distinct's composite key
# spreads the hot shingle's dedup work across tasks first. At 100 TB
# the key becomes xxhash64(shingle) (8 bytes instead of a ~50-byte
# string; collisions only over-flag, never under-flag), and a shingle
# whose document frequency exceeds a cap (say 10% of the test set) can
# be pre-flagged as boilerplate and dropped from the window input
# entirely. The string key is kept here for bit-exact cross-engine
# oracle parity.
# ---------------------------------------------------------------------------

_CONTAM_SQL = f"""
WITH labeled AS (
  SELECT doc_id,
         CASE WHEN {_SQL_HASH} % 100 < 90 THEN 'train' ELSE 'test' END AS split,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, split,
         array_to_string(list_slice(toks, i, i + 7), ' ') AS shingle
  FROM labeled, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS t(i)
),
train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
test_sh  AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE split = 'test')
SELECT t.doc_id,
       count(*)                            AS n_shingles,
       CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT)                     AS n_contaminated,
       round(CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS contamination_ratio
FROM test_sh t
LEFT JOIN train_sh tr USING (shingle)
GROUP BY t.doc_id
"""


@register("split_contamination", sql=_CONTAM_SQL)
def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    # Tokenize ONCE per doc behind an exchange: CollapseProject would
    # otherwise inline the regex split into every per-shingle slice
    # (|shingles| regex runs per doc instead of 1 — measured 6× slower)
    # and the shuffle also spreads the explode across all cores.
    tokenized = spread(
        docs.select(
            "doc_id",
            F.when(_doc_hash() % 100 < 90, "train")
            .otherwise("test")
            .alias("split"),
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    # Short docs (<8 tokens, incl. empty text → ['']) must be dropped
    # BEFORE gram generation: the clamped F.sequence(1, 0) descends to
    # [1, 0] and slice throws on start 0 (the text_boilerplate bug from
    # ADVICE r4 — same fix). The oracle's generate_series(1, 0) already
    # yields no shingles, so results are unchanged on ≥8-token docs.
    tokenized = tokenized.filter(F.size("toks") >= 8)
    toks = F.col("toks")
    # round 11 s3 (guide §2.3): the 8-gram never reaches the output —
    # only its EQUALITY is consumed (distinct, per-shingle window) — so
    # hash the token window to an 8-byte long at the explode: no
    # array_join string per window, and both downstream shuffles carry
    # fixed-width longs instead of ~50-byte strings.
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 7),
        lambda i: F.xxhash64(F.slice(toks, i, 8)),
    )
    labeled = tokenized.select(
        "doc_id", "split", F.explode(shingles).alias("shingle")
    )
    # Skew-safe shape: dedupe (shingle, doc_id, split) pairs first —
    # the composite key SPREADS a boilerplate shingle shared by many
    # docs across tasks (map-side combine collapses per-doc repeats
    # before the shuffle) instead of concentrating all its doc_ids in
    # one unbounded collect_set array/task. The per-shingle train flag
    # then reduces to ≤1 row per shingle, so the probe join below never
    # multiplies rows on a hot key and AQE skew-join can split the
    # probe side. At 100 TB this is the shape that survives a corpus
    # where one header 8-gram appears in half the test set.
    pairs = labeled.distinct()
    w_sh = Window.partitionBy("shingle")
    hits = pairs.withColumn(
        "in_train", F.max(F.col("split") == "train").over(w_sh)
    ).filter(F.col("split") == "test")
    contaminated = F.sum(F.when(F.col("in_train"), 1).otherwise(0))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        contaminated.cast("long").alias("n_contaminated"),
        F.round(
            contaminated.cast("double") / F.count(F.lit(1)), 6
        ).alias("contamination_ratio"),
    )


# ---------------------------------------------------------------------------
# shard_plan — the export layout step of a training-data pipeline:
# docs are assigned to N fixed shards by the deterministic Knuth hash
# (same recipe as split_train_test, so shard membership is stable
# across runs and engines) and the per-shard doc/token totals expose
# the balance the writer will achieve. At 100 TB this IS the write
# plan: `write_training_shards` partitions by this column, so reading
# the plan is reading the future output layout. One hash-agg, N rows.
# ---------------------------------------------------------------------------

N_SHARDS = 16

_SHARD_SQL = f"""
SELECT
  CAST({_SQL_HASH} % {N_SHARDS} AS BIGINT)   AS shard,
  count(*)                                   AS n_docs,
  CAST(sum({_sql_tokens()}) AS BIGINT)       AS n_tokens
FROM documents
GROUP BY shard
"""


@register("shard_plan", sql=_SHARD_SQL)
def shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return (
        docs.groupBy((_doc_hash() % N_SHARDS).cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_n_tokens()).cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# split_contamination_hashed — the 100 TB variant of the contamination
# audit, registered (VERDICT r4 #7): shingle keys are 8-byte hashes
# (here the first 16 hex chars of md5 so BOTH engines compute the
# identical key; in production swap in xxhash64 — 8 raw bytes, no hex,
# same plan), and a shingle whose TEST document frequency exceeds
# CONTAM_DF_CAP_FRAC of the test set is pre-flagged as boilerplate and
# removed from the window input entirely via a broadcast anti-join —
# the hot header 8-gram never reaches the per-key window at all.
# Collisions only merge shingles (over-flag, never under-flag).
# Boilerplate shingles are reported per doc but excluded from the
# contamination ratio's numerator (you strip boilerplate, you don't
# call it leakage).
# ---------------------------------------------------------------------------

CONTAM_DF_CAP_FRAC = 0.10

_CONTAM_HASHED_SQL = f"""
WITH labeled AS (
  SELECT doc_id,
         CASE WHEN {_SQL_HASH} % 100 < 90 THEN 'train' ELSE 'test' END
           AS split,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, split,
         substring(md5(array_to_string(list_slice(toks, i, i + 7), ' ')),
                   1, 16) AS key
  FROM labeled,
       unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS t(i)
),
ntest AS (
  SELECT count(*) AS n_test FROM labeled WHERE split = 'test'
),
dfk AS (
  SELECT key, count(*) AS test_df FROM sh WHERE split = 'test' GROUP BY key
),
capped AS (
  SELECT key FROM dfk CROSS JOIN ntest
  WHERE test_df > ceil({CONTAM_DF_CAP_FRAC} * n_test)
),
unc AS (
  SELECT sh.doc_id, sh.split, sh.key
  FROM sh LEFT JOIN capped USING (key)
  WHERE capped.key IS NULL
),
train_keys AS (SELECT DISTINCT key FROM unc WHERE split = 'train'),
main AS (
  SELECT t.doc_id,
         count(*) AS n_unc,
         sum(CASE WHEN tr.key IS NOT NULL THEN 1 ELSE 0 END) AS n_cont
  FROM (SELECT doc_id, key FROM unc WHERE split = 'test') t
  LEFT JOIN train_keys tr USING (key)
  GROUP BY t.doc_id
),
boiler AS (
  SELECT doc_id, count(*) AS n_boiler
  FROM sh JOIN capped USING (key)
  WHERE split = 'test'
  GROUP BY doc_id
)
SELECT coalesce(m.doc_id, b.doc_id)                       AS doc_id,
       CAST(coalesce(n_unc, 0) + coalesce(n_boiler, 0) AS BIGINT)
         AS n_shingles,
       CAST(coalesce(n_cont, 0) AS BIGINT)                AS n_contaminated,
       CAST(coalesce(n_boiler, 0) AS BIGINT)              AS n_boilerplate,
       round(CAST(coalesce(n_cont, 0) AS DOUBLE)
             / (coalesce(n_unc, 0) + coalesce(n_boiler, 0)), 6)
         AS contamination_ratio
FROM main m FULL JOIN boiler b ON m.doc_id = b.doc_id
"""


@register("split_contamination_hashed", sql=_CONTAM_HASHED_SQL)
def split_contamination_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    labeled_docs = docs.select(
        "doc_id",
        F.when(_doc_hash() % 100 < 90, "train").otherwise("test")
        .alias("split"),
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    # short-doc guard BEFORE gram generation (same crash class as
    # text_boilerplate, ADVICE r4); n_test below still counts ALL test
    # docs — only shingle generation skips the short ones, matching the
    # oracle's empty generate_series
    tokenized = spread(labeled_docs.filter(F.size("toks") >= 8))
    toks = F.col("toks")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 7),
        lambda i: F.array_join(F.slice(toks, i, 8), " "),
    )
    # the 8-byte key: identical on both engines via md5 prefix; the
    # production swap is F.xxhash64(shingle) (same plan, cheaper key)
    pairs = (
        tokenized.select(
            "doc_id", "split", F.explode(shingles).alias("shingle")
        )
        .select(
            "doc_id",
            "split",
            F.substring(F.md5("shingle"), 1, 16).alias("key"),
        )
        .distinct()
    )
    test_pairs = pairs.filter(F.col("split") == "test")
    n_test = labeled_docs.filter(F.col("split") == "test").agg(
        F.count(F.lit(1)).alias("n_test")
    )
    # boilerplate pre-flag: keys whose TEST doc frequency crosses the
    # cap — a tiny frame by construction, broadcast to prune the window
    # input (the plan guard pins the BroadcastHashJoin LeftAnti here)
    capped = (
        test_pairs.groupBy("key")
        .agg(F.count(F.lit(1)).alias("test_df"))
        .crossJoin(F.broadcast(n_test))
        .filter(
            F.col("test_df") > F.ceil(F.lit(CONTAM_DF_CAP_FRAC) * F.col("n_test"))
        )
        .select("key")
    )
    uncapped = pairs.join(F.broadcast(capped), "key", "left_anti")
    w_k = Window.partitionBy("key")
    hits = uncapped.withColumn(
        "in_train", F.max(F.col("split") == "train").over(w_k)
    ).filter(F.col("split") == "test")
    cont = F.sum(F.when(F.col("in_train"), 1).otherwise(0))
    main = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_unc"),
        cont.alias("n_cont"),
    )
    boiler = (
        test_pairs.join(F.broadcast(capped), "key", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    total = F.coalesce("n_unc", F.lit(0)) + F.coalesce("n_boiler", F.lit(0))
    return (
        main.join(boiler, "doc_id", "full_outer")
        .select(
            "doc_id",
            total.cast("long").alias("n_shingles"),
            F.coalesce("n_cont", F.lit(0)).cast("long")
              .alias("n_contaminated"),
            F.coalesce("n_boiler", F.lit(0)).cast("long")
              .alias("n_boilerplate"),
            F.round(
                F.coalesce("n_cont", F.lit(0)).cast("double") / total, 6
            ).alias("contamination_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# mixture_temperature — temperature-based mixture reweighting (the
# mC4 / XLM-R recipe): sampling weight w_s ∝ n_s^α with α = 0.3, the
# standard knob that upsamples low-resource sources without letting the
# head domains drown them. Complements mixture_weights (uniform
# target): this is the one production multilingual mixes actually ship.
# Outputs, per source: raw share, temperature weight, the oversampling
# factor (how many epochs of that source one epoch of the mix consumes),
# and expected docs per 1M sampled. Plan: one corpus pass to the
# source grain (map-side combinable), then window math over the
# |sources|-row frame — the window never sees corpus rows.
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3

_MIX_TEMP_SQL = f"""
WITH per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
-- denominators fold over SOURCE-SORTED lists so both engines sum the
-- same doubles in the same order (window SUM over doubles is
-- order-nondeterministic across engines)
denom AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list(CAST(n_docs AS DOUBLE) ORDER BY source),
                            x -> pow(x, {_TEMP_ALPHA}))),
           (acc, y) -> acc + y) AS pow_sum
  FROM per_source
)
SELECT source, n_docs,
       round(CAST(n_docs AS DOUBLE) / d.total_docs, 6) AS share,
       round(pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / d.pow_sum, 6)
         AS temp_weight,
       round((pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / d.pow_sum)
             / (CAST(n_docs AS DOUBLE) / d.total_docs), 6)
         AS oversample_factor,
       -- round-half, not floor: with equal sources the product sits
       -- EXACTLY on an integer boundary, where a 1-ulp cross-engine
       -- pow() difference flips floor() by 1; round()'s boundary is
       -- .5, which ulp noise cannot straddle
       CAST(round(1000000 * pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA})
                  / d.pow_sum, 0) AS BIGINT) AS docs_per_million
FROM per_source, denom d
"""


@register("mixture_temperature", sql=_MIX_TEMP_SQL)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    denom = per_source.agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "n_docs"))),
                lambda r: F.pow(r["n_docs"].cast("double"), F.lit(_TEMP_ALPHA)),
            ),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ).alias("pow_sum"),
    )
    n = F.col("n_docs").cast("double")
    powered = F.pow(n, F.lit(_TEMP_ALPHA))
    share = n / F.col("total_docs")
    temp_weight = powered / F.col("pow_sum")
    return per_source.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round(temp_weight, 6).alias("temp_weight"),
        F.round(temp_weight / share, 6).alias("oversample_factor"),
        F.round(F.lit(1000000) * temp_weight, 0)
        .cast("long")
        .alias("docs_per_million"),
    )


# ---------------------------------------------------------------------------
# sample_priority — weighted sampling without replacement via priority
# sampling (Duffield, Lund, Thorup, "Priority sampling for estimation
# of arbitrary subset sums", JACM 54(6), 2007): each doc draws a
# deterministic uniform u_i from the Knuth hash, gets priority
# q_i = w_i / u_i, and the sample is the top-k by priority. With the
# threshold τ = (k+1)-th priority, ŵ_i = max(w_i, τ) is an unbiased
# estimator of any subset sum — the standard way to build a weighted
# corpus subsample whose token counts remain estimable. Scale shape:
# one pushed-down scan → TakeOrdered(k+1) (per-partition heaps + a
# k+1-row driver merge, no global sort, no full-corpus window); the
# rank/threshold work happens on the 151-row result. Determinism: u_i
# is exact integer arithmetic and q_i a single IEEE division, so both
# engines order identically (doc_id tiebreak pins the measure-zero
# collision case).
# ---------------------------------------------------------------------------

_PRIORITY_K = 150

_PRIORITY_SQL = f"""
WITH w AS (
  SELECT doc_id,
         1 + len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS wt,
         (doc_id * 2654435761) % 4294967296 AS h
  FROM documents
),
p AS (
  SELECT doc_id, wt,
         CAST(wt AS DOUBLE)
           / ((CAST(h AS DOUBLE) + 1) / 4294967296.0) AS pri
  FROM w
),
r AS (
  SELECT doc_id, wt, pri,
         row_number() OVER (ORDER BY pri DESC, doc_id) AS rn
  FROM p
)
SELECT r.doc_id,
       CAST(r.wt AS BIGINT)                      AS weight,
       greatest(CAST(r.wt AS DOUBLE), t.tau)     AS est_weight
FROM r
JOIN (SELECT pri AS tau FROM r WHERE rn = {_PRIORITY_K + 1}) t ON TRUE
WHERE r.rn <= {_PRIORITY_K}
"""


@register("sample_priority", sql=_PRIORITY_SQL)
def sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    wt = (F.lit(1) + _n_tokens()).alias("wt")
    u = (_doc_hash().cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    p = docs.select(
        "doc_id", wt, (F.col("wt").cast("double") / u).alias("pri")
    )
    # TakeOrdered keeps k+1 rows (the sample plus the threshold row);
    # everything after this line operates on <= 151 rows. Because the
    # frame is sorted descending, the (k+1)-th priority tau is simply
    # the value at rn == k+1, lifted over the whole tiny frame by an
    # unpartitioned window — no self-join, no second corpus scan. The
    # tau-null filter reproduces the SQL's inner-join semantics when
    # the corpus has <= k docs (priority sampling is undefined there).
    top = p.orderBy(F.desc("pri"), F.asc("doc_id")).limit(_PRIORITY_K + 1)
    w = Window.orderBy(F.desc("pri"), F.asc("doc_id"))
    wall = Window.partitionBy()
    ranked = top.select("*", F.row_number().over(w).alias("rn"))
    tau = F.max(
        F.when(F.col("rn") == _PRIORITY_K + 1, F.col("pri"))
    ).over(wall)
    return (
        ranked.select("*", tau.alias("tau"))
        .filter((F.col("rn") <= _PRIORITY_K) & F.col("tau").isNotNull())
        .select(
            "doc_id",
            F.col("wt").cast("long").alias("weight"),
            F.greatest(F.col("wt").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


# ---------------------------------------------------------------------------
# split_contamination_semantic — embedding-level train/test leakage:
# the semantic twin of split_contamination(_hashed). N-gram audits
# catch verbatim leakage; paraphrased or templated test items leak
# SEMANTICALLY (near-identical embeddings, different surface forms) —
# the decontamination gap SemDeDup-era pipelines audit with embedding
# similarity. Vectors hash-split 90/10 on vec_id (same Knuth recipe as
# split_train_test), then each test vector is flagged if any
# same-cell train vector exceeds the cosine threshold. Output: one row
# per contaminated test vector with its witness count, max cosine, and
# the smallest witness id.
#
# Scale shape: the TEST side is the small one by construction (the
# benchmark suite), so it broadcasts; the train corpus streams
# partition-parallel through the cell-local pair filter with no
# shuffle, and the per-test-vector collapse is one hash agg on a
# pair list bounded by cell co-membership — never corpus x corpus.
# ---------------------------------------------------------------------------

from codex_data_products_spark.queries.dedup import (  # noqa: E402
    _SYNTHETIC_EMB_THRESHOLD as _SEM_THRESHOLD,
)

_SEM_CONTAM_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq,
         ((vec_id * 2654435761) % 4294967296) % 100 AS h
  FROM embeddings
),
tr AS (SELECT vec_id, label, v, nsq FROM e WHERE h < 90),
te AS (SELECT vec_id, label, v, nsq FROM e WHERE h >= 90),
pairs AS (
  SELECT te.vec_id AS test_vec_id,
         tr.vec_id AS train_vec_id,
         round(list_dot_product(te.v, tr.v)
               / sqrt(te.nsq * tr.nsq), 6) AS c
  FROM te JOIN tr ON te.label = tr.label
  WHERE round(list_dot_product(te.v, tr.v)
        / sqrt(te.nsq * tr.nsq), 6)
        >= {_SEM_THRESHOLD}
)
SELECT test_vec_id,
       CAST(count(*) AS BIGINT) AS n_train_witnesses,
       max(c)                   AS max_cosine,
       min(train_vec_id)        AS example_train_vec
FROM pairs
GROUP BY test_vec_id
"""


@register("split_contamination_semantic", sql=_SEM_CONTAM_SQL)
def split_contamination_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.queries.dedup import cosine_expr
    from codex_data_products_spark.tables import spread

    from codex_data_products_spark.queries.dedup import dot_expr

    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ((F.col("vec_id") * F.lit(2654435761)) % F.lit(4294967296) % 100)
        .alias("h"),
    ).withColumn("nsq", dot_expr(F.col("v"), F.col("v")))
    tr = spread(emb.filter(F.col("h") < 90), "vec_id").alias("tr")
    te = F.broadcast(emb.filter(F.col("h") >= 90)).alias("te")
    cos = F.round(
        dot_expr(F.col("te.v"), F.col("tr.v"))
        / F.sqrt(F.col("te.nsq") * F.col("tr.nsq")),
        6,
    )
    from codex_data_products_spark.queries.dedup import eval_once

    pairs = (
        tr.join(te, F.col("te.label") == F.col("tr.label"))
        .select(
            F.col("te.vec_id").alias("test_vec_id"),
            F.col("tr.vec_id").alias("train_vec_id"),
            # eval_once keeps the dot fold out of the join condition
            # (it would run per candidate, before any cheap predicate)
            eval_once(cos).alias("c"),
        )
        .filter(F.col("c") >= _SEM_THRESHOLD)
    )
    return pairs.groupBy("test_vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_train_witnesses"),
        F.max("c").alias("max_cosine"),
        F.min("train_vec_id").alias("example_train_vec"),
    )
