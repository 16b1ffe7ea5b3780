"""Deduplication operators over ``documents`` / ``embeddings``.

Five dedup families, all Spark-first and all fully oracle-checkable
because every hash is derived from md5 (bit-identical across engines):

  * exact           — md5 groupBy, keep min doc_id
  * n-gram Jaccard  — 5-token shingles → shingle self-join → set Jaccard
  * MinHash + LSH   — 8 md5-seeded minhashes → 2 bands → band-bucket join
                      → Jaccard verification of candidates only
  * SimHash         — 32-bit simhash from token md5s → 16-bit band join →
                      Hamming distance via bit_count(xor)
  * embedding cosine— near-dup pairs within an IVF-style coarse partition
                      (label) at cosine ≥ threshold

Scale design: the shingle/band joins are equi-joins on high-cardinality
keys (shuffle-partitionable, AQE-skew-splittable); hyper-common shingles
are dropped by a document-frequency cap exactly like stop-shingle
filtering in production minhash pipelines — without it one viral shingle
produces a quadratic join blowup at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import sql_dratio
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import spread, table as T


def _ivm_state_dir(name: str) -> str:
    """Deterministic per-process state dir for the incremental-twin
    registry wrappers (ADVICE r7): wiped on (re)use within a process and
    removed at interpreter exit, so repeated verify/bench sweeps no
    longer leak parquet state into the temp area — the prior
    ``tempfile.mkdtemp`` per invocation was never cleaned up."""
    import atexit
    import os
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(), f"spark-graft-ivm-{os.getpid()}"
    )
    if not getattr(_ivm_state_dir, "_registered", False):
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        _ivm_state_dir._registered = True  # type: ignore[attr-defined]
    path = os.path.join(base, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path

SHINGLE_K = 5  # tokens per shingle
SHINGLE_DF_CAP = 100  # drop shingles appearing in more docs than this
JACCARD_THRESHOLD = 0.4
NUM_MINHASHES = 8
MINHASH_BANDS = 2  # 2 bands × 4 rows
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 6

_SQL_TOKENS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


# --- shared Spark-side shingle builder ------------------------------------


def _tokens() -> Column:
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def shingle_table(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) with distinct k-token shingles per doc.

    Documents shorter than k tokens produce no shingles (mirrors the SQL
    generate_series bound).

    The regex tokenization is materialized BELOW the spread exchange:
    higher-order-function lambdas re-evaluate loop-invariant
    subexpressions per element, so leaving ``split(text)`` inside the
    per-shingle slice runs the regex |shingles| times per doc (measured
    ~3× slower end-to-end); behind the exchange it runs once per doc
    and CollapseProject cannot re-inline it.
    """
    toks = F.col("toks")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return (
        spread(
            docs.filter(F.size(_tokens()) >= k).select(
                "doc_id", _tokens().alias("toks")
            ),
            "doc_id",
        )
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )


def _frequent_shingles_removed(sh: DataFrame) -> DataFrame:
    """Drop stop-shingles above the document-frequency cap (both engines).

    Strategy: hash-aggregate the document frequency (map-side partial
    combine shrinks the shuffle to distinct shingles), keep only the
    *violators* (a tiny set by construction — few shingles exceed the
    cap), and broadcast-anti-join them away. The shingle table itself
    never shuffles: at 100 TB the alternative count-over-window would
    shuffle and sort the full (doc, shingle) relation. ``sh`` should be
    persisted by the caller — it is scanned by both the agg and the
    anti-join.
    """
    # round 11 s3 (guide §2.3 narrower types): the aggregate and the
    # anti-join only consume shingle EQUALITY, so they run on an 8-byte
    # xxhash64 key instead of the ~40-byte shingle string — the df
    # exchange carries a fifth of the bytes and the hash probes are
    # fixed-width. The string column rides through untouched (the
    # minhash md5s downstream need it).
    key = F.xxhash64("shingle")
    frequent = (
        sh.groupBy(key.alias("_shk"))
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("_shk")
    )
    return (
        sh.withColumn("_shk", key)
        .join(F.broadcast(frequent), "_shk", "left_anti")
        .drop("_shk")
    )


_SQL_SHINGLES = f"""
toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
  WHERE len({_SQL_TOKENS}) >= {SHINGLE_K}
),
sh_raw AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {SHINGLE_K - 1}), ' ') AS shingle
  FROM toks, unnest(generate_series(1, len(t) - {SHINGLE_K - 1})) AS g(i)
),
sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle IN (
    SELECT shingle FROM sh_raw GROUP BY shingle
    HAVING count(*) <= {SHINGLE_DF_CAP}
  )
)
"""

_SQL_JACCARD_TAIL = f"""
sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT
    c.doc_a, c.doc_b,
    round(CAST(c.n_common AS DOUBLE)
          / (sa.n_sh + sb.n_sh - c.n_common), 6) AS jaccard
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
)
"""


def _jaccard_for_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact set Jaccard for a given (doc_a, doc_b) candidate-pair frame.

    Unlike ``_jaccard_pairs`` this never enumerates non-candidate pairs.
    Round 11 (guide §2.3/§2.4): the shingle sets are packed into ONE
    array row per doc and the intersection is computed row-locally
    (``array_intersect``) after two doc-keyed joins. The former shape
    joined candidates to the exploded shingle table twice — shipping
    the (candidates × shingles-of-doc) product through a
    (doc_b, shingle) string-keyed exchange plus a pair-grain count
    aggregate and two more size joins (7 exchanges; measured 17.5 s at
    the substr-sf1.0 stress vs 6.9 s for this shape). Shingles per doc
    are distinct by construction (shingle_table / the IVM log), so
    ``collect_set`` sizes equal the old per-doc counts, and a candidate
    pair with zero common shingles now yields jaccard 0.0 instead of
    being dropped by the old inner count-join — every caller filters
    ``jaccard >= JACCARD_THRESHOLD > 0``, so results are unchanged.
    """
    # round 11 s3: the packed sets only feed size() and
    # array_intersect(), i.e. pure equality — collect 8-byte xxhash64
    # keys instead of the shingle strings (set sizes and intersections
    # are preserved under the injective-up-to-64-bit-collision key; the
    # full-registry oracle sweep certifies the outputs bit-identical)
    sets = sh.groupBy("doc_id").agg(
        F.collect_set(F.xxhash64("shingle")).alias("_shs")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("_shs").alias("_sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("_shs").alias("_sb"))
    n_common = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # eval_once: every caller filters this column; unguarded,
            # the filter is pushed into the set join's condition and
            # the array_intersect runs twice per candidate
            eval_once(
                F.round(
                    n_common.cast("double")
                    / (F.size("_sa") + F.size("_sb") - n_common),
                    6,
                )
            ).alias("jaccard"),
        )
    )


def _jaccard_pairs(sh: DataFrame) -> DataFrame:
    """All-pairs set Jaccard from a (doc_id, shingle) table."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # round 11 s3: the self-join key is pure shingle equality — join on
    # the 8-byte xxhash64 key so both exchange sides carry fixed-width
    # longs instead of the shingle strings (the join is the query's
    # largest shuffle)
    keyed = sh.select("doc_id", F.xxhash64("shingle").alias("_shk"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    common = (
        a.join(
            b,
            (F.col("a._shk") == F.col("b._shk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_exact — exact dedup: hash-groupBy, keeper = min doc_id. One
# shuffle on the 128-bit hash; at 100 TB this is the cheapest pass and
# runs first to shrink the corpus for the fuzzy passes.
# ---------------------------------------------------------------------------

_EXACT_SQL = """
SELECT
  md5(text)   AS exact_hash,
  min(doc_id) AS keeper_doc_id,
  count(*)    AS n_copies
FROM documents
GROUP BY md5(text)
"""


@register("dedup_exact", sql=_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("exact_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard — full pairwise n-gram Jaccard over shingle-sharing
# pairs (the exact version of what MinHash approximates).
# ---------------------------------------------------------------------------

_NGRAM_SQL = f"""
WITH {_SQL_SHINGLES},
{_SQL_JACCARD_TAIL}
SELECT doc_a, doc_b, jaccard FROM jac
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", sql=_NGRAM_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    # the raw shingles feed the df-cap aggregate plus 4 downstream
    # references (self-join sides + both size lookups): persist so the
    # md5-heavy explode runs once
    raw = shingle_table(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sh = _frequent_shingles_removed(raw)
    return _jaccard_pairs(sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# dedup_minhash_lsh — MinHash signatures (md5-seeded, portable) → banded
# LSH candidate join → exact Jaccard verification of candidates only.
# The candidate join touches only band-bucket collisions, never all pairs:
# the 100 TB scale path.
# ---------------------------------------------------------------------------


# Each md5 yields four independent 32-bit hashes (8 hex chars each), so
# 8 minhashes need only 2 md5 evaluations per shingle — the md5 is the
# hot instruction at scale (corpus_shingles × salts evaluations).
_SALTS = NUM_MINHASHES // 4


def _minhash_expr(i: int) -> Column:
    """i-th minhash: min over 32-bit chunk (i%4) of md5('{i//4}|'+shingle)."""
    salt, chunk = divmod(i, 4)
    h = F.conv(
        F.substring(F.col(f"_md5_{salt}"), 1 + 8 * chunk, 8), 16, 10
    ).cast("long")
    return F.min(h).alias(f"mh{i}")


def _with_salted_md5(sh: DataFrame) -> DataFrame:
    """Materialize the per-salt md5 columns once before aggregation."""
    return sh.select(
        "doc_id",
        "shingle",
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle"))).alias(f"_md5_{s}")
            for s in range(_SALTS)
        ],
    )


def _sql_minhash(i: int) -> str:
    salt, chunk = divmod(i, 4)
    return (
        f"min(CAST(concat('0x', substring(md5(concat('{salt}|', shingle)), "
        f"{1 + 8 * chunk}, 8)) AS BIGINT)) AS mh{i}"
    )


_ROWS_PER_BAND = NUM_MINHASHES // MINHASH_BANDS


def _sql_band_val(b: int) -> str:
    cols = ", ".join(
        f"CAST(mh{i} AS VARCHAR)"
        for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
    )
    return f"md5(concat_ws(',', {cols}))"


# First-match-band candidate generation (same trick as simhash): the
# band-1 join requires band-0 values to differ, so no DISTINCT pass over
# the collision pairs is needed.
_MINHASH_SQL = f"""
WITH {_SQL_SHINGLES},
sig AS (
  SELECT doc_id, {", ".join(_sql_minhash(i) for i in range(NUM_MINHASHES))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, {_sql_band_val(0)} AS b0, {_sql_band_val(1)} AS b1 FROM sig
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM bands a JOIN bands b
    ON a.b1 = b.b1 AND a.b0 <> b.b0 AND a.doc_id < b.doc_id
),
{_SQL_JACCARD_TAIL}
SELECT j.doc_a, j.doc_b, j.jaccard
FROM jac j
JOIN cand c ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= {JACCARD_THRESHOLD}
"""


def minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, b0, b1) banded-minhash signatures for a (already
    df-capped) shingle table — one row per doc. Shared by the batch LSH
    queries and the incremental dedup maintainer
    (``streaming.dedup_ivm``), which persists exactly this frame."""
    sig = _with_salted_md5(sh).groupBy("doc_id").agg(
        *[_minhash_expr(i) for i in range(NUM_MINHASHES)]
    )

    def band_val(b: int) -> Column:
        cols = [
            F.col(f"mh{i}").cast("string")
            for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
        ]
        return F.md5(F.concat_ws(",", *cols))

    return sig.select(
        "doc_id", band_val(0).alias("b0"), band_val(1).alias("b1")
    )


def _lsh_candidate_pairs(sh: DataFrame) -> DataFrame:
    """Banded-minhash candidate pairs (doc_a, doc_b) for a shingle
    table — the shared core of dedup_minhash_lsh and its recall
    evaluation. First-match-band emission keeps the two band joins
    disjoint (no DISTINCT over collision pairs)."""
    from pyspark import StorageLevel

    # One signature row per doc (tiny): persist so the band self-join's
    # two branches don't each re-run the md5-heavy aggregation.
    bands = minhash_bands(sh).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = bands.alias("a"), bands.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")
    pair = [F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")]
    return a.join(b, (F.col("a.b0") == F.col("b.b0")) & lt).select(*pair).unionByName(
        a.join(
            b,
            (F.col("a.b1") == F.col("b.b1"))
            & (F.col("a.b0") != F.col("b.b0"))
            & lt,
        ).select(*pair)
    )


@register("dedup_minhash_lsh", sql=_MINHASH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    # The shingle table feeds the df-cap aggregate, signature building,
    # AND candidate verification; persist it (disk-spillable) instead of
    # recomputing the md5-heavy explode each time.
    raw = shingle_table(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sh = _frequent_shingles_removed(raw)
    cand = _lsh_candidate_pairs(sh)
    return _jaccard_for_pairs(cand, sh).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


# ---------------------------------------------------------------------------
# dedup_incremental — the maintained-view twin of dedup_minhash_lsh
# (streaming/dedup_ivm.py): the documents table is ingested as THREE
# modulo batches through the incremental maintainer (O(delta) per
# batch: delta-only hashing, broadcast candidate join against the
# persisted band table, re-sign repair when a shingle crosses the DF
# cap), and the final pair snapshot is returned. The oracle is the
# SAME from-scratch SQL as dedup_minhash_lsh — the driver's hash
# comparison therefore certifies incremental == from-scratch equality
# end to end, not just rows.
# ---------------------------------------------------------------------------


@register("dedup_incremental", sql=_MINHASH_SQL)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_dedup_batch,
        bootstrap_dedup_state,
        dedup_pairs_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("dedup_ivm")
    bootstrap_dedup_state(spark, state)
    for k in range(3):
        apply_dedup_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return dedup_pairs_snapshot(spark, state)


# ---------------------------------------------------------------------------
# dedup_simhash — 32-bit SimHash from per-token md5s; candidate pairs from
# two 16-bit band buckets; Hamming distance via bit_count(xor).
# ---------------------------------------------------------------------------


def simhash_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — bit b set iff more than half the distinct-token
    hashes have bit b.

    Round 11 (measured, guide §4.1/§7.2): the former row-local
    formulation ran 32 ``size(filter(hs, ...))`` passes per document —
    higher-order functions are CodegenFallback, so every pass was
    interpreted expression eval over the in-memory array (~32·|tokens|
    closure invocations per doc). The explode → 32-bit-sum hash
    aggregate stays entirely inside WholeStageCodegen and, because the
    exploded token rows of one document never leave their partition,
    the aggregate's partial pass collapses them to ONE row per doc
    before any exchange — under ``spread``'s doc_id hash partitioning
    the grouping requirement is already satisfied, so the plan carries
    no aggregation exchange at all (interleaved 5-run medians at the
    sf1.0 stress: 1.85 s → 1.40 s; the interpreted HOF nodes are gone).
    """
    toks = F.array_distinct(_tokens())
    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(toks).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(SIMHASH_BITS)
    ]
    g = ex.groupBy("doc_id").agg(*aggs)
    out = None
    for b in range(SIMHASH_BITS):
        t = F.when(
            F.col(f"c{b}") * 2 > F.col("n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
        out = t if out is None else out + t
    return g.select("doc_id", out.cast("long").alias("simhash"))


def _sql_simhash() -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        ones = f"len(list_filter(hs, h -> (h & {1 << b}) != 0))"
        terms.append(f"(CASE WHEN {ones} * 2 > n THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# A pair is emitted only by its FIRST matching band (the band-1 join
# requires the band-0 halves to differ): set-equal to DISTINCT over all
# band collisions, but with no wide-row distinct shuffle — the dedup is
# a join predicate instead of a post-join exchange. At 100 TB the
# distinct over exploded candidate pairs is the bottleneck this avoids.
_SIMHASH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents
),
sim AS MATERIALIZED (
  SELECT doc_id, {_sql_simhash()} AS simhash FROM t
),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, b.simhash AS sb
  FROM sim a JOIN sim b
    ON a.simhash // 65536 = b.simhash // 65536 AND a.doc_id < b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
  FROM sim a JOIN sim b
    ON a.simhash % 65536 = b.simhash % 65536
   AND a.simhash // 65536 <> b.simhash // 65536
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
"""


@register("dedup_simhash", sql=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    # persist the doc-grain signature table: the two band self-joins
    # would otherwise re-evaluate the 32-bit-majority expression per
    # side (4x) — 40% of the query at stress SF, 4x at any scale
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    hi = lambda side: F.shiftrightunsigned(F.col(f"{side}.simhash"), 16)  # noqa: E731
    lo = lambda side: F.col(f"{side}.simhash") % 65536  # noqa: E731
    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")
    band0 = a.join(b, (hi("a") == hi("b")) & lt)
    band1 = a.join(b, (lo("a") == lo("b")) & (hi("a") != hi("b")) & lt)
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    out = [
        p.filter(hamming <= SIMHASH_MAX_HAMMING).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        for p in (band0, band1)
    ]
    return out[0].unionByName(out[1])


# ---------------------------------------------------------------------------
# dedup_simhash_incremental — the maintained-view twin of dedup_simhash
# (streaming/dedup_ivm.apply_simhash_batch): three modulo batches
# through the incremental maintainer (row-local delta signatures,
# broadcast candidate join against the persisted signature table — no
# re-sign path because SimHash has no cross-corpus dependency), final
# pair snapshot returned. The oracle is the SAME from-scratch SQL as
# dedup_simhash, so the driver's hash comparison certifies
# incremental == from-scratch equality end to end.
# ---------------------------------------------------------------------------


@register("dedup_simhash_incremental", sql=_SIMHASH_SQL)
def dedup_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_simhash_batch,
        bootstrap_simhash_state,
        simhash_pairs_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("simhash_ivm")
    bootstrap_simhash_state(spark, state)
    for k in range(3):
        apply_simhash_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return simhash_pairs_snapshot(spark, state)


# ---------------------------------------------------------------------------
# dedup_embedding_cosine — embedding near-dup pairs within an IVF-style
# coarse partition (the `label` column = cluster assignment), cosine ≥
# threshold. Partition-local pairing keeps the join linear in cluster
# size instead of quadratic in corpus size.
# ---------------------------------------------------------------------------

# Production embedding near-dup would use ~0.95, but the synthetic
# embeddings are near-orthogonal random vectors (max same-label cosine is
# ~0.45/0.47/0.51 at sf0.001/0.01/0.1), so 0.95 never fires and the
# oracle match is vacuous — it proves plan shape, not arithmetic.  0.38
# yields 9/10/164 pairs at the three SFs: non-empty output at every
# scale the driver samples, so the cross-engine hash covers the cosine
# fold itself. The name is deliberately harness-scoped — do NOT import
# it as a production near-dup setting.
_SYNTHETIC_EMB_THRESHOLD = 0.38


def dot_expr(x: Column, y: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns
    (deterministic order, matches DuckDB's list_dot_product).

    Round 11 note (measured, then REVERTED): a 64-term unrolled sum
    behind a ``WHEN size(x)=64`` guard was tried as a codegen fast
    path. The guard's else-branch keeps the ``aggregate`` HOF, so the
    whole CaseWhen stays CodegenFallback — the "fast path" is 129
    interpreted element_at/Add node evals per row instead of one
    two-pass fold, and plans that instantiate the dot many times (IVF
    multiprobe) also paid plan-size blow-up. Interleaved same-session
    medians at sf0.1: knn_ivf_multiprobe 1.82 s (fold) vs 4.54 s
    (unroll), knn_brute_force 1.25 vs 1.75, dedup_embedding_cosine
    1.73 vs 1.92; in a fresh bench session the multiprobe row hit 24 s.
    The fold is the right shape until Spark codegens HOFs."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def eval_once(col: Column) -> Column:
    """Pin an EXPENSIVE projected expression so it is evaluated exactly
    once (round 11 s3, guide §4.4 applied to built-ins): a filter on
    the aliased column would otherwise be pushed back through the
    Project into the join condition, re-evaluating the expression per
    CANDIDATE row — and, because non-equi join predicates run left to
    right, often BEFORE the cheap vec_id ordering test. The always-true
    WHEN on spark_partition_id() is nondeterministic to the optimizer
    (blocks the pushdown/substitution) and bit-identical at runtime
    (the guard branch is always taken). Measured on
    dedup_embedding_cosine at the sf0.5 stress: 4.58 -> 2.13 s median
    (interleaved), plan's join condition drops the fold entirely. Use
    ONLY where the filter has nowhere better to push (directly above
    the projecting join); a guard below a scan-prunable filter would
    block a useful pushdown instead."""
    return F.when(F.spark_partition_id() >= -1, col)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns. NOTE: computes
    both norms inline (three folds per invocation) — pair-scoring hot
    paths should precompute squared norms per vector and combine with
    ``dot_expr`` instead (see dedup_embedding_cosine / knn_brute_force,
    3x at sf0.5)."""
    return dot_expr(a, b) / F.sqrt(dot_expr(a, a) * dot_expr(b, b))


def _emb_sql(where: str = "") -> str:
    """The embedding near-dup oracle, optionally restricted to a
    surviving sub-corpus (the removal-terminal incremental twin)."""
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings {where}
)
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6) AS cosine
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6)
      >= {_SYNTHETIC_EMB_THRESHOLD}
"""


_EMB_SQL = f"""
WITH e AS (
  -- squared norm precomputed ONCE per vector: the pair stage then runs
  -- one dot-product fold per pair instead of three (3x at sf0.5, where
  -- this query dominated the bench suite)
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings
)
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6) AS cosine
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6)
      >= {_SYNTHETIC_EMB_THRESHOLD}
"""


@register("dedup_embedding_cosine", sql=_EMB_SQL)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # squared norm ONCE per vector (same fold order as the per-pair form,
    # so the doubles are bit-identical) — the pair stage drops from three
    # aggregate folds to one, 3x on the sf0.5 bench where this query
    # dominated the suite
    emb = emb.withColumn("nsq", dot_expr(F.col("v"), F.col("v")))
    # Broadcast one side: the pair generation then runs partition-parallel
    # on the spread side with no shuffle — and no skew from the tiny
    # label-key space (10 labels would otherwise occupy ≤10 reducers).
    a = spread(emb, "vec_id").alias("a")
    b = F.broadcast(emb).alias("b")
    cos = F.round(
        dot_expr(F.col("a.v"), F.col("b.v"))
        / F.sqrt(F.col("a.nsq") * F.col("b.nsq")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            eval_once(cos).alias("cosine"),
        )
        .filter(F.col("cosine") >= _SYNTHETIC_EMB_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# dedup_embedding_incremental / dedup_embedding_removal_incremental —
# the embedding-cosine family's maintained-view twins
# (streaming/emb_dedup_ivm.py): the corpus arrives as three modulo
# batches; the first twin then removes and RE-ADDS a residue class
# (tombstone + re-ingest, the two-batch replace protocol) and must
# equal the from-scratch full-corpus view; the second ends after the
# removal and must equal the view over the surviving corpus only. Both
# oracles are the SAME SQL as dedup_embedding_cosine (optionally
# where-restricted), so the driver hash certifies incremental ==
# from-scratch end to end.
# ---------------------------------------------------------------------------


def _emb_ivm_batches(spark: SparkSession, sf_dir: str, name: str):
    from codex_data_products_spark.streaming.emb_dedup_ivm import (
        apply_emb_batch,
    )

    emb = T(spark, sf_dir, "embeddings")
    state = _ivm_state_dir(name)
    for k in range(3):
        apply_emb_batch(
            spark,
            state,
            k,
            adds=emb.filter(F.col("vec_id") % 3 == k).select(
                "vec_id", "embedding", "label"
            ),
        )
    apply_emb_batch(
        spark,
        state,
        3,
        removes=emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
    )
    return emb, state


@register("dedup_embedding_incremental", sql=_emb_sql())
def dedup_embedding_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.emb_dedup_ivm import (
        apply_emb_batch,
        emb_pairs_snapshot,
    )

    emb, state = _emb_ivm_batches(spark, sf_dir, "emb_dedup_ivm")
    apply_emb_batch(
        spark,
        state,
        4,
        adds=emb.filter(F.col("vec_id") % 7 == 3).select(
            "vec_id", "embedding", "label"
        ),
    )
    return emb_pairs_snapshot(spark, state)


@register(
    "dedup_embedding_removal_incremental",
    sql=_emb_sql("WHERE vec_id % 7 <> 3"),
)
def dedup_embedding_removal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.emb_dedup_ivm import (
        emb_pairs_snapshot,
    )

    _, state = _emb_ivm_batches(spark, sf_dir, "emb_dedup_ivm_rm")
    return emb_pairs_snapshot(spark, state)


# ---------------------------------------------------------------------------
# dedup_connected_components — near-dup CLUSTERS: connected components
# over the simhash pair graph, component id = min doc_id in the
# component (the canonical keeper). Spark side is iterative min-label
# propagation — the standard large-scale connected-components pattern
# (O(graph diameter) join+agg rounds, each a bulk-parallel shuffle);
# the oracle is a recursive CTE, so even this iterative algorithm is
# value-hash-checked.
# ---------------------------------------------------------------------------

CC_ROUNDS = 16  # propagate+jump doubles the label radius per round:
# 2^16 covers any graph DuckDB will ever see here (the 50-round Spark
# fixpoint loop is the same bound, reached earlier via early exit)


def _cc_sql(where: str = "") -> str:
    """Exact connected components as UNROLLED min-label propagation +
    pointer jumping. The previous recursive-reachability oracle
    enumerated every (node, reachable-label) pair — correct, but on the
    sf0.5 stress corpus the Hamming<=6 graph has 14.4 M directed edges
    over 25 k near-clique docs, so the recursion materializes O(n^2)
    pairs (>10 min). Propagate+jump needs only O(log n) rounds of
    linear-size joins (~25 s on the same graph) and produces the same
    labels: component_id = min doc_id of the component, algorithm-
    independent, so it still equals the Spark fixpoint loop.

    ``where`` (e.g. ``"WHERE doc_id % 17 <> 3"``) restricts the corpus
    — the oracle twin for the maintainer's REMOVAL path."""
    parts = [
        f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents {where}
),
sim AS MATERIALIZED (
  SELECT doc_id, {_sql_simhash()} AS simhash FROM t
),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sim a JOIN sim b
    ON a.simhash // 65536 = b.simhash // 65536 AND a.doc_id < b.doc_id
   AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM sim a JOIN sim b
    ON a.simhash % 65536 = b.simhash % 65536
   AND a.simhash // 65536 <> b.simhash // 65536
   AND a.doc_id < b.doc_id
   AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS lbl FROM documents {where})"""
    ]
    for k in range(1, CC_ROUNDS + 1):
        parts.append(
            f""",
m{k} AS MATERIALIZED (
  SELECT e.b AS node, min(l.lbl) AS nmin
  FROM edges e JOIN l{k - 1} l ON l.node = e.a GROUP BY e.b
),
p{k} AS MATERIALIZED (
  SELECT l.node, least(l.lbl, coalesce(m.nmin, l.lbl)) AS lbl
  FROM l{k - 1} l LEFT JOIN m{k} m ON m.node = l.node
),
l{k} AS MATERIALIZED (
  SELECT p.node, least(p.lbl, q.lbl) AS lbl
  FROM p{k} p JOIN p{k} q ON q.node = p.lbl
)"""
        )
    parts.append(
        f"""
SELECT node AS doc_id, lbl AS component_id FROM l{CC_ROUNDS}
"""
    )
    return "".join(parts)


_CC_SQL = _cc_sql()


@register("dedup_connected_components", sql=_CC_SQL)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from codex_data_products_spark.operators.graphs import (
        min_label_components,
    )

    docs = T(spark, sf_dir, "documents")
    # Round 11: propagate on the DISTINCT-SIGNATURE grain, not the doc
    # grain. Docs sharing a simhash are pairwise Hamming-0 band-0
    # collisions, i.e. already one clique in the pair graph, and
    # cross-signature connectivity is a function of the signature pair
    # alone — so the doc-grain component labeling is exactly the
    # signature-grain labeling blown back up through the (doc_id,
    # simhash) map. The former plan materialized every doc pair
    # (28.4M rows at the skew stress — identical-signature bot groups
    # are quadratic in group size) and shuffled+sorted the 2x edge
    # list before a doc-grain propagation loop; signatures are the
    # multimodal_ahash_neardup lesson applied to CC: |signatures| <<
    # |docs|, pair explosion never happens, and the propagation loop
    # runs on frames bounded by the signature count. Seeded labels
    # (min doc_id per signature) make the final relabeling emit the
    # component's min doc_id — bit-identical to the doc-grain loop.
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sig = sim.groupBy("simhash").agg(F.min("doc_id").alias("label"))
    hi = lambda side: F.shiftrightunsigned(F.col(f"{side}.simhash"), 16)  # noqa: E731
    lo = lambda side: F.col(f"{side}.simhash") % 65536  # noqa: E731
    a, b = sig.alias("a"), sig.alias("b")
    lt = F.col("a.simhash") < F.col("b.simhash")
    hamming_ok = (
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        <= SIMHASH_MAX_HAMMING
    )
    pair = [F.col("a.simhash").alias("x"), F.col("b.simhash").alias("y")]
    sig_pairs = (
        a.join(b, (hi("a") == hi("b")) & lt & hamming_ok)
        .select(*pair)
        .unionByName(
            a.join(
                b, (lo("a") == lo("b")) & (hi("a") != hi("b")) & lt & hamming_ok
            ).select(*pair)
        )
    )
    # both edge directions from ONE pass over the pair generator (the
    # former unionByName of two selects re-ran the band self-joins
    # twice — the pair plan is not persisted)
    edges = sig_pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                F.struct(F.col("y").alias("a"), F.col("x").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    comp = min_label_components(
        sig.select(F.col("simhash").alias("node"), "label"), edges
    )
    # blow the signature labeling back up to doc grain; hint-free join —
    # AQE broadcasts the signature-grain side while it is small and
    # falls back to a shuffle join on a corpus whose signature count
    # outgrows a broadcast
    return sim.join(comp, sim.simhash == comp.node).select(
        F.col("doc_id"), F.col("label").alias("component_id")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_eval — measure, don't guess: the banding scheme's
# recall against exact all-pairs Jaccard ground truth, plus the
# verification yield (true dups per candidate probed). Candidates are
# always exact-verified before deletion, so precision is 1.0 by
# construction; the number that matters operationally is how many true
# duplicate pairs the 2×4 banding MISSES (both band hashes disagree)
# and how much verification work each candidate costs. One summary
# row; the exact side is the same all-sharing-pairs oracle twin
# dedup_ngram_jaccard runs — affordable at eval time, never in the
# production dedup path.
# ---------------------------------------------------------------------------

_MINHASH_EVAL_SQL = f"""
WITH {_SQL_SHINGLES},
sig AS (
  SELECT doc_id, {", ".join(_sql_minhash(i) for i in range(NUM_MINHASHES))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, {_sql_band_val(0)} AS b0, {_sql_band_val(1)} AS b1 FROM sig
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM bands a JOIN bands b
    ON a.b1 = b.b1 AND a.b0 <> b.b0 AND a.doc_id < b.doc_id
),
{_SQL_JACCARD_TAIL},
exact AS (
  SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
),
found AS (
  SELECT e.doc_a, e.doc_b
  FROM exact e JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_pairs,
  CAST((SELECT count(*) FROM cand) AS BIGINT)  AS n_candidates,
  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM exact), 0), 6) AS recall,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM cand), 0), 6)  AS verify_yield
"""


@register("dedup_minhash_eval", sql=_MINHASH_EVAL_SQL)
def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    raw = shingle_table(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sh = _frequent_shingles_removed(raw).persist(StorageLevel.MEMORY_AND_DISK)
    cand = _lsh_candidate_pairs(sh).persist(StorageLevel.MEMORY_AND_DISK)
    exact = _jaccard_pairs(sh).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    ).select("doc_a", "doc_b").persist(StorageLevel.MEMORY_AND_DISK)
    found = exact.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return (
        n_exact.crossJoin(n_cand)
        .crossJoin(n_found)
        .select(
            "n_exact_pairs",
            "n_candidates",
            "n_found",
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_exact_pairs"), F.lit(0)),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("verify_yield"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_simhash_eval — the SimHash twin of dedup_minhash_eval: recall
# of the 2×16-bit band scheme against exact Hamming≤6 ground truth,
# plus verification yield (true near-dups per band-collision probed).
# Ground truth is computed over the shingle-sharing pair space (same
# bounded pair generator the Jaccard twin uses — a near-dup at
# Hamming≤6 without a single shared 5-gram shingle is not a meaningful
# dup, and the bound keeps the exact side affordable at eval time;
# the production path only ever runs the banded scheme). One summary
# row: a 32-bit signature split into two 16-bit bands GUARANTEES
# recall 1.0 only for Hamming≤1, so this measures how much of the ≤6
# tail the two bands actually catch on real data — the number that
# decides whether to widen to 4 bands at 100 TB.
# ---------------------------------------------------------------------------

_SIMHASH_EVAL_SQL = f"""
WITH {_SQL_SHINGLES},
st AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents
),
sim AS (SELECT doc_id, {_sql_simhash()} AS simhash FROM st),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sim a JOIN sim b
    ON a.simhash // 65536 = b.simhash // 65536 AND a.doc_id < b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM sim a JOIN sim b
    ON a.simhash % 65536 = b.simhash % 65536
   AND a.simhash // 65536 <> b.simhash // 65536
   AND a.doc_id < b.doc_id
),
pairspace AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
exact AS (
  SELECT p.doc_a, p.doc_b
  FROM pairspace p
  JOIN sim x ON x.doc_id = p.doc_a
  JOIN sim y ON y.doc_id = p.doc_b
  WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}
),
found AS (
  SELECT e.doc_a, e.doc_b
  FROM exact e JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_pairs,
  CAST((SELECT count(*) FROM cand) AS BIGINT)  AS n_candidates,
  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM exact), 0), 6) AS recall,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM cand), 0), 6)  AS verify_yield
"""


@register("dedup_simhash_eval", sql=_SIMHASH_EVAL_SQL)
def dedup_simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    hi = lambda side: F.shiftrightunsigned(F.col(f"{side}.simhash"), 16)  # noqa: E731
    lo = lambda side: F.col(f"{side}.simhash") % 65536  # noqa: E731
    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")
    pair_cols = [
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    ]
    cand = (
        a.join(b, (hi("a") == hi("b")) & lt)
        .select(*pair_cols)
        .unionByName(
            a.join(b, (lo("a") == lo("b")) & (hi("a") != hi("b")) & lt).select(
                *pair_cols
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # self-join on the 8-byte xxhash64 shingle key (round 11 s3): the
    # join consumes equality only, so the exchanges carry longs
    keyed = _frequent_shingles_removed(shingle_table(docs)).select(
        "doc_id", F.xxhash64("shingle").alias("_shk")
    )
    sa, sb = keyed.alias("sa"), keyed.alias("sb")
    pairspace = (
        sa.join(
            sb,
            (F.col("sa._shk") == F.col("sb._shk"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x = sim.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sx")
    )
    y = sim.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sy")
    )
    exact = (
        pairspace.join(x, "doc_a")
        .join(y, "doc_b")
        .filter(
            F.bit_count(F.col("sx").bitwiseXOR(F.col("sy")))
            <= SIMHASH_MAX_HAMMING
        )
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    found = exact.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return (
        n_exact.crossJoin(n_cand)
        .crossJoin(n_found)
        .select(
            "n_exact_pairs",
            "n_candidates",
            "n_found",
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_exact_pairs"), F.lit(0)),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("verify_yield"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_simhash_wide — the tuning answer to dedup_simhash_eval's 0.44
# recall: the SAME 32-bit signatures banded 4×8 bits instead of 2×16.
# Pigeonhole guarantees recall 1.0 up to Hamming 3 (any pair differing
# in ≤3 bits leaves at least one of 4 bands clean) and the measured
# tail recall rises accordingly (dedup_simhash_wide_eval). The cost is
# more candidate collisions per band (2^8 buckets vs 2^16) — exactly
# the recall-vs-verify-work dial the eval pair lets an operator set.
# Pairs are emitted by their FIRST matching band (later-band joins
# require all earlier bands to differ), so no distinct shuffle over
# exploded candidates — same plan shape as dedup_simhash.
# ---------------------------------------------------------------------------

_WIDE_BANDS = 4
_WIDE_BITS = 8  # per band; _WIDE_BANDS * _WIDE_BITS == SIMHASH_BITS


def _sql_wide_band(b: int) -> str:
    return f"(simhash // {256 ** b}) % 256"


def _wide_pairs_sql() -> str:
    parts = []
    for b in range(_WIDE_BANDS):
        conds = [
            f"(a.simhash // {256 ** b}) % 256 = (b.simhash // {256 ** b}) % 256"
        ]
        conds += [
            f"(a.simhash // {256 ** j}) % 256 <> (b.simhash // {256 ** j}) % 256"
            for j in range(b)
        ]
        conds.append("a.doc_id < b.doc_id")
        parts.append(
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            " a.simhash AS sa, b.simhash AS sb"
            " FROM sim a JOIN sim b ON " + " AND ".join(conds)
        )
    return "\n  UNION ALL\n  ".join(parts)


_SIMHASH_WIDE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents
),
sim AS (SELECT doc_id, {_sql_simhash()} AS simhash FROM t),
pairs AS (
  {_wide_pairs_sql()}
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
"""


def _wide_candidate_pairs(sim: DataFrame, with_sig: bool = False) -> DataFrame:
    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")

    def band(side: str, i: int):
        return F.shiftrightunsigned(F.col(f"{side}.simhash"), 8 * i) % 256

    cols = [
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    ]
    if with_sig:
        cols += [F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb")]
    out = None
    for i in range(_WIDE_BANDS):
        cond = (band("a", i) == band("b", i)) & lt
        for j in range(i):
            cond = cond & (band("a", j) != band("b", j))
        piece = a.join(b, cond).select(*cols)
        out = piece if out is None else out.unionByName(piece)
    return out


@register("dedup_simhash_wide", sql=_SIMHASH_WIDE_SQL)
def dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    # the 4 band self-joins would evaluate the signature expression 8x
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = _wide_candidate_pairs(sim, with_sig=True)
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return pairs.filter(hamming <= SIMHASH_MAX_HAMMING).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


# ---------------------------------------------------------------------------
# dedup_simhash_wide_incremental — the maintained-view twin of the WIDE
# banding (the production setting): same maintainer, banding='4x8'.
# Shares dedup_simhash_wide's oracle SQL, so the driver hash certifies
# incremental == from-scratch for the setting users actually run.
# ---------------------------------------------------------------------------


@register("dedup_simhash_wide_incremental", sql=_SIMHASH_WIDE_SQL)
def dedup_simhash_wide_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_simhash_batch,
        bootstrap_simhash_state,
        simhash_pairs_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("simhash_wide_ivm")
    bootstrap_simhash_state(spark, state)
    for k in range(3):
        apply_simhash_batch(
            docs.filter(F.col("doc_id") % 3 == k), state, k, banding="4x8"
        )
    return simhash_pairs_snapshot(spark, state)


# ---------------------------------------------------------------------------
# dedup_simhash_wide_summary — the PRODUCTION-grain terminal for the
# wide banding (VERDICT r6 "what's wrong" #1): the raw pair list is
# quadratic in duplicate-class size (250M rows at sf1.0 — computable,
# verifiable by fingerprint, but not an artifact a 100 TB job should
# ship). This collapses it to the doc grain IN THE SAME JOB — per doc:
# how many near-dups, how close the nearest — bounded by corpus size
# regardless of how pathological the duplicate classes get. Pairs stay
# an internal stage, exactly as a production dedup pipeline structures
# it.
# ---------------------------------------------------------------------------

_SIMHASH_WIDE_SUMMARY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents
),
sim AS (SELECT doc_id, {_sql_simhash()} AS simhash FROM t),
pairs AS (
  {_wide_pairs_sql()}
),
kept AS (
  SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
  FROM pairs
  WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
),
sides AS (
  SELECT doc_a AS doc_id, hamming FROM kept
  UNION ALL
  SELECT doc_b AS doc_id, hamming FROM kept
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(hamming) AS BIGINT) AS min_hamming
FROM sides
GROUP BY doc_id
"""


@register("dedup_simhash_wide_summary", sql=_SIMHASH_WIDE_SUMMARY_SQL)
def dedup_simhash_wide_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    # Round 11: aggregate on the DISTINCT-SIGNATURE grain, then blow
    # back up to docs — the doc-pair list (quadratic in duplicate-class
    # size; the very pathology this summary exists to avoid SHIPPING)
    # is no longer MATERIALIZED either. A doc with signature s has
    # (m_s - 1) Hamming-0 partners inside its own signature class
    # (same signature ⇒ band-0 collision ⇒ always a kept pair) plus
    # m_t partners for every adjacent signature t (band-collide,
    # Hamming ≤ cap — a function of the signature pair alone), so
    #   n_dups(s)      = (m_s - 1) + Σ_adjacent m_t
    #   min_hamming(s) = 0 if m_s ≥ 2 else min_adjacent hamming(s, t)
    # and docs with n_dups = 0 drop out exactly as the pair-grain
    # groupBy dropped them. Identical output, |signatures|-bounded
    # joins (the skew stress's ~550-doc bot classes alone put 13.7M
    # Hamming-0 rows in the old pair stage).
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sig = (
        sim.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = sig.alias("a"), sig.alias("b")

    def band(side: str, i: int):
        return F.shiftrightunsigned(F.col(f"{side}.simhash"), 8 * i) % 256

    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    neq = F.col("a.simhash") != F.col("b.simhash")
    adj_cols = [
        F.col("a.simhash").alias("s"),
        F.col("b.m").alias("m_t"),
        hamming.alias("h"),
    ]
    adj = None
    for i in range(_WIDE_BANDS):
        # symmetric adjacency (one row per ordered pair): first-match
        # banding dedups with earlier-band inequality, exactly like the
        # pair generator, but with s<t replaced by s!=t so each side
        # accumulates its own partner multiset
        cond = (band("a", i) == band("b", i)) & neq
        for j in range(i):
            cond = cond & (band("a", j) != band("b", j))
        piece = a.join(b, cond & (hamming <= SIMHASH_MAX_HAMMING)).select(
            *adj_cols
        )
        adj = piece if adj is None else adj.unionByName(piece)
    cross = adj.groupBy("s").agg(
        F.sum("m_t").alias("cross_n"), F.min("h").alias("cross_min")
    )
    per_sig = (
        sig.join(cross, sig.simhash == cross.s, "left")
        .select(
            "simhash",
            (
                (F.col("m") - 1)
                + F.coalesce(F.col("cross_n"), F.lit(0))
            ).alias("n_dups"),
            F.when(F.col("m") >= 2, F.lit(0))
            .otherwise(F.col("cross_min"))
            .alias("min_hamming"),
        )
        .filter(F.col("n_dups") > 0)
    )
    # doc expansion: hint-free join — AQE broadcasts the signature
    # summary while it is small, shuffle join beyond
    return sim.join(per_sig, "simhash").select(
        "doc_id",
        F.col("n_dups").cast("long").alias("n_dups"),
        F.col("min_hamming").cast("long").alias("min_hamming"),
    )


# ---------------------------------------------------------------------------
# dedup_simhash_wide_eval — same ground truth as dedup_simhash_eval,
# candidates from the 4×8 banding: the before/after pair that justifies
# the band widening with a measured number.
# ---------------------------------------------------------------------------

_SIMHASH_WIDE_EVAL_SQL = f"""
WITH {_SQL_SHINGLES},
st AS (
  SELECT doc_id,
         list_transform(
           list_distinct({_SQL_TOKENS}),
           tok -> CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
         ) AS hs,
         len(list_distinct({_SQL_TOKENS})) AS n
  FROM documents
),
sim AS (SELECT doc_id, {_sql_simhash()} AS simhash FROM st),
cand AS (
  SELECT doc_a, doc_b FROM (
    {_wide_pairs_sql()}
  )
),
pairspace AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
exact AS (
  SELECT p.doc_a, p.doc_b
  FROM pairspace p
  JOIN sim x ON x.doc_id = p.doc_a
  JOIN sim y ON y.doc_id = p.doc_b
  WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}
),
found AS (
  SELECT e.doc_a, e.doc_b
  FROM exact e JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_pairs,
  CAST((SELECT count(*) FROM cand) AS BIGINT)  AS n_candidates,
  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM exact), 0), 6) AS recall,
  round(CAST((SELECT count(*) FROM found) AS DOUBLE)
        / NULLIF((SELECT count(*) FROM cand), 0), 6)  AS verify_yield
"""


@register("dedup_simhash_wide_eval", sql=_SIMHASH_WIDE_EVAL_SQL)
def dedup_simhash_wide_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cand = _wide_candidate_pairs(sim).persist(StorageLevel.MEMORY_AND_DISK)
    # self-join on the 8-byte xxhash64 shingle key (round 11 s3): the
    # join consumes equality only, so the exchanges carry longs
    keyed = _frequent_shingles_removed(shingle_table(docs)).select(
        "doc_id", F.xxhash64("shingle").alias("_shk")
    )
    sa, sb = keyed.alias("sa"), keyed.alias("sb")
    pairspace = (
        sa.join(
            sb,
            (F.col("sa._shk") == F.col("sb._shk"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sx"))
    y = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sy"))
    exact = (
        pairspace.join(x, "doc_a")
        .join(y, "doc_b")
        .filter(
            F.bit_count(F.col("sx").bitwiseXOR(F.col("sy")))
            <= SIMHASH_MAX_HAMMING
        )
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    found = exact.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return (
        n_exact.crossJoin(n_cand)
        .crossJoin(n_found)
        .select(
            "n_exact_pairs",
            "n_candidates",
            "n_found",
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_exact_pairs"), F.lit(0)),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_found").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("verify_yield"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_chunks — CHUNK-grain exact dedup (the substring-level pass in
# production pipelines; suffix-array dedup's practical cousin): split
# every document into non-overlapping 10-token chunks and surface each
# chunk that recurs across >= 2 distinct documents — boilerplate spans,
# quoted passages, template fragments. Document-grain dedup
# (dedup_exact .. dedup_simhash) can't see these: two docs sharing one
# span are NOT near-duplicates, yet a trained model sees the span
# every epoch. Fixed-width chunks instead of sentence splits keep the
# grain well-defined on unpunctuated text. Plan: chunks are generated
# ROW-LOCALLY (slice over the token array), the doc-distinct and total
# counts come from ONE expand-based aggregation whose partial phase
# dedupes (chunk, doc) map-side — a chunk shared by half the corpus
# spreads across tasks instead of one collect_set array. No self-join,
# no window, nothing all-pairs, one corpus scan.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 10
CHUNK_MIN_DOCS = 2

_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         array_to_string(
           list_slice(t, (i - 1) * {CHUNK_TOKENS} + 1, i * {CHUNK_TOKENS}),
           ' ') AS chunk
  FROM toks,
       unnest(generate_series(1, len(t) // {CHUNK_TOKENS})) AS u(i)
),
counts AS (
  SELECT chunk,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT)               AS n_occurrences
  FROM chunks GROUP BY chunk
)
SELECT chunk, n_docs, n_occurrences
FROM counts WHERE n_docs >= {CHUNK_MIN_DOCS}
"""


@register("dedup_chunks", sql=_CHUNKS_SQL)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    # short-doc guard BEFORE chunk generation (text_boilerplate
    # contract: F.sequence(1, 0) steps -1 and emits [1, 0])
    toks = spread(
        docs.select("doc_id", _tokens().alias("t")).filter(
            F.size("t") >= CHUNK_TOKENS
        )
    )
    t = F.col("t")
    chunk_arr = F.transform(
        F.sequence(F.lit(1), F.floor(F.size(t) / CHUNK_TOKENS).cast("int")),
        lambda i: F.array_join(
            F.slice(t, (i - 1) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
        ),
    )
    chunks = toks.select("doc_id", F.explode(chunk_arr).alias("chunk"))
    # ONE aggregation: countDistinct compiles to Spark's expand +
    # two-phase partial agg, which dedupes (chunk, doc) map-side —
    # the same skew discipline as an explicit composite-key dedupe,
    # without the second corpus pass and the chunk-grain join the
    # first cut of this query paid (EXPLAIN_r6 audit: 4 scans -> 1)
    return (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= CHUNK_MIN_DOCS)
    )


# ---------------------------------------------------------------------------
# dedup_containment — asymmetric near-superset detection: containment
# C(A,B) = |A∩B| / min(|A|, |B|) over DF-capped shingle sets (Broder
# 1997's "containment" resemblance twin). Jaccard misses quote/excerpt
# duplication — a 100-line doc fully embedded in a 10,000-line doc has
# Jaccard ≈ 0.01 but containment 1.0 — and training corpora are full of
# exactly that shape (boilerplate-wrapped reposts, quoted threads,
# concatenated dumps). Same scale discipline as the Jaccard pass: pairs
# only materialize through the shingle equi-join (never doc×doc), the
# DF cap bounds any shingle's fan-out, and the final ratio is a
# per-pair O(1) lookup against the broadcast-size doc-size table.
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8

_CONTAINMENT_SQL = f"""
WITH {_SQL_SHINGLES},
sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(CAST(c.n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
         AS containment
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh)
      >= {CONTAINMENT_THRESHOLD}
"""


@register("dedup_containment", sql=_CONTAINMENT_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    raw = shingle_table(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sh = _frequent_shingles_removed(raw)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # self-join on the 8-byte xxhash64 shingle key (round 11 s3)
    keyed = sh.select("doc_id", F.xxhash64("shingle").alias("_shk"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    common = (
        a.join(
            b,
            (F.col("a._shk") == F.col("b._shk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    ratio = F.col("n_common").cast("double") / F.least("n_a", "n_b")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(ratio >= CONTAINMENT_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.round(ratio, 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_semantic — SemDeDup-style semantic deduplication (Abbas et al.,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication", arXiv:2303.09540): within each coarse cluster (the
# `label` column = k-means cell, exactly the paper's recipe), vectors
# whose cosine exceeds the threshold form semantic-duplicate groups and
# only one representative survives. Greedy keeper rule: a vector is
# DROPPED iff it has a smaller-id neighbor above threshold — the kept
# set is then exactly the ids with no smaller-id duplicate, computed in
# one pass over the pair list (no iteration needed, unlike connected
# components, because keep/drop only requires the min-id witness, not
# the full component). Output is the actionable artifact: the drop list
# with each vector's witness keeper and its duplicate-neighborhood
# stats. Scale shape inherits dedup_embedding_cosine: pairs only
# materialize cell-locally (linear in cell size, never corpus²), the
# drop-set agg is one hash aggregate on the pair list.
# ---------------------------------------------------------------------------

_SEMANTIC_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS nsq
  FROM embeddings
),
pairs AS (
  SELECT
    a.vec_id AS va,
    b.vec_id AS vb,
    a.label  AS label,
    round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6) AS c
  FROM e a
  JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) / sqrt(a.nsq * b.nsq), 6)
        >= {_SYNTHETIC_EMB_THRESHOLD}
)
SELECT vb                             AS dropped_vec_id,
       CAST(max(label) AS BIGINT)     AS label,
       min(va)                        AS kept_by,
       CAST(count(*) AS BIGINT)       AS n_dup_neighbors,
       max(c)                         AS max_cosine
FROM pairs
GROUP BY vb
"""


@register("dedup_semantic", sql=_SEMANTIC_SQL)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nsq", dot_expr(F.col("v"), F.col("v")))
    a = spread(emb, "vec_id").alias("a")
    b = F.broadcast(emb).alias("b")
    cos = F.round(
        dot_expr(F.col("a.v"), F.col("b.v"))
        / F.sqrt(F.col("a.nsq") * F.col("b.nsq")),
        6,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.col("a.label").alias("label"),
            eval_once(cos).alias("c"),
        )
        .filter(F.col("c") >= _SYNTHETIC_EMB_THRESHOLD)
    )
    return pairs.groupBy(F.col("vb").alias("dropped_vec_id")).agg(
        F.max("label").cast("long").alias("label"),
        F.min("va").alias("kept_by"),
        F.count(F.lit(1)).cast("long").alias("n_dup_neighbors"),
        F.max("c").alias("max_cosine"),
    )




# ---------------------------------------------------------------------------
# dedup_prefix_jaccard — all-pairs set-similarity join with PREFIX
# FILTERING (Bayardo/Ma/Srikant WWW'07 "Scaling up all pairs
# similarity search"; Chaudhuri et al.'s SSJoin primitive): two item
# SETS can reach Jaccard >= t only if their (globally rarest-first)
# prefixes of length |d| - ceil(t*|d|) + 1 share an item, so only
# prefix items are indexed and joined; a LENGTH filter inside the
# candidate join (t*max(|A|,|B|) <= min(|A|,|B|), integer arithmetic)
# prunes cross-size pairs. EXACT — provably no false negatives —
# completing the candidate-generation family: banded MinHash
# (probabilistic), DF-capped shingles (heuristic), prefix filter
# (exact), each with its own cost envelope.
#
# The item universe is the DISTINCT 5-token SHINGLE set (uncapped —
# capping would break the exactness guarantee), not unigram tokens:
# prefix filtering's effectiveness rests on rare items existing, and a
# small-vocabulary corpus has NO rare unigrams — the sf0.5 stress
# sweep measured the unigram variant's rarest-first prefixes landing
# on items with df ~10^4, reinflating the candidate join to ~10^8 raw
# pairs (SCALE.md). Shingle universes are |vocab|^k-sparse, so the
# rarest-first prefix is genuinely rare at every scale; this is also
# how production prefix-filter dedup is deployed.
#
# Plan shape: shingle df via one hash agg; per-doc rarest-first
# ordering is a row-local array sort after the df join (no global
# vocab rank, no vocab-grain window); candidates materialize only
# through the (prefix-shingle, length-window) equi-join; verification
# is a row-local array_intersect on the two carried shingle arrays,
# bounded by doc length. Integer prefix arithmetic ((19n+19) div 20)
# so both engines compute identical prefix lengths; the threshold
# compares the ROUNDED jaccard on both engines (the events_anomaly
# sf0.5 lesson).
# ---------------------------------------------------------------------------

# ceil(0.95 * n) == (19n + 19) div 20 exactly, in integers
_PREFIX_T_NUM, _PREFIX_T_DEN = 19, 20
_PREFIX_THRESHOLD = 0.95

_PREFIX_ITEMS_SQL = f"""
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {SHINGLE_K - 1}), ' ')
           AS item
  FROM (
    SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    WHERE len({_SQL_TOKENS}) >= {SHINGLE_K}
  ), unnest(generate_series(1, len(t) - {SHINGLE_K - 1})) AS g(i)
"""

_PREFIX_BASE_SQL = f"""
items AS MATERIALIZED ({_PREFIX_ITEMS_SQL}),
df AS (SELECT item, CAST(count(*) AS BIGINT) AS dfc FROM items GROUP BY item),
perdoc AS MATERIALIZED (
  SELECT t.doc_id,
         list(t.item ORDER BY d.dfc, t.item) AS toks,
         CAST(count(*) AS BIGINT) AS n
  FROM items t JOIN df d ON d.item = t.item
  GROUP BY t.doc_id
),
pref AS MATERIALIZED (
  SELECT doc_id, n,
         unnest(list_slice(
           toks, 1,
           CAST(n - (({_PREFIX_T_NUM} * n + {_PREFIX_T_NUM})
                     // {_PREFIX_T_DEN}) + 1 AS BIGINT))) AS ptok
  FROM perdoc
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b
    ON a.ptok = b.ptok AND a.doc_id < b.doc_id
   AND {_PREFIX_T_DEN} * least(a.n, b.n)
       >= {_PREFIX_T_NUM} * greatest(a.n, b.n)
  GROUP BY doc_a, doc_b
),
verified AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(pa.toks, pb.toks)) AS DOUBLE)
               / (pa.n + pb.n - len(list_intersect(pa.toks, pb.toks))),
               6) AS jaccard
  FROM cand c
  JOIN perdoc pa ON pa.doc_id = c.doc_a
  JOIN perdoc pb ON pb.doc_id = c.doc_b
)
"""

_PREFIX_SQL = f"""
WITH {_PREFIX_BASE_SQL}
SELECT doc_a, doc_b, jaccard
FROM verified
WHERE jaccard >= {_PREFIX_THRESHOLD}
"""


def prefix_jaccard_frames(items: DataFrame):
    """Prefix-filter pipeline over any DISTINCT (doc_id, item) frame;
    returns (perdoc, pref, cand, verified). Unit/property-testable
    core (test_properties feeds raw tokens as items and checks set
    equality against a brute-force Python model)."""
    dfc = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("dfc")
    )
    perdoc = (
        items.join(dfc, "item")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dfc", "item"))),
                lambda r: r["item"],
            ).alias("toks"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        # referenced by the prefix explode AND both verify joins — one
        # materialized cut instead of three item-df joins
        .localCheckpoint()
    )
    plen = (
        F.col("n")
        - F.expr(
            f"({_PREFIX_T_NUM} * n + {_PREFIX_T_NUM}) div {_PREFIX_T_DEN}"
        )
        + 1
    )
    pref = perdoc.select(
        "doc_id",
        "n",
        F.explode(F.slice("toks", F.lit(1), plen.cast("int"))).alias(
            "ptok"
        ),
    )
    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter (the paper's second pruning rule):
            # Jaccard >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
            & (
                F.lit(_PREFIX_T_DEN)
                * F.least(F.col("a.n"), F.col("b.n"))
                >= F.lit(_PREFIX_T_NUM)
                * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    pa = perdoc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    pb = perdoc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    verified = (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # eval_once: the threshold filter above would otherwise be
            # pushed into the verify join, running the array_intersect
            # twice per candidate
            eval_once(
                F.round(
                    inter.cast("double")
                    / (F.col("n_a") + F.col("n_b") - inter),
                    6,
                )
            ).alias("jaccard"),
        )
    )
    return perdoc, pref, cand, verified


def _prefix_frames(spark: SparkSession, sf_dir: str):
    """Pipeline frames over the corpus's distinct 5-token shingles —
    shared by the pair query and its eval twin."""
    docs = T(spark, sf_dir, "documents")
    items = shingle_table(docs).select(
        "doc_id", F.col("shingle").alias("item")
    )
    return prefix_jaccard_frames(items)


@register("dedup_prefix_jaccard", sql=_PREFIX_SQL)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, _, verified = _prefix_frames(spark, sf_dir)
    return verified.filter(F.col("jaccard") >= _PREFIX_THRESHOLD)


# ---------------------------------------------------------------------------
# dedup_prefix_jaccard_eval — the measurement twin: how much candidate
# work does prefix filtering actually avoid? Candidate GENERATIONS are
# counted at the item grain (sum of C(df, 2) — the number of pair
# emissions an inverted-index join would perform) for (a) the full
# shingle index and (b) the prefix index, so the "what we avoided"
# number never requires materializing the avoided pairs. Alongside:
# the distinct prefix-candidate count and the verified-pair count,
# giving the verify precision. All counts exact integers.
# ---------------------------------------------------------------------------

_PREFIX_EVAL_SQL = f"""
WITH {_PREFIX_BASE_SQL},
fullgen AS (
  SELECT CAST(sum(dfc * (dfc - 1) // 2) AS BIGINT) AS n FROM df
),
prefgen AS (
  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n FROM (
    SELECT ptok, CAST(count(*) AS BIGINT) AS c FROM pref GROUP BY ptok
  )
),
ncand AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cand),
nver AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM verified
  WHERE jaccard >= {_PREFIX_THRESHOLD}
)
SELECT fullgen.n  AS full_candidate_generations,
       prefgen.n  AS prefix_candidate_generations,
       ncand.n    AS n_prefix_pairs,
       nver.n     AS n_verified_pairs,
       round(CAST(fullgen.n AS DOUBLE) / prefgen.n, 2)
         AS candidate_reduction,
       round(CAST(nver.n AS DOUBLE) / ncand.n, 6) AS verify_precision
FROM fullgen, prefgen, ncand, nver
"""


@register("dedup_prefix_jaccard_eval", sql=_PREFIX_EVAL_SQL)
def dedup_prefix_jaccard_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    perdoc, pref, cand, verified = _prefix_frames(spark, sf_dir)
    dfc = (
        perdoc.select(F.explode("toks").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("dfc"))
    )
    fullgen = dfc.agg(
        F.sum(F.expr("dfc * (dfc - 1) div 2"))
        .cast("long")
        .alias("full_candidate_generations")
    )
    prefgen = (
        pref.groupBy("ptok")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) div 2"))
            .cast("long")
            .alias("prefix_candidate_generations")
        )
    )
    ncand = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_prefix_pairs")
    )
    nver = verified.filter(
        F.col("jaccard") >= _PREFIX_THRESHOLD
    ).agg(F.count(F.lit(1)).cast("long").alias("n_verified_pairs"))
    return (
        fullgen.crossJoin(prefgen)
        .crossJoin(ncand)
        .crossJoin(nver)
        .select(
            "full_candidate_generations",
            "prefix_candidate_generations",
            "n_prefix_pairs",
            "n_verified_pairs",
            F.round(
                F.col("full_candidate_generations").cast("double")
                / F.col("prefix_candidate_generations"),
                2,
            ).alias("candidate_reduction"),
            F.round(
                F.col("n_verified_pairs").cast("double")
                / F.col("n_prefix_pairs"),
                6,
            ).alias("verify_precision"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_keep_best — the curation DECISION that closes the dedup loop:
# pairs → connected components → pick ONE canonical document per
# duplicate cluster and quantify what gets dropped. Keeper policy is
# the standard one (keep the longest document; break ties on the
# smallest doc_id so the choice is stable across runs and engines) —
# the rule CCNet/RefinedWeb-style pipelines apply after clustering.
# Output: one row per non-singleton cluster with the keeper and the
# char volume the deletion reclaims.
#
# Scale shape: reuses the bulk-synchronous CC labels (min-label
# propagation, O(diameter) rounds); the keeper election is ONE window
# over the component grain — bounded by cluster size, never the
# corpus — and singletons are filtered before anything wide happens.
# At 100 TB this is the exact production job: label, elect, reclaim.
# ---------------------------------------------------------------------------

def _keep_best_sql(where: str = "") -> str:
    """Keeper election over the (optionally corpus-restricted) CC
    labeling — ``where`` threads through to ``_cc_sql`` so the removal
    twin's oracle elects over exactly the surviving corpus."""
    return f"""
WITH comp AS (
  SELECT * FROM ({_cc_sql(where)}) c
),
j AS (
  SELECT comp.component_id, d.doc_id, d.n_chars
  FROM comp JOIN documents d ON d.doc_id = comp.doc_id
),
r AS (
  SELECT component_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY component_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*)   OVER (PARTITION BY component_id) AS n_members,
         sum(n_chars) OVER (PARTITION BY component_id) AS total_chars
  FROM j
)
SELECT CAST(component_id AS BIGINT) AS component_id,
       CAST(n_members AS BIGINT)    AS n_members,
       CAST(doc_id AS BIGINT)       AS keeper_doc_id,
       CAST(n_chars AS BIGINT)      AS keeper_chars,
       CAST(total_chars - n_chars AS BIGINT) AS chars_dropped
FROM r
WHERE rn = 1 AND n_members >= 2
"""


_KEEP_BEST_SQL = _keep_best_sql()


def keep_best_from_components(comp: DataFrame, docs: DataFrame) -> DataFrame:
    """The keeper election over a (doc_id, component_id) labeling: one
    window per component grain — bounded by cluster size, never the
    corpus. Shared by the batch terminal and its incremental twin, so
    both elect with identical semantics."""
    from pyspark.sql import Window

    j = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component_id")
    r = j.select(
        "component_id",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_members"),
        F.sum("n_chars").over(w).alias("total_chars"),
    )
    return r.filter((F.col("rn") == 1) & (F.col("n_members") >= 2)).select(
        F.col("component_id").cast("long").alias("component_id"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("doc_id").cast("long").alias("keeper_doc_id"),
        F.col("n_chars").cast("long").alias("keeper_chars"),
        (F.col("total_chars") - F.col("n_chars"))
        .cast("long")
        .alias("chars_dropped"),
    )


@register("dedup_keep_best", sql=_KEEP_BEST_SQL)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_connected_components(spark, sf_dir)
    docs = T(spark, sf_dir, "documents")
    return keep_best_from_components(comp, docs)


# ---------------------------------------------------------------------------
# dedup_cluster_incremental / dedup_keep_best_incremental — the
# maintained-view twins of the CLUSTER-grain production terminals
# (VERDICT r7 #4, streaming/dedup_ivm.apply_cluster_batch — the
# eleventh IVM class): the documents table is ingested as THREE modulo
# batches; each batch maintains signatures, pairs AND component labels
# (additions = label-grain contraction merges; the corpus-scale cluster
# table is never reshuffled — plan-guarded). The oracles are the SAME
# from-scratch SQL as dedup_connected_components / dedup_keep_best, so
# the driver hash certifies incremental == from-scratch end to end for
# the terminals users actually ship, not just the pair stage.
# ---------------------------------------------------------------------------


@register("dedup_cluster_incremental", sql=_CC_SQL)
def dedup_cluster_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        cluster_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("cluster_ivm")
    bootstrap_cluster_state(spark, state)
    for k in range(3):
        apply_cluster_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return cluster_snapshot(spark, state)


@register("dedup_keep_best_incremental", sql=_KEEP_BEST_SQL)
def dedup_keep_best_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        cluster_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("cluster_ivm_kb")
    bootstrap_cluster_state(spark, state)
    for k in range(3):
        apply_cluster_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return keep_best_from_components(cluster_snapshot(spark, state), docs)


@register("dedup_cluster_removal_incremental", sql=_cc_sql("WHERE doc_id % 17 <> 3"))
def dedup_cluster_removal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintainer's REMOVAL path under the driver hash (round 9 —
    previously pytest-only): three insert batches, then a pure removal
    batch retracting every ``doc_id % 17 == 3`` document. Splits must
    recompute exactly the affected components (bounded by their member
    sets) and, since the round-9 log conversion, the batch writes only
    tombstones + re-emitted post-split rows, never the corpus-scale
    cluster table (``streaming/dedup_ivm.apply_cluster_batch``). The
    oracle is the SAME from-scratch CC SQL restricted to the surviving
    corpus, so the hash certifies remove == never-ingested."""
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        cluster_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("cluster_ivm_rm")
    bootstrap_cluster_state(spark, state)
    for k in range(3):
        apply_cluster_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    removed = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 17 == 3)
        .select("doc_id")
        .collect()
    ]
    apply_cluster_batch(docs.limit(0), state, 3, remove=removed)
    return cluster_snapshot(spark, state)


@register(
    "dedup_keep_best_removal_incremental",
    sql=_keep_best_sql("WHERE doc_id % 17 <> 3"),
)
def dedup_keep_best_removal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The keep-best terminal elected over the post-removal maintained
    labels — same batch sequence as ``dedup_cluster_removal_incremental``
    (shares its state dir ordering but re-runs the maintainer so each
    registry entry is self-contained); oracle = the election SQL over
    the surviving corpus. Certifies that split components re-elect
    their keepers correctly after retraction."""
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        cluster_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("cluster_ivm_kb_rm")
    bootstrap_cluster_state(spark, state)
    for k in range(3):
        apply_cluster_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    removed = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 17 == 3)
        .select("doc_id")
        .collect()
    ]
    apply_cluster_batch(docs.limit(0), state, 3, remove=removed)
    survivors = docs.filter(F.col("doc_id") % 17 != 3)
    return keep_best_from_components(
        cluster_snapshot(spark, state), survivors
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (ExactSubstr family).
#
# The sixth dedup family: instead of asking "are these two DOCUMENTS
# near-duplicates?" it asks "which TOKEN SPANS are repeated anywhere in
# the corpus?" — the operator behind suffix-array training-data dedup
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better"). A suffix array is a single-node data structure; the
# distributed equivalent is positional k-gram fingerprints:
#
#   1. (doc_id, pos, md5(k-gram)) for EVERY token position — positional,
#      unlike the distinct shingle table above.
#   2. A k-gram occurring >= 2 times anywhere (other docs OR elsewhere in
#      the same doc) marks its k-token window as duplicated text.
#   3. Per doc, the union length of the marked windows needs no interval
#      tree: windows all have length k, so sorted by start the i-th
#      window contributes min(k, start_i - start_{i-1}) new tokens — one
#      window function.
#
# Scale: the positional table is |corpus tokens| rows, but nothing here
# is ever pairwise — the duplicate test is a count>1 aggregate (map-side
# combined to distinct grams) plus one shuffle hash semi-join back on the
# gram hash, and the coverage window partitions by doc_id (bounded per
# doc). No stop-gram cap is needed: a gram seen a million times costs
# exactly one aggregate row, never a million^2 pair join. This is the
# 100 TB-safe shape; the quadratic danger lives only in pair-emitting
# families above.
# ---------------------------------------------------------------------------

SUBSTR_K = 8  # tokens per duplicated-span fingerprint window


def positional_grams(docs: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """(doc_id, n, pos, g): md5 of the k-token window at every position.

    Same materialize-below-the-exchange trick as ``shingle_table``: the
    tokenizing regex runs once per doc behind the spread exchange, not
    once per window position.
    """
    toks = F.col("toks")
    # g is LONG = xxhash64 over the token-array window (round 11, guide
    # §2.3 "narrower types" + §4.1 "cheapest built-in"): no per-window
    # concat string, no md5 — the array hash works straight off the
    # token slice (tokens are whitespace-split, so the old concat_ws
    # key was already boundary-unambiguous; the array hash is too).
    # Only gram EQUALITY is ever consumed (occurrence counts, semi-
    # joins) and g never reaches an output, so results are unchanged;
    # the corpus-scale gram logs, shuffles and hash probes now carry an
    # 8-byte fixed-width key instead of 16-byte binary (33-byte hex
    # before round 11). Interleaved A/B at the substr-sf1.0 stress:
    # gram stage 3.97 -> 3.59 s median; end-to-end coverage ~ -20%.
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.slice(toks, i, k)).alias("g"),
        ),
    )
    return (
        spread(
            docs.filter(F.size(_tokens()) >= k).select(
                "doc_id", _tokens().alias("toks")
            ),
            "doc_id",
        )
        .select("doc_id", F.size(toks).alias("n"), F.explode(windows).alias("w"))
        .select("doc_id", "n", F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    )


def duplicated_positions(pos: DataFrame) -> DataFrame:
    """Positions whose k-gram occurs >= 2 times corpus-wide.

    ``pos`` should be persisted by the caller — it feeds both the gram
    aggregate and the semi-join probe side.
    """
    dup = (
        pos.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("g")
    )
    return pos.join(dup, "g", "left_semi")


def _coverage_per_doc(cov: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """(doc_id, n_tokens, dup_tokens, dup_fraction) from marked positions."""
    from pyspark.sql import Window

    from codex_data_products_spark.functions.compat import dratio

    w = Window.partitionBy("doc_id").orderBy("pos")
    new_tokens = F.least(
        F.lit(k), F.col("pos") - F.lag("pos", 1, None).over(w)
    )
    per_pos = cov.select(
        "doc_id",
        "n",
        F.coalesce(new_tokens, F.lit(k)).alias("new_tokens"),
    )
    return per_pos.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.sum("new_tokens").cast("long").alias("dup_tokens"),
        dratio(F.sum("new_tokens"), F.max("n")).alias("dup_fraction"),
    )


def _sql_positional(where: str = "") -> str:
    """The positional-gram CTE chain, optionally restricted to a
    surviving sub-corpus (the removal-terminal incremental twin)."""
    return f"""
ptoks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
  WHERE len({_SQL_TOKENS}) >= {SUBSTR_K} {where}
),
pos AS (
  SELECT doc_id, len(t) AS n, i AS pos,
         md5(array_to_string(list_slice(t, i, i + {SUBSTR_K - 1}), ' ')) AS g
  FROM ptoks, unnest(generate_series(1, len(t) - {SUBSTR_K - 1})) AS u(i)
),
cov AS (
  SELECT doc_id, n, pos FROM pos
  WHERE g IN (SELECT g FROM pos GROUP BY g HAVING count(*) > 1)
)
"""


def _substr_sql(where: str = "") -> str:
    return f"""
WITH {_sql_positional(where)}
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(sum(new_tokens) AS BIGINT) AS dup_tokens,
       {sql_dratio('sum(new_tokens)', 'max(n)')} AS dup_fraction
FROM (
  SELECT doc_id, n,
         least({SUBSTR_K}, pos - lag(pos, 1, pos - {SUBSTR_K})
               OVER (PARTITION BY doc_id ORDER BY pos)) AS new_tokens
  FROM cov
)
GROUP BY doc_id
"""


_SQL_POSITIONAL = f"""
ptoks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
  WHERE len({_SQL_TOKENS}) >= {SUBSTR_K}
),
pos AS (
  SELECT doc_id, len(t) AS n, i AS pos,
         md5(array_to_string(list_slice(t, i, i + {SUBSTR_K - 1}), ' ')) AS g
  FROM ptoks, unnest(generate_series(1, len(t) - {SUBSTR_K - 1})) AS u(i)
),
cov AS (
  SELECT doc_id, n, pos FROM pos
  WHERE g IN (SELECT g FROM pos GROUP BY g HAVING count(*) > 1)
)
"""

_SUBSTR_SQL = f"""
WITH {_SQL_POSITIONAL}
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(sum(new_tokens) AS BIGINT) AS dup_tokens,
       {sql_dratio('sum(new_tokens)', 'max(n)')} AS dup_fraction
FROM (
  SELECT doc_id, n,
         least({SUBSTR_K}, pos - lag(pos, 1, pos - {SUBSTR_K})
               OVER (PARTITION BY doc_id ORDER BY pos)) AS new_tokens
  FROM cov
)
GROUP BY doc_id
"""


@register("dedup_substring", sql=_SUBSTR_SQL)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: how many of each doc's
    tokens sit inside an 8-token window that occurs >= 2 times anywhere
    in the corpus. The doc-grain report an ExactSubstr-style pipeline
    filters on (e.g. drop or trim docs above 80% duplicated)."""
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    pos = positional_grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    return _coverage_per_doc(duplicated_positions(pos))


_SUBSTR_SPANS_SQL = f"""
WITH {_SQL_POSITIONAL},
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos, 1, pos - {SUBSTR_K + 1})
                    OVER (PARTITION BY doc_id ORDER BY pos) > {SUBSTR_K}
              THEN 1 ELSE 0 END AS brk
  FROM cov
),
islands AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {SUBSTR_K - 1} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM islands GROUP BY doc_id, island
"""


@register("dedup_substring_spans", sql=_SUBSTR_SPANS_SQL)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged duplicated spans as (doc_id, span_start, span_end) token
    intervals — the cut list an ExactSubstr trimmer applies. Classic
    gaps-and-islands: a new island starts when the next marked position
    no longer overlaps the previous window (gap > k); islands are then
    one groupBy. Both the flag and the island id are windows over the
    same (doc_id, pos) sort, so Spark plans a single shuffle + sort."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    pos = positional_grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cov = duplicated_positions(pos)
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.coalesce(
            F.col("pos") - F.lag("pos", 1, None).over(w), F.lit(SUBSTR_K + 1)
        )
        > SUBSTR_K,
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = cov.select("doc_id", "pos", brk.alias("brk")).select(
        "doc_id",
        "pos",
        F.sum("brk").over(w).alias("island"),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + (SUBSTR_K - 1)).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("island")


_SUBSTR_SUMMARY_SQL = f"""
WITH {_SQL_POSITIONAL},
per_doc AS (
  SELECT doc_id, max(n) AS n, sum(new_tokens) AS dup
  FROM (
    SELECT doc_id, n,
           least({SUBSTR_K}, pos - lag(pos, 1, pos - {SUBSTR_K})
                 OVER (PARTITION BY doc_id ORDER BY pos)) AS new_tokens
    FROM cov
  ) GROUP BY doc_id
),
universe AS (
  SELECT count(*) AS n_docs, sum(len({_SQL_TOKENS})) AS corpus_tokens
  FROM documents WHERE len({_SQL_TOKENS}) >= {SUBSTR_K}
)
SELECT CAST(u.n_docs AS BIGINT) AS n_docs,
       CAST(count(p.doc_id) AS BIGINT) AS dup_docs,
       CAST(u.corpus_tokens AS BIGINT) AS corpus_tokens,
       CAST(coalesce(sum(p.dup), 0) AS BIGINT) AS dup_tokens,
       {sql_dratio('coalesce(sum(p.dup), 0)', 'u.corpus_tokens')} AS dup_share,
       CAST(coalesce(sum(CASE WHEN 2 * p.dup >= p.n THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS heavy_docs
FROM universe u LEFT JOIN per_doc p ON true
GROUP BY u.n_docs, u.corpus_tokens
"""


@register("dedup_substring_summary", sql=_SUBSTR_SUMMARY_SQL)
def dedup_substring_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus report: docs touched, duplicated-token share of the
    corpus, and docs >= 50% duplicated (trim-or-drop candidates). The
    doc-grain intermediate collapses via map-side partial aggregation
    before a single-row final — same terminal shape as
    ``dedup_simhash_wide_summary``."""
    from pyspark import StorageLevel

    docs = T(spark, sf_dir, "documents")
    pos = positional_grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    per_doc = _coverage_per_doc(duplicated_positions(pos))
    universe = docs.filter(F.size(_tokens()) >= SUBSTR_K).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("corpus_tokens"),
    )
    from codex_data_products_spark.functions.compat import dratio

    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("dup_docs"),
        F.coalesce(F.sum("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce(
            F.sum(
                F.when(
                    F.lit(2) * F.col("dup_tokens") >= F.col("n_tokens"), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("heavy_docs"),
    )
    return (
        universe.crossJoin(F.broadcast(stats))
        .withColumn(
            "dup_share", dratio(F.col("dup_tokens"), F.col("corpus_tokens"))
        )
        .select(
            "n_docs",
            "dup_docs",
            "corpus_tokens",
            "dup_tokens",
            "dup_share",
            "heavy_docs",
        )
    )


@register("dedup_substring_incremental", sql=_SUBSTR_SQL)
def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin: three modulo batches through the substring
    maintainer (``streaming.substring_ivm``), snapshot checked against
    the SAME from-scratch SQL oracle as ``dedup_substring`` — the
    driver hash certifies incremental == from-scratch end to end,
    including the retroactive 1->2 occurrence-flip repair."""
    from codex_data_products_spark.streaming.substring_ivm import (
        apply_substring_batch,
        bootstrap_substring_state,
        substring_coverage_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("substring_ivm")
    bootstrap_substring_state(spark, state)
    for k in range(3):
        apply_substring_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return substring_coverage_snapshot(spark, state)


@register(
    "dedup_substring_removal_incremental",
    sql=_substr_sql("AND doc_id % 7 <> 3"),
)
def dedup_substring_removal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The substring maintainer's REMOVAL path (round 9): three insert
    batches then a pure removal batch retracting every
    ``doc_id % 7 == 3`` — removed docs' grams DECREMENT the occ fold
    (negative log entries), a 2→1 unflip repairs the surviving
    holder, and the retracted docs die through the shared tombstones.
    Oracle = the SAME from-scratch SQL restricted to the surviving
    corpus, so the driver hash certifies remove == never-ingested."""
    from codex_data_products_spark.streaming.substring_ivm import (
        apply_substring_batch,
        bootstrap_substring_state,
        substring_coverage_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("substring_ivm_rm")
    bootstrap_substring_state(spark, state)
    for k in range(3):
        apply_substring_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    victims = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 7 == 3)
        .select("doc_id")
        .collect()
    ]
    apply_substring_batch(docs.limit(0), state, 3, remove=victims)
    return substring_coverage_snapshot(spark, state)


_SUBSTR_TRIM_SQL = f"""
WITH {_SQL_POSITIONAL},
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos, 1, pos - {SUBSTR_K + 1})
                    OVER (PARTITION BY doc_id ORDER BY pos) > {SUBSTR_K}
              THEN 1 ELSE 0 END AS brk
  FROM cov
),
islands AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id,
         list(struct_pack(s := span_start, e := span_end)) AS cuts
  FROM (
    SELECT doc_id, min(pos) AS span_start,
           max(pos) + {SUBSTR_K - 1} AS span_end
    FROM islands GROUP BY doc_id, island
  ) GROUP BY doc_id
),
trimmed AS (
  SELECT t.doc_id,
         len(t.t) AS n,
         [t.t[i] FOR i IN generate_series(1, len(t.t))
          IF len(list_filter(s.cuts,
                             c -> i BETWEEN c.s AND c.e)) = 0] AS kept
  FROM ptoks t JOIN spans s ON t.doc_id = s.doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS kept_tokens,
       md5(coalesce(array_to_string(kept, ' '), '')) AS trimmed_md5
FROM trimmed
"""


@register("dedup_substring_trim", sql=_SUBSTR_TRIM_SQL)
def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the ExactSubstr cut list: docs with duplicated spans get
    their covered tokens REMOVED (the trim variant of drop-the-doc
    dedup — Lee et al. 2022 remove the repeated substring, not the
    document). The spans collapse to a per-doc array (bounded: spans
    per doc <= n/k), broadcast-join back onto the doc grain, and the
    trim itself is one row-local higher-order filter over token
    positions — no explode, no per-token shuffle. The trimmed text
    ships as md5 so the result stays hash-checkable without moving
    full text through the comparator."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    pos = positional_grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cov = duplicated_positions(pos)
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.coalesce(
            F.col("pos") - F.lag("pos", 1, None).over(w), F.lit(SUBSTR_K + 1)
        )
        > SUBSTR_K,
        F.lit(1),
    ).otherwise(F.lit(0))
    spans = (
        cov.select("doc_id", "pos", brk.alias("brk"))
        .select("doc_id", "pos", F.sum("brk").over(w).alias("island"))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + (SUBSTR_K - 1)).alias("e"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("cuts"))
    )
    toks = F.col("toks")
    cut_hits = lambda i: F.exists(  # noqa: E731
        F.col("cuts"), lambda c: (i >= c["s"]) & (i <= c["e"])
    )
    kept = F.filter(
        F.transform(F.sequence(F.lit(1), F.size(toks)), lambda i: i),
        lambda i: ~cut_hits(i),
    )
    trimmed = (
        docs.filter(F.size(_tokens()) >= SUBSTR_K)
        .select("doc_id", _tokens().alias("toks"))
        .join(spans, "doc_id")
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.transform(
                kept, lambda i: F.element_at(toks, i.cast("int"))
            ).alias("kept_toks"),
        )
    )
    return trimmed.select(
        "doc_id",
        "n_tokens",
        F.size("kept_toks").cast("long").alias("kept_tokens"),
        F.md5(
            F.concat_ws(" ", F.col("kept_toks")).cast("binary")
        ).alias("trimmed_md5"),
    )
