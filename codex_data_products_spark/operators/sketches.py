"""Probabilistic-sketch operators built from DataFrame primitives.

A Bloom filter over a join key, expressed as pure column arithmetic:
k multiplicative hashes into an m-bit space, the set of occupied
positions aggregated into one broadcastable array. Used to prefilter a
large probe side before an exact join clears the false positives — the
sketch changes the PLAN (rows scanned/shuffled), never the ANSWER
(demonstrated by queries/joins.bloom_semi_join whose oracle is the
plain join).

Everything is deterministic integer math — no randomness, no UDFs —
so the same filter builds identically on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 1024
DEFAULT_HASHES: tuple[tuple[int, int], ...] = (
    (2654435761, 7),
    (40503, 131),
    (2246822519, 1031),
)


def _pos(key: Column, mult: int, add: int, m: int) -> Column:
    return (key * mult + add) % m


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    hashes: tuple[tuple[int, int], ...] = DEFAULT_HASHES,
) -> DataFrame:
    """Aggregate the build side into a 1-row frame ``(bset: array<long>)``
    of occupied bit positions. Broadcast it into probes."""
    return keys.select(
        F.explode(
            F.array(*[_pos(F.col(key_col), mu, a, m) for mu, a in hashes])
        ).alias("pos")
    ).agg(F.collect_set("pos").alias("bset"))


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    hashes: tuple[tuple[int, int], ...] = DEFAULT_HASHES,
) -> DataFrame:
    """Keep probe rows whose key MIGHT be in the build set (all k
    positions occupied). No false negatives; false positives must be
    cleared by a subsequent exact join."""
    out = probe.join(F.broadcast(bloom))
    for mu, a in hashes:
        out = out.filter(F.array_contains("bset", _pos(F.col(key_col), mu, a, m)))
    return out.drop("bset")


# ---------------------------------------------------------------------------
# Count-Min sketch — frequency estimation in d*w cells. Like the Bloom
# filter above, the sketch changes the PLAN, never the ANSWER: it
# prefilters a huge item stream down to heavy-hitter candidates (min
# estimate only ever OVER-counts, so no true heavy hitter is dropped)
# and an exact recount of the survivors clears the false positives.
# At 100 TB the cell aggregation map-side combines to <= d*w rows per
# task regardless of item cardinality, and the final groupBy shuffles
# only candidate occurrences instead of the full stream.
# ---------------------------------------------------------------------------

CMS_W = 1024
CMS_SEEDS: tuple[int, ...] = (17, 41, 97)


def _cms_cell(item: Column, seed: int, w: int) -> Column:
    return F.pmod(F.xxhash64(item, F.lit(seed)), F.lit(w))


def cms_build(
    items: DataFrame,
    item_col: str,
    w: int = CMS_W,
    seeds: tuple[int, ...] = CMS_SEEDS,
) -> DataFrame:
    """Aggregate an item stream into ``(d, cell, cnt)`` — at most
    ``len(seeds) * w`` rows, broadcastable."""
    cells = items.select(
        F.posexplode(
            F.array(*[_cms_cell(F.col(item_col), s, w) for s in seeds])
        ).alias("d", "cell")
    )
    return cells.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    probe: DataFrame,
    sketch: DataFrame,
    item_col: str,
    w: int = CMS_W,
    seeds: tuple[int, ...] = CMS_SEEDS,
) -> DataFrame:
    """Attach ``cms_est`` = min over rows of the sketch cell counts —
    an upper bound on the item's true frequency. Broadcast map-side
    joins; no shuffle of the probe side."""
    out = probe
    for i, s in enumerate(seeds):
        row = sketch.filter(F.col("d") == i).select(
            F.col("cell").alias(f"_cell_{i}"), F.col("cnt").alias(f"_cnt_{i}")
        )
        out = out.join(
            F.broadcast(row),
            _cms_cell(F.col(item_col), s, w) == F.col(f"_cell_{i}"),
            "left",
        ).drop(f"_cell_{i}")
    est = F.least(
        *[F.coalesce(F.col(f"_cnt_{i}"), F.lit(0)) for i in range(len(seeds))]
    )
    return out.withColumn("cms_est", est).drop(
        *[f"_cnt_{i}" for i in range(len(seeds))]
    )


# ---------------------------------------------------------------------------
# HyperLogLog (portable, cross-engine deterministic)
#
# Register math is kept exactly integer so Spark and a SQL oracle build
# bit-identical sketches: the 63-bit item hash comes from md5 (stable
# everywhere), the register rank derives from the LENGTH OF THE BINARY
# REPRESENTATION of the low bits (no floating log2), and the harmonic
# sum Σ 2^-rank is computed as an exact integer numerator over the
# common denominator 2^62 before ONE double division — the estimate is
# the same IEEE double on any partitioning and any engine. At 100 TB
# the register table is m rows per group — the mergeable,
# constant-size answer to COUNT(DISTINCT) over repeated slices.
# ---------------------------------------------------------------------------

HLL_B = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_ALPHA = 0.709  # standard alpha for m = 64
HLL_LOW_BITS = 63 - HLL_B  # 57 suffix bits carry the rank
_HLL_RMAX = 62  # common denominator exponent for the harmonic sum


def hll_hash64(item: Column) -> Column:
    """First 16 md5 hex chars → uniform 63-bit int (top hex digit
    masked to 0-7 keeps the value inside BIGINT on both engines)."""
    top = F.conv(F.substring(F.md5(item), 1, 1), 16, 10).cast("bigint") % 8
    low = F.conv(F.substring(F.md5(item), 2, 15), 16, 10).cast("bigint")
    return top * F.lit(1 << 60).cast("bigint") + low


def hll_register_rows(items, item_col: str, group_cols: list[str]):
    """(group_cols..., bucket, rank): max rank per (group, bucket).

    rank = leading-zero count of the HLL_LOW_BITS-bit suffix + 1 =
    HLL_LOW_BITS - bitlength(w) + 1 via binary-string length — exact
    integer arithmetic only (w = 0 → rank HLL_LOW_BITS + 1).
    """
    h = hll_hash64(F.col(item_col))
    bucket = (h % HLL_M).cast("int")
    w = F.floor(h / HLL_M).cast("bigint")
    bitlen = F.when(w > 0, F.length(F.conv(w, 10, 2))).otherwise(F.lit(0))
    rank = (F.lit(HLL_LOW_BITS) - bitlen + 1).cast("int")
    return (
        items.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(registers, group_cols: list[str]):
    """Raw HLL estimate per group from (bucket, rank) register rows.

    Missing buckets contribute rank 0. numerator = Σ 2^(RMAX - rank)
    summed as exact DECIMAL(38,0) (powers of two are exact doubles, so
    the cast loses nothing); estimate = α·m²·2^RMAX / numerator in one
    double division, rounded once.
    """
    term = F.pow(F.lit(2.0), F.lit(_HLL_RMAX) - F.col("rank")).cast(
        "decimal(38,0)"
    )
    missing = (F.lit(HLL_M) - F.count(F.lit(1))).cast("decimal(38,0)")
    num = F.sum(term) + missing * F.lit(float(1 << _HLL_RMAX)).cast(
        "decimal(38,0)"
    )
    return registers.groupBy(*group_cols).agg(
        F.round(
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            * F.lit(float(1 << _HLL_RMAX))
            / num.cast("double"),
            4,
        ).alias("hll_estimate")
    )
