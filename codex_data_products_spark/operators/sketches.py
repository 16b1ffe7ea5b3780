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
