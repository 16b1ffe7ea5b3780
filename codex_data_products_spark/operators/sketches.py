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
