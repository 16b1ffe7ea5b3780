#!/usr/bin/env python
"""Interleaved same-session A/B of the simhash candidate generators
(round-11 measurement aid, guide §1): OLD doc-grain per-band self-joins
vs NEW signature-grain first-match generation + doc expansion
(``_banded_sig_candidates``). Also proves pair-set equality with
exceptAll both ways.

Usage: python tools/ab_simhash.py [--data .stressdata/sf1.0] [--runs 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def old_wide_pairs(sim: DataFrame, with_sig: bool = False) -> DataFrame:
    from codex_data_products_spark.queries.dedup import _WIDE_BANDS

    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")

    def band(side, i):
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


def old_narrow_pairs(sim: DataFrame) -> DataFrame:
    hi = lambda s: F.shiftrightunsigned(F.col(f"{s}.simhash"), 16)  # noqa: E731
    lo = lambda s: F.col(f"{s}.simhash") % 65536  # noqa: E731
    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    cols = [
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        hamming.alias("hamming"),
    ]
    from codex_data_products_spark.queries.dedup import SIMHASH_MAX_HAMMING

    band0 = a.join(b, (hi("a") == hi("b")) & lt)
    band1 = a.join(b, (lo("a") == lo("b")) & (hi("a") != hi("b")) & lt)
    outs = [
        p.filter(hamming <= SIMHASH_MAX_HAMMING).select(*cols)
        for p in (band0, band1)
    ]
    return outs[0].unionByName(outs[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".stressdata/sf1.0")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from codex_data_products_spark.queries.dedup import (
        SIMHASH_MAX_HAMMING,
        _banded_sig_candidates,
        simhash_frame,
    )
    from codex_data_products_spark.session import get_spark

    spark = get_spark(app_name="ab-simhash")
    spark.range(1).count()
    docs = spark.read.parquet(f"{args.data}/documents.parquet")

    def new_wide(sim):
        from codex_data_products_spark.queries.dedup import (
            _wide_candidate_pairs,
        )

        pairs = _wide_candidate_pairs(sim, with_sig=True)
        hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast(
            "long"
        )
        return pairs.filter(hamming <= SIMHASH_MAX_HAMMING).select(
            "doc_a", "doc_b", hamming.alias("hamming")
        )

    def old_wide(sim):
        pairs = old_wide_pairs(sim, with_sig=True)
        hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast(
            "long"
        )
        return pairs.filter(hamming <= SIMHASH_MAX_HAMMING).select(
            "doc_a", "doc_b", hamming.alias("hamming")
        )

    def new_narrow(sim):
        pairs = _banded_sig_candidates(
            sim,
            [lambda c: F.shiftrightunsigned(c, 16), lambda c: c % 65536],
            with_sig=True,
        )
        hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast(
            "long"
        )
        return pairs.filter(hamming <= SIMHASH_MAX_HAMMING).select(
            "doc_a", "doc_b", hamming.alias("hamming")
        )

    # equivalence proof once (on persisted signatures)
    sim = simhash_frame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sim.count()
    for label, old_fn, new_fn in (
        ("wide", old_wide, new_wide),
        ("narrow", old_narrow_pairs, new_narrow),
    ):
        o, n = old_fn(sim), new_fn(sim)
        d1 = o.exceptAll(n).count()
        d2 = n.exceptAll(o).count()
        print(f"{label}: old\\new={d1} new\\old={d2} "
              f"{'BIT-IDENTICAL SET' if d1 == d2 == 0 else 'MISMATCH!'}")

    # interleaved timing (signatures persisted once; generation timed)
    results: dict[str, list[float]] = {}
    variants = [
        ("old_wide", old_wide),
        ("new_wide", new_wide),
        ("old_narrow", old_narrow_pairs),
        ("new_narrow", new_narrow),
    ]
    for r in range(args.runs):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn(sim).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            results.setdefault(name, []).append(dt)
    for name, ts in results.items():
        print(f"{name}: median={statistics.median(ts):.3f}s runs={ts}")


if __name__ == "__main__":
    main()
