#!/usr/bin/env python
"""Interleaved A/B of the positional-gram key expression (round 11,
guide §1 + §2.3 "narrower types" / §4.1 "built-ins over work").

Old: g = unhex(md5(concat_ws(' ', slice(toks, i, k)))) — one ~100-byte
string allocation + an md5 per window position, 16-byte binary key.
New: g = xxhash64(slice(toks, i, k)) — hashes the token array directly
(no concat string, no md5), 8-byte long key. Equality-preserving on
whitespace-split tokens (tokens cannot contain the joiner, so the
concat was already injective; the array hash is injective by
construction up to 64-bit collisions).

Times the full dedup_substring computation (grams -> occ>=2 semi-join
-> coverage) under each key, alternating old/new within ONE session,
and verifies the final coverage outputs are identical (exceptAll both
ways). Also reports the distinct-gram count for the collision napkin.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def grams(docs, k, variant):
    from codex_data_products_spark.queries.dedup import _tokens
    from codex_data_products_spark.tables import spread

    toks = F.col("toks")
    if variant == "old":
        key = lambda i: F.unhex(  # noqa: E731
            F.md5(F.concat_ws(" ", F.slice(toks, i, k)))
        )
    else:
        key = lambda i: F.xxhash64(F.slice(toks, i, k))  # noqa: E731
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.struct(i.alias("pos"), key(i).alias("g")),
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


def coverage(docs, k, variant):
    from pyspark import StorageLevel

    from codex_data_products_spark.queries.dedup import (
        _coverage_per_doc,
        duplicated_positions,
    )

    pos = grams(docs, k, variant).persist(StorageLevel.MEMORY_AND_DISK)
    return _coverage_per_doc(duplicated_positions(pos)), pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=".stressdata/substr1.0/documents.parquet")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from codex_data_products_spark.queries.dedup import SUBSTR_K
    from codex_data_products_spark.session import get_spark

    spark = get_spark(app_name="ab-grams")
    spark.range(1).count()
    docs = spark.read.parquet(args.docs)
    docs.count()

    # equality first: identical coverage outputs under both keys
    cov_old, p1 = coverage(docs, SUBSTR_K, "old")
    cov_new, p2 = coverage(docs, SUBSTR_K, "new")
    d1 = cov_old.exceptAll(cov_new).count()
    d2 = cov_new.exceptAll(cov_old).count()
    print(f"equality: old\\new={d1} new\\old={d2}")
    n_old = p1.select("g").distinct().count()
    n_new = p2.select("g").distinct().count()
    print(f"distinct grams: old={n_old} new={n_new}")
    p1.unpersist()
    p2.unpersist()
    spark.catalog.clearCache()

    timings = {"old": [], "new": []}
    for r in range(args.rounds):
        for variant in ("old", "new"):
            spark.sparkContext.setJobDescription(f"grams-{variant}-r{r}")
            t0 = time.perf_counter()
            cov, pos = coverage(docs, SUBSTR_K, variant)
            cov.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            pos.unpersist()
            spark.catalog.clearCache()
            timings[variant].append(dt)
            print(f"round {r} {variant}: {dt}s", flush=True)
    import statistics

    for variant in ("old", "new"):
        med = statistics.median(timings[variant])
        print(f"{variant}: median={med}s runs={timings[variant]}")


if __name__ == "__main__":
    main()
