#!/usr/bin/env python
"""Interleaved same-session A/B of apply_substring_batch: committed
(old) vs working-tree (new) implementation, alternating delta-batch
replays against two identically-bootstrapped state dirs, plus a
bit-identical snapshot check. Old code is materialized from git
(`git show HEAD:...`) into a scratch module.

Usage: python tools/ab_substring.py [--docs PATH] [--rounds 4]
       [--ref HEAD]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def load_old(ref: str):
    src = subprocess.check_output(
        ["git", "show", f"{ref}:codex_data_products_spark/streaming/substring_ivm.py"],
        text=True,
    )
    path = os.path.join(tempfile.mkdtemp(prefix="ab_substr_"), "old_substring_ivm.py")
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("old_substring_ivm", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=".stressdata/substr1.0/documents.parquet")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--removes", action="store_true",
                    help="also exercise a combined add+remove delta")
    args = ap.parse_args()

    from codex_data_products_spark.session import get_spark
    from codex_data_products_spark.streaming import substring_ivm as new

    old = load_old(args.ref)
    spark = get_spark(app_name="ab-substring")
    spark.range(1).count()
    docs = spark.read.parquet(args.docs)
    delta = docs.filter(F.col("doc_id") % 100 == 0).localCheckpoint()
    base = docs.filter(F.col("doc_id") % 100 != 0)
    rm = (
        delta.select("doc_id").filter(F.col("doc_id") % 300 == 0)
        if args.removes
        else None
    )

    scratch = tempfile.mkdtemp(prefix="ab_substr_state_")
    states = {}
    for tag, mod in (("old", old), ("new", new)):
        sd = os.path.join(scratch, tag)
        t0 = time.perf_counter()
        mod.bootstrap_substring_state(spark, sd)
        mod.apply_substring_batch(base, sd, 0)
        print(f"{tag} bootstrap: {time.perf_counter() - t0:.2f}s", flush=True)
        states[tag] = sd

    times: dict[str, list[float]] = {"old": [], "new": []}
    for r in range(args.rounds):
        for tag, mod in (("old", old), ("new", new)):
            sd = states[tag]
            t0 = time.perf_counter()
            mod.apply_substring_batch(delta, sd, 1, remove=rm)
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"round {r} {tag}: {dt:.2f}s", flush=True)

    for tag in ("old", "new"):
        ts = times[tag]
        print(f"{tag}: median={statistics.median(ts):.2f}s runs={[round(x,2) for x in ts]}")

    snaps = {
        tag: sorted(
            map(tuple, mod.substring_coverage_snapshot(spark, states[tag]).collect())
        )
        for tag, mod in (("old", old), ("new", new))
    }
    print("snapshot rows:", len(snaps["old"]), len(snaps["new"]),
          "identical:", snaps["old"] == snaps["new"])


if __name__ == "__main__":
    main()
