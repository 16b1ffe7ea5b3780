#!/usr/bin/env python
"""Dedup-IVM state-write accounting at the sf1.0 stress corpus.

VERDICT r8 #2's done criterion: after the round-9 log conversion, a
maintenance batch's STATE WRITE must be O(delta) for EVERY table —
signatures (``sim``), clusters (rows + remap), and pairs — not just the
pair log round 8 fixed. This tool bootstraps the cluster maintainer on
90% of the stress documents, applies a 10% add batch and then a small
removal batch, and reports per-batch bytes written into each log dir
against the cumulative state size, plus wall times and an
incremental==from-scratch row-count check.

Usage: python tools/dedup_ivm_stress.py [--sf-dir .stressdata/sf1.0]
Prints one JSON line; append to sweeps/ for the round artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _dir_bytes(path: str) -> int:
    total = 0
    for dp, _, fns in os.walk(path):
        for fn in fns:
            total += os.path.getsize(os.path.join(dp, fn))
    return total


def _log_breakdown(state: str) -> dict:
    """bytes per batch=/compact= dir for every log table under state."""
    out: dict = {}
    for name in sorted(os.listdir(state)):
        tdir = os.path.join(state, name)
        if not os.path.isdir(tdir):
            continue
        out[name] = {
            d: _dir_bytes(os.path.join(tdir, d))
            for d in sorted(os.listdir(tdir))
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".stressdata/sf1.0")
    ap.add_argument("--banding", default="2x16")
    ap.add_argument("--ann", action="store_true",
                    help="stress the ANN index maintainer instead "
                    "(posting + PQ code logs, write ratios per batch)")
    args = ap.parse_args()
    if args.ann:
        return run_ann(args)

    from pyspark.sql import functions as F

    from codex_data_products_spark.queries.dedup import (
        dedup_connected_components,
    )
    from codex_data_products_spark.session import get_spark
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        cluster_snapshot,
    )

    spark = get_spark(app_name="dedup-ivm-stress")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    state = os.path.join(tempfile.mkdtemp(prefix="dedup_ivm_stress_"), "s")
    bootstrap_cluster_state(spark, state)

    result: dict = {"mode": "dedup_ivm_state_writes", "n_docs": n_docs,
                    "banding": args.banding, "batches": []}

    def run_batch(label, batch_df, batch_id, remove=()):
        before = {
            name: _dir_bytes(os.path.join(state, name))
            for name in (os.listdir(state) if os.path.isdir(state) else [])
        }
        t0 = time.perf_counter()
        apply_cluster_batch(
            batch_df, state, batch_id, remove=list(remove),
            banding=args.banding,
        )
        wall = round(time.perf_counter() - t0, 1)
        after = {
            name: _dir_bytes(os.path.join(state, name))
            for name in os.listdir(state)
        }
        written = {
            name: after.get(name, 0) - before.get(name, 0)
            for name in sorted(after)
        }
        entry = {
            "label": label,
            "batch_id": batch_id,
            "wall_sec": wall,
            "bytes_written_by_table": written,
            "bytes_written_total": sum(written.values()),
            "state_bytes_total": sum(after.values()),
        }
        result["batches"].append(entry)
        print(f"  {label}: {wall}s, wrote "
              f"{entry['bytes_written_total']:,} of "
              f"{entry['state_bytes_total']:,} state bytes",
              file=sys.stderr)

    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    run_batch("bootstrap_90pct", base, 0)
    run_batch("add_10pct", delta, 1)
    removed_ids = [r["doc_id"] for r in delta.limit(50).collect()]
    run_batch("remove_50_docs", docs.limit(0), 2, remove=removed_ids)

    # the O(delta) claim in one ratio: the add batch's write volume over
    # the cumulative state size (a snapshot-rewriting maintainer is ~1.0)
    add = result["batches"][1]
    result["add_write_fraction_of_state"] = round(
        add["bytes_written_total"] / max(add["state_bytes_total"], 1), 4
    )

    # correctness: maintained view equals from-scratch CC over survivors
    surv = docs.filter(~F.col("doc_id").isin(removed_ids))
    d = tempfile.mkdtemp(prefix="dedup_ivm_scratch_")
    surv.coalesce(4).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    t0 = time.perf_counter()
    want = {
        (r["doc_id"], r["component_id"])
        for r in dedup_connected_components(spark, d).collect()
    }
    result["from_scratch_sec"] = round(time.perf_counter() - t0, 1)
    got = {
        (r["doc_id"], r["component_id"])
        for r in cluster_snapshot(spark, state).collect()
    }
    result["incremental_equals_from_scratch"] = got == want
    result["n_components_rows"] = len(got)
    result["log_breakdown"] = _log_breakdown(state)
    result["ok"] = bool(result["incremental_equals_from_scratch"])
    print(json.dumps(result))


def run_ann(args) -> None:
    """ANN IVM write-ratio stress: frozen quantizer + posting/code
    logs over the stress embeddings; the O(delta) claim measured the
    same way as the dedup maintainers'."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.session import get_spark
    from codex_data_products_spark.streaming.ann_ivm import (
        ann_postings_snapshot,
        apply_ann_batch,
        bootstrap_ann_state,
    )

    spark = get_spark(app_name="ann-ivm-stress")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_vecs = emb.count()
    state = os.path.join(tempfile.mkdtemp(prefix="ann_ivm_stress_"), "s")
    bootstrap_ann_state(spark, state, emb.filter(F.col("vec_id") % 10 != 0))

    result: dict = {"mode": "ann_ivm_state_writes", "n_vecs": n_vecs,
                    "batches": []}

    def run_batch(label, batch_id, adds=None, removes=None):
        before = {
            name: _dir_bytes(os.path.join(state, name))
            for name in (os.listdir(state) if os.path.isdir(state) else [])
        }
        t0 = time.perf_counter()
        apply_ann_batch(spark, state, batch_id, adds=adds, removes=removes)
        wall = round(time.perf_counter() - t0, 1)
        after = {
            name: _dir_bytes(os.path.join(state, name))
            for name in os.listdir(state)
        }
        written = {
            name: after.get(name, 0) - before.get(name, 0)
            for name in sorted(after)
        }
        entry = {
            "label": label,
            "batch_id": batch_id,
            "wall_sec": wall,
            "bytes_written_by_table": written,
            "bytes_written_total": sum(written.values()),
            "state_bytes_total": sum(after.values()),
        }
        result["batches"].append(entry)
        print(f"  {label}: {wall}s, wrote "
              f"{entry['bytes_written_total']:,} of "
              f"{entry['state_bytes_total']:,} state bytes",
              file=sys.stderr)

    base = emb.filter(F.col("vec_id") % 10 != 0).select("vec_id", "embedding")
    delta = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    run_batch("bootstrap_90pct", 0, adds=base)
    run_batch("add_10pct", 1, adds=delta)
    # collect the removal ids ONCE: limit() without an ordering is
    # non-deterministic across jobs, so the verified set must be built
    # from the very rows the tombstone batch saw
    removed_ids = {
        r["vec_id"] for r in delta.limit(50).select("vec_id").collect()
    }
    removed = spark.createDataFrame(
        [(v,) for v in sorted(removed_ids)], "vec_id long"
    )
    run_batch("remove_50_vecs", 2, removes=removed)

    add = result["batches"][1]
    result["add_write_fraction_of_state"] = round(
        add["bytes_written_total"] / max(add["state_bytes_total"], 1), 4
    )
    snap = {
        (r["vec_id"], r["cell"])
        for r in ann_postings_snapshot(spark, state).collect()
    }
    result["n_postings"] = len(snap)
    result["removed_absent"] = not (removed_ids & {v for v, _ in snap})
    result["count_matches"] = len(snap) == n_vecs - len(removed_ids)
    result["log_breakdown"] = _log_breakdown(state)
    result["ok"] = bool(result["removed_absent"] and result["count_matches"])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
