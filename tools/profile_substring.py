#!/usr/bin/env python
"""Per-phase wall-clock profile of the substring IVM batch path
(round-11 measurement aid, guide §1).

``apply_substring_batch`` is a chain of sequential actions; the bench
prices the whole chain as one number. This tool replays the SAME
protocol as ``dedup_substring_incremental`` (bootstrap + 3 modulo
batches + snapshot) against a documents parquet, timing each action
boundary, so the next optimization targets the measured phase instead
of a guess. It is a PROFILING TWIN: the phase structure mirrors
``streaming/substring_ivm.py`` — if that function changes shape,
re-derive this file from it.

Usage:
  python tools/profile_substring.py [--docs .stressdata/substr1.0/documents.parquet]
                                    [--delta-mode modulo3|delta1pct]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def profile_batch(spark, batch_docs, state_dir, batch_id, label):
    from codex_data_products_spark.queries.dedup import (
        _coverage_per_doc,
        positional_grams,
    )
    from codex_data_products_spark.streaming.dedup_ivm import (
        _empty,
        _remove_frame,
    )
    from codex_data_products_spark.streaming.substring_ivm import (
        _GRAMS_SCHEMA,
        _REMOVED_SCHEMA,
        _bucket_set,
        _occ_bucket,
        _prior_grams,
        occ_log_slice,
    )

    t = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        return out

    rem_df, has_removes = _remove_frame(spark, None)
    old_grams = _prior_grams(spark, state_dir, batch_id)

    delta = positional_grams(batch_docs).persist()
    clock(
        "1_grams_write",
        lambda: delta.write.mode("overwrite").parquet(
            f"{state_dir}/grams/batch={batch_id}"
        ),
    )
    clock(
        "2_rem_write",
        lambda: rem_df.coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{state_dir}/grams_removed/batch={batch_id}"),
    )

    delta_occ = delta.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    net_occ = delta_occ.withColumnRenamed("d", "net").persist()
    # mirrors the production gate (round 11 s3): bulk deltas skip the
    # bucket-set collect outright
    from codex_data_products_spark.streaming.substring_ivm import (
        _PRUNE_COLLECT_MAX_ROWS,
    )

    cand_buckets = clock(
        "3_bucket_set",
        lambda: (
            _bucket_set(net_occ)
            if delta.count() <= _PRUNE_COLLECT_MAX_ROWS
            else None
        ),
    )
    occ_old_cand = (
        occ_log_slice(spark, state_dir, batch_id - 1, buckets=cand_buckets)
        .join(net_occ.select("g"), "g", "left_semi")
        .groupBy("g")
        .agg(F.sum("occ").cast("long").alias("occ_old"))
        .persist()
    )
    changed = (
        net_occ.join(occ_old_cand, "g", "left")
        .select(
            "g",
            F.coalesce(F.col("occ_old"), F.lit(0)).alias("o"),
            (F.coalesce(F.col("occ_old"), F.lit(0)) + F.col("net")).alias(
                "n2"
            ),
        )
        .filter(
            ((F.col("o") >= 2) != (F.col("n2") >= 2)) & (F.col("o") >= 1)
        )
        .select("g")
    )
    changed = clock("4_changed_ckpt", lambda: changed.localCheckpoint())
    has_changed = not clock("5_changed_isempty", lambda: changed.isEmpty())

    if has_changed:
        affected = (
            old_grams.join(F.broadcast(changed), "g", "left_semi")
            .join(F.broadcast(rem_df), "doc_id", "left_anti")
            .select("doc_id")
            .distinct()
            .persist()
        )
        old_r_pos = old_grams.join(
            F.broadcast(affected), "doc_id", "left_semi"
        ).persist()
        aff_grams = old_r_pos.select("g").distinct()
        aff_buckets = clock("6_aff_bucket_set", lambda: _bucket_set(aff_grams))
        occ_old_aff = (
            occ_log_slice(spark, state_dir, batch_id - 1, buckets=aff_buckets)
            .join(F.broadcast(aff_grams), "g", "left_semi")
            .groupBy("g")
            .agg(F.sum("occ").cast("long").alias("occ_old"))
        )
        occ_old_r = occ_old_cand.unionByName(occ_old_aff).groupBy("g").agg(
            F.max("occ_old").alias("_o")
        )
        occ_old_r = clock("7_occ_old_r_ckpt", lambda: occ_old_r.localCheckpoint())
    else:
        affected = _empty(spark, _REMOVED_SCHEMA)
        occ_old_r = occ_old_cand.select("g", F.col("occ_old").alias("_o"))
        old_r_pos = _empty(spark, _GRAMS_SCHEMA)
    r_pos = old_r_pos.unionByName(delta)
    dup_r = (
        occ_old_r.join(net_occ, "g", "full_outer")
        .select(
            "g",
            (
                F.coalesce(F.col("_o"), F.lit(0))
                + F.coalesce(F.col("net"), F.lit(0))
            ).alias("occ_new"),
        )
        .filter(F.col("occ_new") >= 2)
        .select("g")
    )
    cov_rows = _coverage_per_doc(
        r_pos.join(F.broadcast(dup_r), "g", "left_semi")
    )

    clock(
        "8_occ_write",
        lambda: net_occ.filter(F.col("net") != 0)
        .select("g", F.col("net").alias("occ"), _occ_bucket(F.col("g")).alias("b"))
        .repartition("b")
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(f"{state_dir}/occ_delta/batch={batch_id}"),
    )
    clock(
        "9_cov_write",
        lambda: cov_rows.write.mode("overwrite").parquet(
            f"{state_dir}/coverage/batch={batch_id + 1}"
        ),
    )
    clock(
        "10_tomb_write",
        lambda: affected.unionByName(rem_df)
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{state_dir}/coverage_removed/batch={batch_id + 1}"),
    )
    for frame in (delta, net_occ, occ_old_cand, affected, changed, rem_df,
                  old_r_pos, occ_old_r):
        frame.unpersist()
    total = round(sum(t.values()), 3)
    print(f"[{label}] total(clocked)={total}s  " + "  ".join(
        f"{k}={v}" for k, v in t.items()
    ))
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--docs", default=".stressdata/substr1.0/documents.parquet"
    )
    ap.add_argument(
        "--delta-mode", default="modulo3", choices=["modulo3", "delta1pct"]
    )
    args = ap.parse_args()

    import shutil
    import tempfile

    from codex_data_products_spark.session import get_spark
    from codex_data_products_spark.streaming.substring_ivm import (
        bootstrap_substring_state,
        substring_coverage_snapshot,
    )

    spark = get_spark(app_name="profile-substring")
    spark.range(1).count()
    docs = spark.read.parquet(args.docs)
    scratch = tempfile.mkdtemp(prefix="prof_substr_")
    state = f"{scratch}/state"
    try:
        t0 = time.perf_counter()
        bootstrap_substring_state(spark, state)
        print(f"bootstrap: {time.perf_counter() - t0:.3f}s")
        if args.delta_mode == "modulo3":
            for k in range(3):
                tb = time.perf_counter()
                profile_batch(
                    spark,
                    docs.filter(F.col("doc_id") % 3 == k),
                    state,
                    k,
                    f"batch{k}",
                )
                print(f"batch{k} wall={time.perf_counter() - tb:.3f}s")
        else:
            tb = time.perf_counter()
            profile_batch(
                spark, docs.filter(F.col("doc_id") % 100 != 0), state, 0,
                "bootstrap99",
            )
            print(f"bootstrap99 wall={time.perf_counter() - tb:.3f}s")
            for r in range(3):
                tb = time.perf_counter()
                profile_batch(
                    spark,
                    docs.filter(F.col("doc_id") % 100 == 0),
                    state,
                    1,
                    f"delta1pct_run{r}",
                )
                print(f"delta wall={time.perf_counter() - tb:.3f}s")
        t0 = time.perf_counter()
        n = substring_coverage_snapshot(spark, state).count()
        print(f"snapshot count={n}: {time.perf_counter() - t0:.3f}s")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
