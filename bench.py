#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "runs": [...], "steal_pct": ..., "load_avg_start": ...}

Protocol (round-6 fix for cross-round comparability): the suite runs
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) in one session; the
headline ``value`` is the MEDIAN run total and per-query timings are
per-query medians, so a single hypervisor-steal spike can no longer
masquerade as a plan regression. Host contention is measured, not
guessed: /proc/stat is sampled before and after, and ``steal_pct``
(stolen cycles as a share of all cycles during the bench) plus the
starting load average are recorded in the JSON for the round artifact.

Each query is forced end-to-end with the noop sink (full computation, no
output IO), after a warm-up pass of the session on a trivial action.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from codex_data_products_spark import registry
from codex_data_products_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q8_market_share",
    "q18_large_volume",
    "q21_waiting_supplier",
    "pack_sequences",
    "curation_summary",
    "graph_pagerank",
    "events_retention",
    "knn_ivf_multiprobe",
    "join_range",
    "window_rank",
    "window_running_sum",
    "window_range_frame",
    "sessionize",
    "events_tumbling_window",
    "events_gapfill",
    "window_distribution",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "knn_brute_force",
    "knn_ivf",
    "knn_lsh",
    "text_quality",
    "text_pretokenize",
    "text_fingerprint",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "pivot_event_values",
    "asof_join",
    "q16_supplier_part_count",
    "q20_excess_stock",
    "split_contamination",
    "vocab_top_terms",
    "heavy_hitters_cms",
    "fuzzy_join_symdel",
    "merge_upsert",
    "agg_correlation",
    "events_concurrency",
    "events_ewma",
    "agg_mad",
    "table_diff",
    "events_rolling_wau",
    "embedding_norms_pandas",
    "events_user_gaps",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    registry.load_all()
    spark = get_spark(app_name="codex-data-products-bench")
    # Warm up the JVM, codegen, and parquet reader paths once so the
    # first timed query doesn't absorb session start-up costs. The
    # warm-up exercises the *machinery* (whole-stage codegen, hash agg,
    # broadcast exchange, window, sort) on synthetic data — never the
    # measured tables.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm = spark.range(100_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    dim = spark.range(7).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    (
        warm.join(F.broadcast(dim), "k")
        .groupBy("k", "tag")
        .agg(F.sum(F.col("v").cast("decimal(12,2)")).alias("s"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("tag").orderBy("s")))
        .orderBy("rn")
        .write.format("noop").mode("overwrite").save()
    )
    # ... and the Arrow/Python worker pool (one worker per core forks on
    # first use; without this the first pandas-UDF query absorbs it)
    def _noop_batches(batches):
        yield from batches

    (
        spark.range(1_000)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    def read_proc_stat() -> tuple[int, int] | None:
        """(steal_ticks, total_ticks) from the aggregate cpu line."""
        try:
            with open("/proc/stat") as fh:
                fields = fh.readline().split()
        except OSError:
            return None
        if not fields or fields[0] != "cpu":
            return None
        vals = [int(x) for x in fields[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    load_start = round(os.getloadavg()[0], 2)
    stat_start = read_proc_stat()

    per_run: list[dict[str, float]] = []
    for run in range(n_runs):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # queries that persist intermediates (dedup family) would
            # otherwise accumulate cache across the run
            spark.catalog.clearCache()
        total = round(sum(timings.values()), 3)
        print(f"  run {run + 1}/{n_runs}: {total:.1f}s", file=sys.stderr)
        per_run.append(timings)

    stat_end = read_proc_stat()
    steal_pct = None
    if stat_start and stat_end and stat_end[1] > stat_start[1]:
        steal_pct = round(
            100.0
            * (stat_end[0] - stat_start[0])
            / (stat_end[1] - stat_start[1]),
            2,
        )

    run_totals = [round(sum(t.values()), 3) for t in per_run]
    median_queries = {
        name: round(statistics.median(t[name] for t in per_run), 3)
        for name in HEADLINE
    }
    median_total = round(sum(median_queries.values()), 3)
    result = {
        "metric": "headline_queries_total_sec",
        "value": median_total,
        "unit": "sec",
        "queries": median_queries,
        "sf": sf,
        "runs": run_totals,
        "median_run_sec": round(statistics.median(run_totals), 3),
        "steal_pct": steal_pct,
        "load_avg_start": load_start,
    }

    # Second suite at sf0.5 (VERDICT r6 #6): the ~0.3-0.7 s per-query
    # constant dominates sf0.1 timings, hiding plan-level differences —
    # the 5x SF makes them visible. Same queries, same N-run median
    # protocol, reported under "sf0.5" in the SAME JSON line. Skipped
    # (with a marker) when the stress directory hasn't been generated.
    sf05_dir = os.environ.get("SPARK_GRAFT_SF05_DIR", ".stressdata/sf0.5")
    if os.path.isdir(sf05_dir) and sf_dir.rstrip("/") != sf05_dir.rstrip("/"):
        per_run05: list[dict[str, float]] = []
        for run in range(n_runs):
            timings = {}
            for name in HEADLINE:
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, sf05_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
            total = round(sum(timings.values()), 3)
            print(f"  sf0.5 run {run + 1}/{n_runs}: {total:.1f}s", file=sys.stderr)
            per_run05.append(timings)
        totals05 = [round(sum(t.values()), 3) for t in per_run05]
        med05 = {
            name: round(statistics.median(t[name] for t in per_run05), 3)
            for name in HEADLINE
        }
        result["sf0.5"] = {
            "queries": med05,
            "value": round(sum(med05.values()), 3),
            "runs": totals05,
            "median_run_sec": round(statistics.median(totals05), 3),
        }
    else:
        result["sf0.5"] = "skipped: generate with tools/gen_stress.py --sf 0.5"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
