#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "runs": [...], "steal_pct": ..., "load_avg_start": ...}

Protocol (round-6 fix for cross-round comparability): each suite runs
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) in one session; the
headline ``value`` is the sum of PER-QUERY MEDIANS across runs, so a
single hypervisor-steal spike can no longer masquerade as a plan
regression. Host contention is measured, not guessed: timing waits
(bounded by ``$SPARK_GRAFT_LOAD_WAIT_SEC``) for the 1-minute load to
drop below ``$SPARK_GRAFT_LOAD_GATE`` (r7's headline regression was a
load_avg-5 host), /proc/stat is sampled before and after, and
``steal_pct`` + the starting load average + the wait are recorded in
the JSON for the round artifact.

Three suites in one JSON line: the headline queries at sf0.1, the same
at sf0.5 (plan-level differences the per-query constant hides at
sf0.1), and the SKEW suite — the 8 audited residual-join queries plus
the dedup/graph heavies at sf1.0 stress data with bot keys, where
per-key probe amplification actually shows (VERDICT r7 #5).

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


# The SKEW suite (VERDICT r7 #5): the scd2 (r6) and attribution (r7)
# per-key probe-amplification quadratics were invisible at every bench
# SF and found only by ad-hoc sf1.0 audits — because the amplification
# lives on the stress generator's BOT KEYS (two users owning ~4% of 1M
# events in single-day bursts), which the driver testdata doesn't have.
# This suite runs the 8 audited residual-join queries plus the dedup/
# graph heavies against the sf1.0 stress data (generated on first use,
# deterministic seed) under the same N-median protocol, so the next
# probe-amplification regression shows up in BENCH_r{N}.json instead of
# a manual audit.
SKEW = [
    "events_attribution",
    "scd2_asof_lookup",
    "asof_join",
    "band_join_buckets",
    "join_range",
    "events_trend_test",
    "market_basket_pairs",
    "market_basket_rules",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_wide",
    "dedup_simhash_wide_summary",
    "dedup_connected_components",
    "dedup_keep_best",
    "graph_pagerank",
    "graph_triangles",
    "events_ewma",
    "sessionize",
    # r9: popular-image multiplicity stress — the stress documents give
    # ~91 distinct aHash signatures x ~550 images each at sf1.0, so this
    # guards the distinct-signature grain + cross_pairs arithmetic (and
    # the per-band equi-join shape) under a band-key hot spot
    "multimodal_ahash_neardup",
]

# The SUBSTRING suite (VERDICT r8 #8): the substring family's scale
# claim is its aggregate shape — a gram shared by 50% of the corpus is
# ONE count row, where any pairwise family sees ~n^2/8 candidate pairs.
# Proven where the pair families are proven: a documents-only corpus
# with a fixed 16-token boilerplate sentence in half the docs
# (tools/gen_stress.py --boilerplate), kept separate from the skew dir
# so the skew suite's bytes stay round-over-round comparable.
# dedup_minhash_lsh rides along as the pair-family comparator — its
# stop-shingle DF cap is what keeps IT finite on this corpus.
SUBSTR = [
    "dedup_substring",
    "dedup_substring_summary",
    "dedup_substring_incremental",
    "dedup_minhash_lsh",
]


def _ensure_stress_dir(
    sf: float, path: str, generator: str = "generate"
) -> bool:
    """Generate the stress parquet on first use (deterministic seed —
    every round benches the same bytes). Returns False if generation
    isn't possible (read-only checkout)."""
    if os.path.isdir(path):
        return True
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "gen_stress",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "gen_stress.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        print(f"  generating stress data sf={sf} -> {path}", file=sys.stderr)
        getattr(mod, generator)(sf, path)
        return True
    except Exception as exc:  # pragma: no cover - env-dependent
        print(f"  stress generation failed: {exc}", file=sys.stderr)
        return False


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

    # Load precondition (VERDICT r7 #6): r7's headline moved 37.4->43.7s
    # with load_avg 5.12 at bench start — a contended host, not a plan
    # regression. Don't time into contention: wait (bounded) for the
    # 1-minute load to drop below the gate, and record how long we
    # waited so the round artifact shows whether the precondition held.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "3.0"))
    load_wait_cap = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "180"))
    waited = 0
    while os.getloadavg()[0] > load_gate and waited < load_wait_cap:
        time.sleep(10)
        waited += 10
    load_start = round(os.getloadavg()[0], 2)
    stat_start = read_proc_stat()

    def run_suite(
        names: list[str], data_dir: str, label: str, discard_first: bool = False
    ) -> dict:
        per_run: list[dict[str, float]] = []
        warmup_sec = None
        if discard_first:
            # Root-caused in round 8 (SCALE.md): on an idle host the
            # suite's runs converge 55.4 -> 45.9 -> 39.9 -> 38.0 ->
            # 38.3 s — the first two runs pay per-plan JIT/codegen
            # warm-up (each query's generated classes compile on first
            # execution; C2 keeps optimizing through run 2), NOT plan
            # cost. One discarded pass moves the timed runs onto the
            # steady state; its total is recorded so the artifact shows
            # what was discarded. Generated code is cached by source
            # text, so one pass also warms the later suites' shared
            # plans.
            t0 = time.perf_counter()
            for name in names:
                registry.QUERIES[name](spark, data_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                spark.catalog.clearCache()
            warmup_sec = round(time.perf_counter() - t0, 3)
            print(f"  {label} warm-up (discarded): {warmup_sec:.1f}s",
                  file=sys.stderr)
        for run in range(n_runs):
            timings: dict[str, float] = {}
            for name in names:
                fn = registry.QUERIES[name]
                t0 = time.perf_counter()
                fn(spark, data_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.perf_counter() - t0, 3)
                # queries that persist intermediates (dedup family)
                # would otherwise accumulate cache across the run
                spark.catalog.clearCache()
            total = round(sum(timings.values()), 3)
            print(
                f"  {label} run {run + 1}/{n_runs}: {total:.1f}s",
                file=sys.stderr,
            )
            per_run.append(timings)
        run_totals = [round(sum(t.values()), 3) for t in per_run]
        med = {
            name: round(statistics.median(t[name] for t in per_run), 3)
            for name in names
        }
        out = {
            "queries": med,
            "value": round(sum(med.values()), 3),
            "runs": run_totals,
            "median_run_sec": round(statistics.median(run_totals), 3),
        }
        if warmup_sec is not None:
            out["warmup_discarded_sec"] = warmup_sec
        return out

    head = run_suite(HEADLINE, sf_dir, f"sf{sf}", discard_first=True)
    # Self-describing parallelism (VERDICT r11 #2): the session honors
    # $SPARK_GRAFT_CPUS (session.py builds local[{cpus}]), but the JSON
    # never SAID so, which made the driver's low/high-core scaling block
    # unable to distinguish "ignored the env var" from "overhead-bound at
    # this SF". Echo the effective master/parallelism so the artifact
    # proves what it ran on.
    eff_master = spark.sparkContext.master
    eff_parallelism = spark.sparkContext.defaultParallelism
    eff_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    result = {
        "metric": "headline_queries_total_sec",
        "value": head["value"],
        "unit": "sec",
        "queries": head["queries"],
        "sf": sf,
        "runs": head["runs"],
        "median_run_sec": head["median_run_sec"],
        "warmup_discarded_sec": head.get("warmup_discarded_sec"),
        "load_avg_start": load_start,
        "load_wait_sec": waited,
        "master": eff_master,
        "defaultParallelism": eff_parallelism,
        "shuffle_partitions": eff_shuffle,
    }

    # Second suite at sf0.5 (VERDICT r6 #6): the ~0.3-0.7 s per-query
    # constant dominates sf0.1 timings, hiding plan-level differences —
    # the 5x SF makes them visible. Same queries, same N-run median
    # protocol, reported under "sf0.5" in the SAME JSON line.
    sf05_dir = os.environ.get("SPARK_GRAFT_SF05_DIR", ".stressdata/sf0.5")
    if sf_dir.rstrip("/") != sf05_dir.rstrip("/") and _ensure_stress_dir(
        0.5, sf05_dir
    ):
        result["sf0.5"] = run_suite(HEADLINE, sf05_dir, "sf0.5")
    else:
        result["sf0.5"] = "skipped: generate with tools/gen_stress.py --sf 0.5"

    # Third suite: the skew-stress queries at sf1.0 (VERDICT r7 #5) —
    # bot-key probe amplification only exists on the stress generator's
    # data, so this is where a residual-join regression surfaces.
    skew_dir = os.environ.get("SPARK_GRAFT_SKEW_DIR", ".stressdata/sf1.0")
    skew_runs = int(os.environ.get("SPARK_GRAFT_SKEW_RUNS", str(n_runs)))
    if skew_runs <= 0:
        result["skew_sf1.0"] = "skipped: SPARK_GRAFT_SKEW_RUNS=0"
    elif _ensure_stress_dir(1.0, skew_dir):
        saved, n_runs = n_runs, skew_runs
        result["skew_sf1.0"] = run_suite(SKEW, skew_dir, "skew")
        n_runs = saved
    else:
        result["skew_sf1.0"] = "skipped: generate with tools/gen_stress.py --sf 1.0"

    # Fourth suite: the repeated-boilerplate substring stress (VERDICT
    # r8 #8) — documents-only corpus, one gram in 50% of docs.
    substr_dir = os.environ.get(
        "SPARK_GRAFT_SUBSTR_DIR", ".stressdata/substr1.0"
    )
    substr_runs = int(os.environ.get("SPARK_GRAFT_SUBSTR_RUNS", str(n_runs)))
    if substr_runs <= 0:
        result["substr_sf1.0"] = "skipped: SPARK_GRAFT_SUBSTR_RUNS=0"
    elif _ensure_stress_dir(1.0, substr_dir, generator="generate_boilerplate"):
        saved, n_runs = n_runs, substr_runs
        result["substr_sf1.0"] = run_suite(SUBSTR, substr_dir, "substr")
        n_runs = saved
    else:
        result["substr_sf1.0"] = (
            "skipped: generate with tools/gen_stress.py --boilerplate"
        )

    # Fifth block (VERDICT r9 #5/#6): maintained-index steady state —
    # numbers the index owner cares about, measured over LIVE multi-
    # batch state instead of the registry's full-replay queries.
    #   ann_search_auto_sec: search_ann(nprobe="auto") latency over an
    #     index built as bootstrap-train + 3 add batches + 1 removal
    #     batch at sf1.0 (median of n_runs; scan fraction + chosen
    #     nprobe recorded alongside).
    #   substr_delta_batch_sec: apply_substring_batch of a 1% delta
    #     against 99%-of-corpus sf1.0 state (the same crashed-batch
    #     replay each run — idempotent overwrite of its own dirs), vs
    #     the one-off bootstrap cost. The O(delta) claim as bench rows.
    maint_runs = int(os.environ.get("SPARK_GRAFT_MAINT_RUNS", str(n_runs)))
    if maint_runs <= 0:
        result["maintained_sf1.0"] = "skipped: SPARK_GRAFT_MAINT_RUNS=0"
    elif os.path.isdir(skew_dir) and os.path.isdir(substr_dir):
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from codex_data_products_spark.streaming.ann_ivm import (
            apply_ann_batch,
            bootstrap_ann_state,
            maintained_cell_balance,
            search_ann,
        )
        from codex_data_products_spark.streaming.substring_ivm import (
            apply_substring_batch,
            bootstrap_substring_state,
        )

        maint: dict = {}
        scratch = tempfile.mkdtemp(prefix="bench_maint_")
        try:
            emb = spark.read.parquet(f"{skew_dir}/embeddings.parquet")
            ann_state = os.path.join(scratch, "ann")
            t0 = time.perf_counter()
            bootstrap_ann_state(
                spark, ann_state, emb.filter(F.col("vec_id") % 3 == 0)
            )
            for k in range(3):
                apply_ann_batch(
                    spark,
                    ann_state,
                    k,
                    adds=emb.filter(F.col("vec_id") % 3 == k).select(
                        "vec_id", "embedding"
                    ),
                )
            apply_ann_batch(
                spark,
                ann_state,
                3,
                removes=emb.filter(F.col("vec_id") % 7 == 3).select(
                    "vec_id"
                ),
            )
            maint["ann_build_sec"] = round(time.perf_counter() - t0, 3)
            queries_df = (
                emb.filter(F.col("vec_id") % 50 == 0)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("qv"),
                )
                .localCheckpoint()
            )
            maint["ann_n_queries"] = queries_df.count()
            n_cells, esf = maintained_cell_balance(spark, ann_state)
            maint["ann_n_cells"] = n_cells
            maint["ann_expected_scan_frac"] = round(esf, 4)
            search_secs = []
            for _ in range(maint_runs):
                t0 = time.perf_counter()
                search_ann(
                    spark, ann_state, queries_df, top_k=5, nprobe="auto"
                ).write.format("noop").mode("overwrite").save()
                search_secs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            maint["ann_search_auto_sec"] = round(
                statistics.median(search_secs), 3
            )
            maint["ann_search_runs"] = search_secs

            docs = spark.read.parquet(f"{substr_dir}/documents.parquet")
            sub_state = os.path.join(scratch, "substr")
            bootstrap_substring_state(spark, sub_state)
            t0 = time.perf_counter()
            apply_substring_batch(
                docs.filter(F.col("doc_id") % 100 != 0), sub_state, 0
            )
            maint["substr_bootstrap_sec"] = round(
                time.perf_counter() - t0, 3
            )
            delta = docs.filter(F.col("doc_id") % 100 == 0)
            maint["substr_delta_fraction"] = 0.01
            delta_secs = []
            for _ in range(maint_runs):
                t0 = time.perf_counter()
                apply_substring_batch(delta, sub_state, 1)
                delta_secs.append(round(time.perf_counter() - t0, 3))
            maint["substr_delta_batch_sec"] = round(
                statistics.median(delta_secs), 3
            )
            maint["substr_delta_runs"] = delta_secs
            result["maintained_sf1.0"] = maint
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    else:
        result["maintained_sf1.0"] = "skipped: stress dirs absent"

    stat_end = read_proc_stat()
    steal_pct = None
    if stat_start and stat_end and stat_end[1] > stat_start[1]:
        steal_pct = round(
            100.0
            * (stat_end[0] - stat_start[0])
            / (stat_end[1] - stat_start[1]),
            2,
        )
    result["steal_pct"] = steal_pct

    # Compact per-suite summary as the LAST keys of the JSON line: the
    # driver's artifact capture keeps a bounded tail of stdout, and in
    # round 8 the sf0.1 headline block was truncated out of
    # BENCH_r08.json because it led the line. Whatever the tail bound,
    # these few hundred bytes always survive (VERDICT r8 #6).
    def _suite_sec(entry):
        return entry["value"] if isinstance(entry, dict) else entry

    result["summary"] = {
        "headline_sec": head["value"],
        "headline_median_run_sec": head["median_run_sec"],
        "headline_runs": head["runs"],
        "sf0.5_sec": _suite_sec(result["sf0.5"]),
        "skew_sf1.0_sec": _suite_sec(result["skew_sf1.0"]),
        "substr_sf1.0_sec": _suite_sec(result["substr_sf1.0"]),
        "maintained_sf1.0": (
            {
                k: result["maintained_sf1.0"][k]
                for k in (
                    "ann_search_auto_sec",
                    "ann_expected_scan_frac",
                    "substr_bootstrap_sec",
                    "substr_delta_batch_sec",
                )
            }
            if isinstance(result["maintained_sf1.0"], dict)
            else result["maintained_sf1.0"]
        ),
        "sf": sf,
        "load_avg_start": load_start,
        "steal_pct": steal_pct,
        "master": eff_master,
        "defaultParallelism": eff_parallelism,
        "shuffle_partitions": eff_shuffle,
    }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
