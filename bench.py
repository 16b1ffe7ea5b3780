#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
output IO), after a warm-up pass of the session on a trivial action.
"""

from __future__ import annotations

import json
import os
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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
        # queries that persist intermediates (dedup family) would
        # otherwise accumulate cache across the run
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
