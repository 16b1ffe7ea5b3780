#!/usr/bin/env python
"""Per-query fixed-overhead dissection (VERDICT r11 #6): for each named
headline query at sf0.1, split wall-clock into
  build   — Python DataFrame construction (py4j plan assembly)
  plan    — analysis + optimization + physical planning (executedPlan)
  exec    — the noop write (job submission + AQE stages + compute)
and count the AQE shuffle-exchange barriers in the final plan. Run on a
QUIET box; 3 warm repetitions per query, medians printed.

Usage: python tools/profile_overhead.py [sf_dir] [query ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from codex_data_products_spark import registry
from codex_data_products_spark.session import get_spark

DEFAULT = [
    "window_rank",          # cheapest row — pure overhead probe
    "text_fingerprint",
    "dedup_exact",
    "q1_pricing_summary",
    "graph_pagerank",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_ivf_multiprobe",
    "q16_supplier_part_count",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    registry.load_all()
    spark = get_spark(app_name="profile-overhead")
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    sc = spark.sparkContext

    print(f"{'query':30s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s} {'exch':>5s}")
    for name in names:
        fn = registry.QUERIES[name]
        # one discarded warm-up per query (codegen/JIT)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        builds, plans, execs = [], [], []
        n_exch = 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            plan_str = df._jdf.queryExecution().executedPlan().toString()
            t2 = time.perf_counter()
            sc.setJobDescription(f"overhead: {name}")
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            spark.catalog.clearCache()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
            n_exch = plan_str.count("Exchange ")
        b, p, e = (statistics.median(x) for x in (builds, plans, execs))
        print(f"{name:30s} {b:7.3f} {p:7.3f} {e:7.3f} {b + p + e:7.3f} "
              f"{n_exch:5d}", flush=True)
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
