#!/usr/bin/env python
"""Phase profile of graph_pagerank (VERDICT r11 #8): where do the
~3.2 s headline / ~8.5 s skew go — the edge build (lineitem join) or
the 3-iteration chain's AQE query-stage fixed costs?

Usage: python tools/profile_pagerank.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from codex_data_products_spark.operators.graphs import pagerank as op_pagerank
from codex_data_products_spark.queries.graph import (
    DAMPING,
    N_ITER,
    _trade_edges,
    graph_pagerank,
)
from codex_data_products_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile-pagerank")
    spark.range(1).count()
    sc = spark.sparkContext

    for run in range(n_runs):
        t0 = time.perf_counter()
        sc.setJobDescription("pagerank: edges build + noop")
        edges = _trade_edges(spark, sf_dir)
        edges.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()

        sc.setJobDescription("pagerank: edges checkpoint")
        eck = edges.localCheckpoint()
        t2 = time.perf_counter()

        sc.setJobDescription("pagerank: iterations from checkpointed edges")
        op_pagerank(
            eck, n_iter=N_ITER, damping=DAMPING, checkpoint_every=N_ITER + 1
        ).write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        eck.unpersist()

        sc.setJobDescription("pagerank: full query end-to-end")
        graph_pagerank(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t4 = time.perf_counter()
        spark.catalog.clearCache()
        print(
            f"run {run}: edges_noop={t1 - t0:.3f}s ckpt={t2 - t1:.3f}s "
            f"iter_from_ckpt={t3 - t2:.3f}s full_query={t4 - t3:.3f}s",
            flush=True,
        )

    sc.setJobDescription(None)
    e = _trade_edges(spark, sf_dir)
    print("n_edges:", e.count(), "n_nodes:",
          e.select(F.col("src").alias("n")).union(
              e.select("dst")).distinct().count())


if __name__ == "__main__":
    main()
