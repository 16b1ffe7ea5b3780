#!/usr/bin/env python
"""Interleaved same-session A/B of graph_pagerank: single-task kernel
vs distributed BSP loop (forced by zeroing SMALL_PR_EDGES), alternating
warm runs with the noop sink, plus a bit-identical output check.

Usage: python tools/ab_pagerank.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import codex_data_products_spark.operators.graphs as G
    from codex_data_products_spark.queries.graph import graph_pagerank
    from codex_data_products_spark.session import get_spark

    spark = get_spark(app_name="ab-pagerank")
    spark.range(1).count()
    bound = G.SMALL_PR_EDGES
    # warm both paths once (codegen/Arrow worker pool)
    for b in (bound, 0):
        G.SMALL_PR_EDGES = b
        graph_pagerank(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {"kernel": [], "bsp": []}
    outs: dict[str, list] = {}
    for r in range(rounds):
        for tag, b in (("kernel", bound), ("bsp", 0)):
            G.SMALL_PR_EDGES = b
            t0 = time.perf_counter()
            graph_pagerank(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            spark.catalog.clearCache()
            print(f"round {r} {tag}: {dt:.2f}s", flush=True)
    for tag, b in (("kernel", bound), ("bsp", 0)):
        G.SMALL_PR_EDGES = b
        outs[tag] = sorted(map(tuple, graph_pagerank(spark, sf_dir).collect()))
        spark.catalog.clearCache()
    G.SMALL_PR_EDGES = bound
    for tag in ("kernel", "bsp"):
        ts = times[tag]
        print(f"{tag}: median={statistics.median(ts):.2f}s "
              f"runs={[round(x, 2) for x in ts]}")
    print("outputs identical:", outs["kernel"] == outs["bsp"],
          "rows:", len(outs["kernel"]))


if __name__ == "__main__":
    main()
