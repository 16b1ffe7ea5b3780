#!/usr/bin/env python
"""Per-query comparison of two bench JSON artifacts (VERDICT r11 #3 —
drift pinning). Accepts either a raw bench JSON line or the driver's
BENCH_r{N}.json wrapper (uses .parsed).

Usage: python tools/compare_bench.py OLD.json NEW.json [--suite sf0.5]
"""

from __future__ import annotations

import argparse
import json
import math


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--suite", default=None, help="e.g. sf0.5 / skew_sf1.0")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    if args.suite:
        old, new = old.get(args.suite, {}), new.get(args.suite, {})
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    ratios = []
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'new/old':>8s}")
    for name in common:
        r = nq[name] / oq[name] if oq[name] else float("nan")
        ratios.append(r)
        flag = "  <-- worse" if r > 1.10 else ("  <-- better" if r < 0.90 else "")
        print(f"{name:32s} {oq[name]:8.3f} {nq[name]:8.3f} {r:8.2f}{flag}")
    if ratios:
        gm = math.exp(sum(math.log(max(r, 1e-9)) for r in ratios) / len(ratios))
        print(f"\ntotal old={sum(oq[n] for n in common):.2f}s "
              f"new={sum(nq[n] for n in common):.2f}s "
              f"geomean new/old={gm:.3f} n={len(common)}")


if __name__ == "__main__":
    main()
