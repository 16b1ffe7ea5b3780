#!/usr/bin/env python
"""Generate testdata-shaped parquet at larger scale factors for stress
sweeps (VERDICT r4 #4).

The driver's /root/testdata is read-only and capped at sf0.1; bigger
SFs exposed divergence classes the small SFs missed (the width_bucket
clamp at sf0.1 — COVERAGE.md), so this tool regenerates the SAME
schemas and value domains (TPC-H-ish star schema + events/documents/
embeddings) at any sf into a repo-local directory, deterministically
(fixed numpy seed). Row counts scale linearly exactly like the driver
data: lineitem = 6M·sf, orders = 1.5M·sf, customer = 150k·sf,
part = 200k·sf, supplier = 10k·sf, events = 1M·sf,
documents = 50k·sf, embeddings = 20k·sf (documents/embeddings follow
sf0.1's 5000/2000 ratio).

Usage:  python tools/gen_stress.py --sf 0.5 --out .stressdata/sf0.5

Deliberate stress features beyond the driver generator:
  * fractional l_quantity rows (exercises the floor()-before-cast
    contract in supplier_concentration);
  * two bot users owning ~4% of events in single-day bursts
    (exercises bounded per-key state in events_ewma and friends);
  * 5% exact-duplicate + 3% near-duplicate documents (keeps the
    dedup family's candidate sets non-trivial at scale);
  * clustered embeddings (10 Gaussian clusters → IVF cells and PQ
    codebooks train on real structure).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow query merge join group filter shuffle stage task row table "
    "index cache disk memory read write plan tree node leaf range key "
    "count sum large tiny quick lazy eager wide deep"
).split()

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAMES1 = ["large", "hot", "blue", "red", "green", "dim", "cold", "pale"]
PNAMES2 = ["ring", "bolt", "screw", "washer", "plate", "cap", "rod", "nut"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "zh", "de"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _days(rng, n, start, end):
    span = (np.datetime64(end) - np.datetime64(start)).astype(int)
    offs = rng.integers(0, span, n)
    return (np.datetime64(start) + offs.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def generate(sf: float, out: str, seed: int = 1337) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed dims, same layout as the driver data)
    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                           "MIDDLE EAST"],
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)],
                                        pa.int32()),
            }
        ),
    )

    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{PNAMES1[i % 8]} {PNAMES2[(i // 8) % 8]}"
                    for i in range(n_part)
                ],
                "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
                "p_type": pa.array(
                    np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, n_part), pa.int32()
                ),
                "p_retailprice": np.round(
                    900.0 + np.arange(n_part) * 0.1 % 1200, 2
                ),
            }
        ),
    )

    odate = _days(rng, n_ord, "1995-01-01", "2001-08-02")
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[
                        rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])
                    ]
                ),
                "o_totalprice": np.round(
                    rng.uniform(1000, 500000, n_ord), 2
                ),
                "o_orderdate": odate,
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # lineitem rows reference orders ~4 lines/order on average
    lo = rng.integers(0, n_ord, n_li)
    qty = rng.integers(1, 51, n_li).astype("float64")
    # stress: 2% fractional quantities (absent from the driver data —
    # exercises explicit floor() semantics on both engines)
    frac = rng.random(n_li) < 0.02
    qty[frac] += 0.5
    ship = (
        odate[lo]
        + rng.integers(1, 120, n_li).astype("timedelta64[D]").astype(
            "timedelta64[us]"
        )
    )
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lo, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": qty,
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, n_li), 2
                ),
                "l_discount": np.round(
                    rng.integers(0, 11, n_li) / 100.0, 2
                ),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": ship,
            }
        ),
    )

    # events: 30 days, zipf-ish users + two single-day bot bursts
    n_users = max(1, int(15_000 * sf))
    uid = rng.integers(1, n_users + 1, n_ev)
    burst = int(0.02 * n_ev)
    uid[:burst] = 1  # bot 1
    uid[burst : 2 * burst] = 2  # bot 2
    secs = rng.integers(0, 30 * 86400, n_ev)
    secs[:burst] = rng.integers(0, 86400, burst)  # bot 1: one-day burst
    secs[burst : 2 * burst] = 5 * 86400 + rng.integers(
        0, 86400, burst
    )
    ts = (
        np.datetime64("2024-01-01T00:00:00")
        + secs.astype("timedelta64[s]")
        + rng.integers(0, 1_000_000, n_ev).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": ts,
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[
                        rng.choice(
                            5, n_ev, p=[0.4, 0.35, 0.1, 0.05, 0.1]
                        )
                    ]
                ),
                "value": np.round(
                    np.minimum(rng.exponential(60, n_ev), 560.21), 2
                ),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, n_ev)
                ],
            }
        ),
    )

    # documents: random vocab text + exact/near duplicates
    vocab = np.array(VOCAB)
    lengths = rng.integers(8, 120, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)])
        for ln in lengths
    ]
    n_dup = int(0.05 * n_doc)
    n_near = int(0.03 * n_doc)
    for i in range(n_dup):  # exact dups of early docs
        texts[n_doc - 1 - i] = texts[i]
    for i in range(n_near):  # near-dups: one word substituted
        toks = texts[n_dup + i].split()
        toks[len(toks) // 2] = "variant"
        texts[n_doc - n_dup - 1 - i] = " ".join(toks)
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[
                        rng.choice(5, n_doc, p=[0.6, 0.1, 0.1, 0.1, 0.1])
                    ]
                ),
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    # embeddings: 10 Gaussian clusters in 64-d, unit-ish scale
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 0.5, (10, 64))
    vecs = (
        centers[labels] + rng.normal(0, 0.15, (n_emb, 64))
    ).astype("float32")
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


def generate_boilerplate(sf: float, out: str, seed: int = 4242) -> None:
    """Documents-only stress table for the exact-substring dedup family
    (VERDICT r8 #8): ONE fixed 16-token boilerplate sentence prepended
    to 50% of the docs — the repeated-licence-header pattern that makes
    every pairwise dedup family quadratic (25k docs sharing a gram =
    3*10^8 candidate pairs) while the aggregate-shaped substring family
    stays flat (the hot gram is one count row). The base corpus keeps
    gen_stress's exact/near-dup structure so the pair families run on
    comparable semantics. Kept SEPARATE from the sf1.0 skew dir so the
    round-over-round skew numbers stay byte-stable."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_doc = int(50_000 * sf)
    vocab = np.array(VOCAB)
    boiler = (
        "this document is provided under the standard public licence "
        "terms and conditions apply to all"
    )
    lengths = rng.integers(8, 120, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths
    ]
    n_dup = int(0.05 * n_doc)
    n_near = int(0.03 * n_doc)
    for i in range(n_dup):
        texts[n_doc - 1 - i] = texts[i]
    for i in range(n_near):
        toks = texts[n_dup + i].split()
        toks[len(toks) // 2] = "variant"
        texts[n_doc - n_dup - 1 - i] = " ".join(toks)
    texts = [
        f"{boiler} {t}" if i % 2 == 0 else t for i, t in enumerate(texts)
    ]
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[
                        rng.choice(5, n_doc, p=[0.6, 0.1, 0.1, 0.1, 0.1])
                    ]
                ),
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument(
        "--boilerplate",
        action="store_true",
        help="documents-only corpus with a 16-token boilerplate "
        "sentence in 50%% of docs (substring-family stress)",
    )
    args = ap.parse_args()
    print(f"generating sf={args.sf} into {args.out}")
    if args.boilerplate:
        generate_boilerplate(args.sf, args.out)
    else:
        generate(args.sf, args.out, args.seed)


if __name__ == "__main__":
    main()
