"""Composed curation pipeline: stage semantics + product layout."""

from __future__ import annotations

import json
import os

from codex_data_products_spark.plans.training_pipeline import (
    CurationConfig,
    curate,
    exact_dedup_keepers,
    write_curated,
)

GOOD_EN = (
    "the quick brown fox jumps over a lazy dog and runs to the forest "
    "while the hunters watch a bird of prey circle over the meadow"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_doc_id(spark):
    docs = _docs(spark, [(1, "aaa"), (5, "aaa"), (3, "bbb")])
    kept = sorted(r["doc_id"] for r in exact_dedup_keepers(docs).collect())
    assert kept == [1, 3]


def test_curate_drops_near_duplicates_and_junk(spark):
    near_dup = GOOD_EN.replace("meadow", "valley")
    docs = _docs(
        spark,
        [
            (1, GOOD_EN),
            (2, GOOD_EN),  # exact dup of 1
            (3, near_dup),  # near dup of 1 (1 token differs)
            (4, "el perro corre por la calle de la ciudad " * 3),  # spanish
            (5, "tiny doc"),  # too short
            (6, "the " * 40),  # stopword spam, low TTR
        ],
    )
    out = curate(docs, CurationConfig(min_tokens=10))
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_write_curated_layout_and_manifest(spark, tmp_path):
    docs = _docs(spark, [(1, GOOD_EN), (2, GOOD_EN + " extra tokens here")])
    out = str(tmp_path / "product")
    manifest = write_curated(docs, out)
    assert manifest["input_docs"] == 2
    assert manifest["kept_docs"] >= 1
    assert manifest["total_tokens_kept"] > 0
    # partitioned layout: lang/length_bucket directories
    assert any(
        d.startswith("lang_predicted=") for d in os.listdir(f"{out}/corpus")
    )
    with open(f"{out}/manifest.json") as f:
        assert json.load(f) == manifest
    # product is readable and carries the curation columns
    back = spark.read.parquet(f"{out}/corpus")
    assert {"n_tokens", "stopword_ratio", "lang_predicted"} <= set(back.columns)


def test_write_training_shards_balanced_deterministic(spark, sf_dir, tmp_path):
    from codex_data_products_spark.plans.training_pipeline import (
        write_training_shards,
    )
    from codex_data_products_spark.tables import table as T

    docs = T(spark, sf_dir, "documents")
    m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=8)
    m2 = write_training_shards(docs, str(tmp_path / "b"), n_shards=8)
    # deterministic: identical manifests across runs
    assert m1 == m2
    assert len(m1["shards"]) == 8
    counts = [s["n_docs"] for s in m1["shards"]]
    # hash-balanced: no empty shard, worst/best within 2x at 500+ docs
    assert min(counts) > 0 and max(counts) / min(counts) < 2
    # round trip: layout is shard=K dirs, content equals input
    back = spark.read.parquet(str(tmp_path / "a" / "shards"))
    assert back.count() == m1["total_docs"] == docs.count()
    assert sorted(back.select("shard").distinct().toPandas()["shard"]) == list(
        range(8)
    )


def test_curate_substring_gate_drops_span_heavy_docs(spark):
    """With max_dup_span_frac set, a doc mostly assembled from a span
    that recurs in another (non-near-dup) doc is dropped; the unrelated
    good doc and the donors below the threshold survive. Off by
    default: the same corpus without the gate keeps all three."""
    # 12 shared tokens inside otherwise-different 30+-token docs:
    # coverage 12/31 ≈ 0.39 for doc 1 and 12/33 ≈ 0.36 for doc 2 —
    # below a 0.5 gate; doc 3 repeats the shared span twice plus a
    # second span shared with doc 1, pushing its coverage over 0.7.
    shared = "the storm rolled over a ridge and the river rose to flood"
    tail1 = (
        "while a shepherd counted sheep near the old stone bridge "
        "under pale morning light"
    )
    tail2 = (
        "and the town council met to plan a levy of sand bags "
        "for the southern quarter docks"
    )
    doc3 = f"{shared} {shared} under pale morning light"
    docs = _docs(
        spark,
        [(1, f"{shared} {tail1}"), (2, f"{shared} {tail2}"), (3, doc3)],
    )
    gated = curate(docs, CurationConfig(min_tokens=10, max_dup_span_frac=0.5))
    assert sorted(r["doc_id"] for r in gated.collect()) == [1, 2]
    ungated = curate(docs, CurationConfig(min_tokens=10))
    assert sorted(r["doc_id"] for r in ungated.collect()) == [1, 2, 3]


def test_curate_trim_dup_spans_keeps_doc_minus_spans(spark):
    """trim_dup_spans routes the gate's cut list through the row-local
    trim (Lee et al. 2022: remove the span, keep the doc): the gated
    doc survives with exactly its non-duplicated tokens — kept count ==
    n_tokens - span coverage — while below-threshold docs pass through
    with their text untouched."""
    shared = "the storm rolled over a ridge and the river rose to flood"
    tail1 = (
        "while a shepherd counted sheep near the old stone bridge "
        "under pale morning light"
    )
    tail2 = (
        "and the town council met to plan a levy of sand bags "
        "for the southern quarter docks"
    )
    # doc 3: two copies of the 12-token span + a 9-token unique suffix.
    # Duplicated windows flag positions 1..5 and 13..17; the 8-token
    # gap (13-5) does not break the island, so ONE cut [1, 24] covers
    # both copies: coverage 24/33 > 0.5 gates it, and the trim must
    # keep exactly tokens 25..33.
    suffix = "a cat sat near the mat of a hill"
    docs = _docs(
        spark,
        [
            (1, f"{shared} {tail1}"),
            (2, f"{shared} {tail2}"),
            (3, f"{shared} {shared} {suffix}"),
        ],
    )
    cfg = CurationConfig(
        min_tokens=1, max_dup_span_frac=0.5, trim_dup_spans=True
    )
    rows = {r["doc_id"]: r for r in curate(docs, cfg).collect()}
    assert sorted(rows) == [1, 2, 3]
    # the gated doc kept its doc_id but lost the covered span: token
    # accounting sees n_tokens - dup_tokens = 33 - 24 = 9
    assert rows[3]["text"] == suffix
    assert rows[3]["n_tokens"] == 9
    # below-threshold docs are NOT trimmed (byte-identical text)
    assert rows[1]["text"] == f"{shared} {tail1}"
    assert rows[2]["text"] == f"{shared} {tail2}"
