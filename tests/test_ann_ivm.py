"""Incremental IVF index maintenance (streaming/ann_ivm.py).

Property contract mirrored from the dedup maintainers: incremental ==
from-scratch over the surviving corpus at every step, remove→re-add
composes as two batches, crash replay is idempotent, compaction
preserves snapshots, and the probe path's posting scan PRUNES to the
probed cell partitions (the 100 TB read-amplification claim, checked
against the files actually read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codex_data_products_spark.streaming.ann_ivm import (
    ann_postings_snapshot,
    apply_ann_batch,
    bootstrap_ann_state,
    compact_ann_postings,
    frozen_centroids,
    search_ann,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df, cols=("vec_id", "cell", "min_d2")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _build(spark, sf_dir, state, n_batches=3):
    emb = _emb(spark, sf_dir)
    bootstrap_ann_state(
        spark, state, emb.filter(F.col("vec_id") % 3 == 0)
    )
    for k in range(n_batches):
        apply_ann_batch(
            spark,
            state,
            k,
            adds=emb.filter(F.col("vec_id") % 3 == k).select(
                "vec_id", "embedding"
            ),
        )
    return emb


def _fresh_twin(spark, sf_dir, tmp_path, corpus):
    """A from-scratch index over ``corpus`` with the SAME frozen
    quantizer (trained on the full bootstrap subset) — what the
    maintained index must equal."""
    emb = _emb(spark, sf_dir)
    twin = str(tmp_path / "twin")
    bootstrap_ann_state(spark, twin, emb.filter(F.col("vec_id") % 3 == 0))
    apply_ann_batch(
        spark, twin, 0, adds=corpus.select("vec_id", "embedding")
    )
    return twin


def test_incremental_matches_from_scratch_after_removal(
    spark, sf_dir, tmp_path
):
    state = str(tmp_path / "ann")
    emb = _build(spark, sf_dir, state)
    apply_ann_batch(
        spark,
        state,
        3,
        removes=emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
    )
    surv = emb.filter(F.col("vec_id") % 7 != 3)
    twin = _fresh_twin(spark, sf_dir, tmp_path, surv)
    assert _rows(ann_postings_snapshot(spark, state)) == _rows(
        ann_postings_snapshot(spark, twin)
    )


def test_remove_then_readd_and_time_travel(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ann_readd")
    emb = _build(spark, sf_dir, state)
    victim = emb.filter(F.col("vec_id") % 7 == 3)
    apply_ann_batch(spark, state, 3, removes=victim.select("vec_id"))
    apply_ann_batch(
        spark, state, 4, adds=victim.select("vec_id", "embedding")
    )
    # head: everything is back — equals a never-removed from-scratch twin
    twin = _fresh_twin(spark, sf_dir, tmp_path, emb)
    assert _rows(ann_postings_snapshot(spark, state)) == _rows(
        ann_postings_snapshot(spark, twin)
    )
    # time travel to version 3 still sees the removal era exactly
    v3 = ann_postings_snapshot(spark, state, version=3)
    assert v3.filter(F.col("vec_id") % 7 == 3).count() == 0
    n_surv = emb.filter(F.col("vec_id") % 7 != 3).count()
    assert v3.count() == n_surv


def test_crash_replay_is_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ann_replay")
    emb = _build(spark, sf_dir, state)
    before = _rows(ann_postings_snapshot(spark, state))
    # replay batch 2 (crashed-and-restarted writer): overwrite, not append
    apply_ann_batch(
        spark,
        state,
        2,
        adds=emb.filter(F.col("vec_id") % 3 == 2).select(
            "vec_id", "embedding"
        ),
    )
    assert _rows(ann_postings_snapshot(spark, state)) == before


def test_compaction_preserves_snapshot_and_gcs_batches(
    spark, sf_dir, tmp_path
):
    import os

    state = str(tmp_path / "ann_compact")
    emb = _build(spark, sf_dir, state)
    apply_ann_batch(
        spark,
        state,
        3,
        removes=emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
    )
    before = _rows(ann_postings_snapshot(spark, state))
    compact_ann_postings(spark, state, upto=3)
    assert _rows(ann_postings_snapshot(spark, state)) == before
    names = set(os.listdir(f"{state}/postings"))
    assert "compact=3" in names
    assert not any(n.startswith("batch=") for n in names)
    # a post-compaction batch layers on the compacted floor
    apply_ann_batch(
        spark,
        state,
        4,
        adds=emb.filter(F.col("vec_id") % 7 == 3).select(
            "vec_id", "embedding"
        ),
    )
    twin = _fresh_twin(spark, sf_dir, tmp_path, emb)
    assert _rows(ann_postings_snapshot(spark, state)) == _rows(
        ann_postings_snapshot(spark, twin)
    )


def test_probe_scan_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ann_prune")
    _build(spark, sf_dir, state)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 50 == 0)
        .limit(3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "qv"
            ),
        )
    )
    res = search_ann(spark, state, queries, top_k=5, nprobe=1)
    assert res.count() > 0
    n_cells = frozen_centroids(spark, state).count()
    assert n_cells > 1
    # the pruned snapshot's posting scans carry the cell partition
    # filter — directory-level pruning, not a post-scan filter
    import contextlib
    import io

    pruned = ann_postings_snapshot(spark, state, cells=[0])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    post_filters = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "cell" in line
    ]
    assert post_filters, "postings scan has a cell partition filter"
    assert all("= 0" in line for line in post_filters)


def test_pruned_search_recall_gate(spark, sf_dir, tmp_path):
    """nprobe=2 over the maintained index recovers a usable fraction of
    the exhaustive top-k — the ANN quality gate on the IVM path."""
    state = str(tmp_path / "ann_recall")
    _build(spark, sf_dir, state)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "qv"
            ),
        )
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in search_ann(
            spark, state, queries, top_k=5, nprobe=None
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in search_ann(
            spark, state, queries, top_k=5, nprobe=2
        ).collect()
    }
    assert approx, "pruned search returns neighbors"
    recall = len(truth & approx) / len(truth)
    # near-orthogonal synthetic vectors: multiprobe recall ~0.4 (see
    # knn_recall_multiprobe) — gate well below to stay SF-stable, the
    # exact-value oracle pins the actual numbers
    assert recall >= 0.2


def test_state_writes_are_delta_sized(spark, sf_dir, tmp_path):
    """Posting-log appends are O(delta): a batch's write lands only in
    its own batch dir; earlier dirs' bytes never change."""
    import os

    def _dir_bytes(p):
        total = 0
        for root, _, fnames in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in fnames
            )
        return total

    state = str(tmp_path / "ann_delta")
    emb = _emb(spark, sf_dir)
    bootstrap_ann_state(spark, state, emb.filter(F.col("vec_id") % 3 == 0))
    apply_ann_batch(
        spark,
        state,
        0,
        adds=emb.filter(F.col("vec_id") % 3 == 0).select(
            "vec_id", "embedding"
        ),
    )
    b0 = _dir_bytes(f"{state}/postings/batch=0")
    apply_ann_batch(
        spark,
        state,
        1,
        adds=emb.filter(F.col("vec_id") % 3 == 1).select(
            "vec_id", "embedding"
        ),
    )
    assert _dir_bytes(f"{state}/postings/batch=0") == b0


def test_pq_codes_incremental_matches_from_scratch(spark, sf_dir, tmp_path):
    """Maintained PQ codes == one-shot encode of the surviving corpus
    against the same frozen codebook (remove → re-add exercised)."""
    from codex_data_products_spark.queries.similarity import _pq_codebook
    from codex_data_products_spark.streaming.ann_ivm import (
        apply_pq_batch,
        bootstrap_pq_state,
        pq_codes_snapshot,
    )

    emb = _emb(spark, sf_dir)
    cb = _pq_codebook(spark, sf_dir, train_where="vec_id % 3 = 0")
    state = str(tmp_path / "pq")
    bootstrap_pq_state(spark, state, cb)
    for k in range(3):
        apply_pq_batch(
            spark,
            state,
            k,
            adds=emb.filter(F.col("vec_id") % 3 == k).select(
                "vec_id", "embedding"
            ),
        )
    victims = emb.filter(F.col("vec_id") % 7 == 3)
    apply_pq_batch(spark, state, 3, removes=victims.select("vec_id"))
    apply_pq_batch(
        spark, state, 4, adds=victims.select("vec_id", "embedding")
    )
    twin = str(tmp_path / "pq_twin")
    bootstrap_pq_state(spark, twin, cb)
    apply_pq_batch(spark, twin, 0, adds=emb.select("vec_id", "embedding"))

    def rows(state_dir):
        return sorted(
            (r["vec_id"], r["s"], r["code"], r["min_d"])
            for r in pq_codes_snapshot(spark, state_dir).collect()
        )

    got, want = rows(state), rows(twin)
    assert got == want and got
    # time travel: version 3 sees the removal era
    v3 = pq_codes_snapshot(spark, state, version=3)
    assert v3.filter(F.col("vec_id") % 7 == 3).count() == 0


def test_auto_nprobe_over_maintained_index(spark, sf_dir, tmp_path):
    """nprobe='auto' picks the balance-driven probe count from LIVE
    posting state and returns exactly the explicit-nprobe results."""
    from codex_data_products_spark.operators.clustering import auto_nprobe
    from codex_data_products_spark.streaming.ann_ivm import (
        maintained_cell_balance,
    )

    state = str(tmp_path / "ann_auto")
    _build(spark, sf_dir, state)
    n_cells, esf = maintained_cell_balance(spark, state)
    assert n_cells > 1 and 0 < esf <= 1
    picked = auto_nprobe(n_cells, esf, 0.2)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 50 == 0)
        .limit(3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "qv"
            ),
        )
    )
    auto_res = sorted(
        tuple(r)
        for r in search_ann(
            spark, state, queries, top_k=5, nprobe="auto"
        ).collect()
    )
    explicit = sorted(
        tuple(r)
        for r in search_ann(
            spark, state, queries, top_k=5, nprobe=picked
        ).collect()
    )
    assert auto_res == explicit and auto_res


def test_search_tolerates_conflicting_extra_query_columns(
    spark, sf_dir, tmp_path
):
    """ADVICE r10: the nprobe candidate join re-attaches the query
    frame; a caller whose queries carry extra columns named v/nsq/
    vec_id/cell must not hit ambiguous resolution — search_ann projects
    the frame to (query_id, qv) internally."""
    state = str(tmp_path / "ann_extra_cols")
    _build(spark, sf_dir, state)
    clean = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 50 == 0)
        .limit(3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "qv"
            ),
        )
    )
    messy = clean.select(
        "query_id",
        "qv",
        F.col("query_id").alias("vec_id"),
        F.col("qv").alias("v"),
        F.lit(0.0).alias("nsq"),
        F.lit(99).alias("cell"),
    )
    want = sorted(
        (r["query_id"], r["rn"], r["neighbor_id"])
        for r in search_ann(
            spark, state, clean, top_k=5, nprobe=2
        ).collect()
    )
    got = sorted(
        (r["query_id"], r["rn"], r["neighbor_id"])
        for r in search_ann(
            spark, state, messy, top_k=5, nprobe=2
        ).collect()
    )
    assert got == want and got


def test_search_probe_collect_cap_raises_on_oversized_query_frame(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r10 #5: the pruned-probe (query_id, cell) collect is
    bounded by MAX_PROBE_PAIRS — an oversized query frame raises with
    guidance instead of OOMing the driver; a bounded frame is
    unaffected."""
    import pytest as _pytest

    from codex_data_products_spark.streaming import ann_ivm

    state = str(tmp_path / "ann_cap")
    _build(spark, sf_dir, state)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 10 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "qv"
            ),
        )
    )
    n_q = queries.count()
    assert n_q > 2
    monkeypatch.setattr(ann_ivm, "MAX_PROBE_PAIRS", 2 * n_q - 1)
    with _pytest.raises(ValueError, match="MAX_PROBE_PAIRS"):
        search_ann(spark, state, queries, top_k=5, nprobe=2).collect()
    # bounded path unchanged: nprobe=1 sits under the patched cap
    assert search_ann(
        spark, state, queries, top_k=5, nprobe=1
    ).count() > 0
    # and the distributed full-scan path never consults the cap
    assert search_ann(
        spark, state, queries.limit(3), top_k=5, nprobe=None
    ).count() > 0
