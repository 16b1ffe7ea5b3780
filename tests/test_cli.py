"""CLI surface: each subcommand drives its plan end-to-end."""

from __future__ import annotations

import glob
import json

from codex_data_products_spark.cli import main


def test_cli_query_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "q")
    rc = main(
        [
            "query",
            "agg_distinct",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out,
        ]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_query_unknown_name_fails_cleanly():
    assert main(["query", "no_such_query"]) == 2


def test_cli_catalog(tmp_path):
    hits = [
        {
            "_source": {
                "uuid": "u1",
                "hubmap_id": "HBM-u1",
                "dataset_type": "CODEX",
                "data_access_level": "public",
                "next_revision_uuid": None,
                "origin_samples_unique_mapped_organs": ["Spleen"],
                "immediate_ancestor_ids": ["anc"],
                "immediate_descendant_ids": [],
                "donor": {"metadata": {"organ_donor_data": None,
                                       "living_donor_data": None}},
            }
        }
    ]
    hits_path = tmp_path / "hits.json"
    hits_path.write_text(json.dumps(hits))
    out = str(tmp_path / "cat.tsv")
    assert main(["catalog", "--hits-json", str(hits_path), "--out", out]) == 0
    (part,) = glob.glob(f"{out}/part-*.csv")
    body = open(part).read()
    assert "u1" in body and "row_id" in body


def test_cli_curate(spark, tmp_path):
    corpus = str(tmp_path / "corpus_in")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog and runs to "
                "the forest while the hunters watch a bird of prey"),
        ],
        "doc_id long, text string",
    ).write.parquet(corpus)
    out = str(tmp_path / "curated")
    assert main(["curate", "--input", corpus, "--out", out]) == 0
    manifest = json.load(open(f"{out}/manifest.json"))
    assert manifest["kept_docs"] == 1


def test_cli_explain_prints_physical_plan(spark, sf_dir, capsys):
    assert main(["explain", "q6_forecast_revenue", "--sf-dir", sf_dir]) == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan and "PushedFilters" in plan


def test_cli_verify_reports_match_and_exit_code(capsys):
    from codex_data_products_spark.cli import main

    rc = main(
        [
            "verify",
            "join_semi",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--verbose",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "MATCH    join_semi" in out
    assert "1 verified, 0 mismatched" in out


def test_cli_stream_drains_incrementally(spark, tmp_path):
    import datetime

    text = (
        "the quick brown fox jumps over a lazy dog and runs to "
        "the forest while the hunters watch a bird of prey"
    )
    src = str(tmp_path / "stream_in")
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")
    t0 = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, text)], "doc_id long, ts timestamp, text string"
    ).write.mode("append").parquet(src)
    args = ["stream", "--input", src, "--out", out, "--checkpoint", ck]
    assert main(args) == 0
    assert spark.read.parquet(out).count() == 1
    # second file, same checkpoint → only the new file is ingested
    spark.createDataFrame(
        [(2, t0, text + " extra")],
        "doc_id long, ts timestamp, text string",
    ).write.mode("append").parquet(src)
    assert main(args) == 0
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]


def test_cli_dedup_compact(spark, tmp_path, capsys):
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_cluster_batch,
        bootstrap_cluster_state,
        simhash_pairs_snapshot,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    state = str(tmp_path / "state")
    bootstrap_cluster_state(spark, state)
    apply_cluster_batch(docs.filter("doc_id % 2 = 0"), state, 0)
    apply_cluster_batch(docs.filter("doc_id % 2 = 1"), state, 1)
    before = {
        tuple(r) for r in simhash_pairs_snapshot(spark, state).collect()
    }
    rc = main(
        ["dedup-compact", state, "--upto", "2", "--keep-last", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted_upto"] == 2
    assert {
        tuple(r) for r in simhash_pairs_snapshot(spark, state).collect()
    } == before


def test_cli_dedup_compact_substring_family(spark, tmp_path, capsys):
    from codex_data_products_spark.streaming.substring_ivm import (
        apply_substring_batch,
        bootstrap_substring_state,
        substring_coverage_snapshot,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    state = str(tmp_path / "substr_state")
    bootstrap_substring_state(spark, state)
    apply_substring_batch(docs.filter("doc_id % 2 = 0"), state, 0)
    apply_substring_batch(docs.filter("doc_id % 2 = 1"), state, 1)
    before = {
        tuple(r)
        for r in substring_coverage_snapshot(spark, state).collect()
    }
    rc = main(
        [
            "dedup-compact", state,
            "--upto", "2",
            "--family", "substring",
            "--keep-last", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted_upto"] == 2
    assert {
        tuple(r)
        for r in substring_coverage_snapshot(spark, state).collect()
    } == before


def test_cli_dedup_compact_embedding_and_ann_families(
    spark, tmp_path, capsys
):
    from codex_data_products_spark.streaming.ann_ivm import (
        ann_postings_snapshot,
        apply_ann_batch,
        bootstrap_ann_state,
    )
    from codex_data_products_spark.streaming.emb_dedup_ivm import (
        apply_emb_batch,
        emb_pairs_snapshot,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    estate = str(tmp_path / "emb_state")
    apply_emb_batch(
        spark, estate, 0,
        adds=emb.filter("vec_id % 2 = 0").select(
            "vec_id", "embedding", "label"
        ),
    )
    apply_emb_batch(
        spark, estate, 1,
        adds=emb.filter("vec_id % 2 = 1").select(
            "vec_id", "embedding", "label"
        ),
    )
    before = {
        tuple(r) for r in emb_pairs_snapshot(spark, estate).collect()
    }
    rc = main(
        ["dedup-compact", estate, "--upto", "1", "--family", "embedding"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted_upto"] == 1
    assert {
        tuple(r) for r in emb_pairs_snapshot(spark, estate).collect()
    } == before

    astate = str(tmp_path / "ann_state")
    bootstrap_ann_state(spark, astate, emb.filter("vec_id % 3 = 0"))
    apply_ann_batch(
        spark, astate, 0, adds=emb.select("vec_id", "embedding")
    )
    apply_ann_batch(
        spark, astate, 1,
        removes=emb.filter("vec_id % 7 = 3").select("vec_id"),
    )
    abefore = {
        (r["vec_id"], r["cell"])
        for r in ann_postings_snapshot(spark, astate).collect()
    }
    rc = main(["dedup-compact", astate, "--upto", "1", "--family", "ann"])
    assert rc == 0
    assert {
        (r["vec_id"], r["cell"])
        for r in ann_postings_snapshot(spark, astate).collect()
    } == abefore
