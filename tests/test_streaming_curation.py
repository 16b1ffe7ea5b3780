"""Streaming curation: incremental exactly-once ingestion with
cross-batch dedup and batch-equivalent scoring."""

from __future__ import annotations

import datetime as dt

from codex_data_products_spark.streaming.curation import (
    CurationConfig,
    curate_stream,
    run_ingestion,
)

SCHEMA = "doc_id long, text string, ts timestamp"
T0 = dt.datetime(2026, 1, 1, 12, 0, 0)

GOOD_EN = (
    "the quick brown fox jumps over a lazy dog and runs to the forest "
    "while the hunters watch a bird of prey circle over the meadow"
)
GOOD_EN_2 = GOOD_EN.replace("quick", "swift") + " under the autumn sky"


def _write(spark, path, part, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{path}/b{part}")


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    run_ingestion(
        curate_stream(stream, CurationConfig(min_tokens=10)), out, ckpt
    )


def test_incremental_ingestion_dedups_across_batches(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _write(
        spark,
        src,
        1,
        [
            (1, GOOD_EN, T0),
            (2, GOOD_EN, T0 + dt.timedelta(minutes=1)),  # in-batch dup
            (3, "el perro grande corre por la calle de la ciudad cada dia", T0),
            (4, "too short", T0),
        ],
    )
    _drain(spark, src, out, ckpt)
    # second batch: a cross-batch duplicate (within watermark) + fresh doc
    _write(
        spark,
        src,
        2,
        [
            (5, GOOD_EN, T0 + dt.timedelta(minutes=2)),
            (6, GOOD_EN_2, T0 + dt.timedelta(minutes=3)),
        ],
    )
    _drain(spark, src, out, ckpt)

    rows = spark.read.parquet(out).collect()
    kept = sorted(r["doc_id"] for r in rows)
    # 1 survives; 2 and 5 are duplicates; 3 is spanish; 4 too short;
    # 6 is distinct enough for exact dedup (near-dups are the batch
    # compaction stage's job)
    assert kept == [1, 6]
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["lang_predicted"] == "en"
    assert by_id[1]["n_tokens"] == 26
    # partitioned-by-language corpus layout
    import os

    assert any(
        d.startswith("lang_predicted=") for d in os.listdir(out)
        if not d.startswith("_")
    )


def test_cdc_apply_maintains_dimension_across_drains(spark, tmp_path):
    """Streaming MERGE: snapshots advance per micro-batch, last change
    per key wins within a batch, and the final state equals the batch
    merge_into of the compacted change log."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.streaming.merge import (
        bootstrap_table,
        read_table,
        run_cdc_apply,
        table_versions,
    )

    table, src, ckpt = (
        str(tmp_path / "dim"),
        str(tmp_path / "changes"),
        str(tmp_path / "ckpt"),
    )
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    bootstrap_table(base, table)

    ch_schema = "ck long, op string, new_bal double, seq long"

    def drain():
        stream = (
            spark.readStream.schema(ch_schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        run_cdc_apply(
            stream,
            table,
            ckpt,
            key="k",
            change_key="ck",
            seq_col="seq",
            set_cols={"bal": "new_bal"},
            insert_defaults={"name": F.lit("new")},
        )

    # batch 1: two changes to the same key (seq 2 wins), one delete
    spark.createDataFrame(
        [(1, "U", 11.0, 1), (1, "U", 12.0, 2), (3, "D", None, 1)],
        ch_schema,
    ).coalesce(1).write.parquet(f"{src}/b1")
    drain()
    state1 = {r["k"]: r["bal"] for r in read_table(spark, table).collect()}
    assert state1 == {1: 12.0, 2: 20.0}

    # batch 2: re-insert key 3, update key 2
    spark.createDataFrame(
        [(3, "I", 33.0, 3), (2, "U", 22.0, 3)], ch_schema
    ).coalesce(1).write.parquet(f"{src}/b2")
    drain()
    state2 = {
        r["k"]: (r["name"], r["bal"])
        for r in read_table(spark, table).collect()
    }
    assert state2 == {1: ("a", 12.0), 2: ("b", 22.0), 3: ("new", 33.0)}
    # snapshot history: v=0 bootstrap plus one version per micro-batch
    assert table_versions(spark, table)[0] == 0
    assert len(table_versions(spark, table)) >= 3
    # time travel: the bootstrap snapshot is still addressable
    v0 = {r["k"]: r["bal"] for r in read_table(spark, table, version=0).collect()}
    assert v0 == {1: 10.0, 2: 20.0, 3: 30.0}
