"""Python DataSource wrappers: registered formats match the plain readers."""

from __future__ import annotations

import numpy as np
import pytest

from codex_data_products_spark.sources import minihdf5
from codex_data_products_spark.sources.matrix_market import read_matrix_market
from codex_data_products_spark.sources.spark_datasource import register_all


@pytest.fixture()
def registered(spark):
    register_all(spark)
    return spark


def test_matrixmarket_format_matches_plain_reader(registered, tmp_path):
    (tmp_path / "a.mtx").write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% comment\n"
        "3 3 3\n"
        "1 2 5.0\n"
        "2 1 7.5\n"
        "3 3 1.25\n"
    )
    (tmp_path / "b.mtx").write_text("%%h\n2 2 1\n2 1 7.0\n")
    got = {
        (r["source_file"], r["i"], r["j"], r["weight"])
        for r in registered.read.format("matrixmarket")
        .load(str(tmp_path / "*.mtx"))
        .collect()
    }
    # the line-based reader carries full file URIs; the DataSource
    # yields basenames — compare on basename
    want = {
        (r["source_file"].rsplit("/", 1)[-1], r["i"], r["j"], r["weight"])
        for r in read_matrix_market(
            registered, str(tmp_path / "*.mtx"), with_source_file=True
        ).collect()
    }
    assert got == want and len(got) == 4


def test_matrixmarket_pattern_matrix_defaults_weight(registered, tmp_path):
    (tmp_path / "p.mtx").write_text("%%pattern\n2 2 2\n1 1\n2 2\n")
    rows = (
        registered.read.format("matrixmarket")
        .load(str(tmp_path / "p.mtx"))
        .collect()
    )
    assert {(r["i"], r["j"], r["weight"]) for r in rows} == {
        (1, 1, 1.0),
        (2, 2, 1.0),
    }


def test_matrixmarket_is_one_partition_per_file(registered, tmp_path):
    for k in range(3):
        (tmp_path / f"f{k}.mtx").write_text("%%h\n1 1 1\n1 1 2.0\n")
    df = registered.read.format("matrixmarket").load(str(tmp_path / "*.mtx"))
    assert df.rdd.getNumPartitions() == 3


def test_minihdf5_format_reads_2d_and_1d(registered, tmp_path):
    x = np.arange(6, dtype=np.float64).reshape(2, 3)
    mean = np.array([10.0, 20.0])
    payload = minihdf5.write({"/X": x, "/obs/mean": mean})
    (tmp_path / "d.h5").write_bytes(payload)

    got_x = (
        registered.read.format("minihdf5")
        .load(str(tmp_path / "d.h5"))
        .collect()
    )
    assert {(r["row"], r["col"], r["value"]) for r in got_x} == {
        (r, c, float(x[r, c])) for r in range(2) for c in range(3)
    }

    got_mean = (
        registered.read.format("minihdf5")
        .option("dataset", "/obs/mean")
        .load(str(tmp_path / "d.h5"))
        .collect()
    )
    assert {(r["row"], r["col"], r["value"]) for r in got_mean} == {
        (0, 0, 10.0),
        (1, 0, 20.0),
    }


def test_minihdf5_filter_composes_above_scan(registered, tmp_path):
    x = np.arange(4, dtype=np.float64).reshape(2, 2)
    (tmp_path / "e.h5").write_bytes(minihdf5.write({"/X": x}))
    df = (
        registered.read.format("minihdf5")
        .load(str(tmp_path / "e.h5"))
        .filter("value > 1.5")
        .groupBy("row")
        .count()
    )
    assert {(r["row"], r["count"]) for r in df.collect()} == {(1, 2)}


def test_eventgen_stream_drains_deterministically(registered, tmp_path):
    """The custom streaming source: an availableNow drain of the bounded
    generator produces exactly the deterministic row set, and a second
    run (fresh checkpoint) reproduces it bit-for-bit."""
    from codex_data_products_spark.sources.spark_datasource import _gen_row

    def drain(name: str) -> set:
        q = (
            registered.readStream.format("eventgen")
            .option("rows", "1000")
            .option("batchrows", "300")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", str(tmp_path / f"ck_{name}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
            for r in registered.sql(f"SELECT * FROM {name}").collect()
        }

    got = drain("eventgen_a")
    assert len(got) == 1000
    want = {_gen_row(i) for i in range(1000)}
    assert got == want
    assert drain("eventgen_b") == got


def test_eventgen_composes_with_windowed_agg(registered, tmp_path):
    from pyspark.sql import functions as F

    stream = (
        registered.readStream.format("eventgen")
        .option("rows", "800")
        .load()
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eventgen_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = registered.sql(
        "SELECT sum(count) AS n FROM eventgen_win"
    ).collect()[0]["n"]
    assert total == 800


def test_eventgen_checkpoint_resume_appends_only_new_offsets(
    registered, tmp_path
):
    """Restart contract: a second drain against the SAME checkpoint with
    a larger bound emits only offsets past the committed one — the
    source resumes from the checkpoint, never regenerates."""
    ck = str(tmp_path / "ck_resume")
    out = str(tmp_path / "out")

    def drain(rows: int) -> None:
        q = (
            registered.readStream.format("eventgen")
            .option("rows", str(rows))
            .option("batchrows", "250")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(600)
    ids_a = {
        r["event_id"] for r in registered.read.parquet(out).collect()
    }
    assert ids_a == set(range(600))
    drain(1000)
    ids_b = {
        r["event_id"] for r in registered.read.parquet(out).collect()
    }
    # the resumed run appended ONLY offsets past the committed one
    assert ids_b == set(range(1000))


def test_matrixmarket_blank_lines_parity(registered, tmp_path):
    # A leading blank line must not be mistaken for the size line by
    # either path (ADVICE r4): both readers skip blanks, drop the real
    # size line, and emit only the coordinate triples.
    (tmp_path / "blanky.mtx").write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "\n"
        "3 3 2\n"
        "\n"
        "1 2 5.0\n"
        "2 1 7.5\n"
    )
    via_format = sorted(
        (r["i"], r["j"], r["weight"])
        for r in registered.read.format("matrixmarket")
        .load(str(tmp_path / "blanky.mtx"))
        .collect()
    )
    via_plain = sorted(
        (r["i"], r["j"], r["weight"])
        for r in read_matrix_market(
            registered, str(tmp_path / "blanky.mtx")
        ).collect()
    )
    assert via_format == via_plain == [(1, 2, 5.0), (2, 1, 7.5)]


def test_datasource_missing_path_fails_fast(registered, tmp_path):
    # Non-glob bad paths raise on the driver during planning, not as an
    # opaque executor task failure (ADVICE r4).
    df = registered.read.format("matrixmarket").load(
        str(tmp_path / "nope.mtx")
    )
    with pytest.raises(Exception, match="not a readable file"):
        df.collect()
    with pytest.raises(Exception, match="no files match"):
        registered.read.format("matrixmarket").load(
            str(tmp_path / "*.nothing")
        ).collect()


def test_arrowipc_roundtrip_schema_and_values(registered, tmp_path):
    import datetime

    import pyarrow as pa
    import pyarrow.ipc as ipc

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["a", "b", None]),
            "score": pa.array([1.5, None, 3.25], pa.float64()),
            "flag": pa.array([True, False, True]),
            "day": pa.array(
                [datetime.date(2024, 1, i + 1) for i in range(3)]
            ),
        }
    )
    path = tmp_path / "part0.arrow"
    with ipc.new_file(str(path), t.schema) as w:
        w.write_table(t)
    df = registered.read.format("arrowipc").load(str(path))
    assert [f.simpleString() for f in df.schema.fields] == [
        "id:bigint",
        "name:string",
        "score:double",
        "flag:boolean",
        "day:date",
    ]
    rows = {tuple(r) for r in df.collect()}
    assert rows == {
        (1, "a", 1.5, True, datetime.date(2024, 1, 1)),
        (2, "b", None, False, datetime.date(2024, 1, 2)),
        (3, None, 3.25, True, datetime.date(2024, 1, 3)),
    }


def test_arrowipc_glob_is_one_partition_per_file(registered, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    for i in range(3):
        t = pa.table({"v": pa.array([i * 10, i * 10 + 1], pa.int64())})
        with ipc.new_file(str(tmp_path / f"f{i}.arrow"), t.schema) as w:
            w.write_table(t)
    df = registered.read.format("arrowipc").load(str(tmp_path / "*.arrow"))
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["v"] for r in df.collect()) == [0, 1, 10, 11, 20, 21]


def test_arrowipc_missing_file_fails_on_driver(registered, tmp_path):
    import pytest as _pytest

    with _pytest.raises(Exception, match="not a readable file"):
        registered.read.format("arrowipc").load(
            str(tmp_path / "nope.arrow")
        ).count()


def test_arrowipc_write_then_read_roundtrip(registered, tmp_path):
    out = str(tmp_path / "sink")
    df = registered.range(100).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS dbl", "CAST(id AS STRING) AS s"
    ).repartition(4)
    df.write.format("arrowipc").mode("append").save(out)
    import glob as _glob

    files = sorted(_glob.glob(out + "/part-*.arrow"))
    assert len(files) == 4  # one IPC file per partition
    back = registered.read.format("arrowipc").load(out + "/*.arrow")
    assert [f.simpleString() for f in back.schema.fields] == [
        "id:bigint",
        "dbl:double",
        "s:string",
    ]
    assert back.count() == 100
    assert {tuple(r) for r in back.collect()} == {
        (i, float(i * 2), str(i)) for i in range(100)
    }
