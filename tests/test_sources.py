"""Direct unit tests for the source readers (edge cases the pipeline
fixtures don't reach)."""

from __future__ import annotations

import pytest

from codex_data_products_spark.sources.expression_csv import (
    melt_expression,
    read_channel_names,
    read_expression_wide,
)
from codex_data_products_spark.sources.labels import read_labels
from codex_data_products_spark.sources.matrix_market import read_matrix_market
from codex_data_products_spark.sources.positional_text import (
    read_lines_with_positions,
)


def test_matrix_market_comments_size_line_and_pattern(spark, tmp_path):
    # multiple comment lines, blank line, and a *pattern* matrix
    # (no weight column → weight defaults to 1.0)
    p = tmp_path / "m.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% generated fixture\n"
        "\n"
        "4 4 3\n"
        "1 2\n"
        "2 3 0.25\n"
        "4 4\n"
    )
    rows = {
        (r["i"], r["j"]): r["weight"]
        for r in read_matrix_market(spark, str(p)).collect()
    }
    assert rows == {(1, 2): 1.0, (2, 3): 0.25, (4, 4): 1.0}


def test_matrix_market_multi_file_separation(spark, tmp_path):
    (tmp_path / "a.mtx").write_text("%%h\n2 2 1\n1 2 5.0\n")
    (tmp_path / "b.mtx").write_text("%%h\n2 2 1\n2 1 7.0\n")
    out = read_matrix_market(
        spark, str(tmp_path / "*.mtx"), with_source_file=True
    ).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r["source_file"].rsplit("/", 1)[-1], []).append(
            (r["i"], r["j"], r["weight"])
        )
    assert by_file == {"a.mtx": [(1, 2, 5.0)], "b.mtx": [(2, 1, 7.0)]}


def test_positional_reader_preserves_order_and_skips_blanks(spark, tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("10\n\n20\n30\n\n")
    got = [
        (r["pos"], r["line"])
        for r in read_lines_with_positions(spark, str(p))
        .orderBy("pos")
        .collect()
    ]
    # blank lines are dropped but positions keep the original numbering
    assert got == [(1, "10"), (3, "20"), (4, "30")]


def test_read_labels_positions_are_matrix_coordinates(spark, tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("7\n8\n9\n")
    got = {
        r["pos"]: r["cell_id"] for r in read_labels(spark, str(p)).collect()
    }
    assert got == {1: "7", 2: "8", 3: "9"}


def test_expression_csv_header_capture_and_melt(spark, tmp_path):
    p = tmp_path / "expr.csv"
    p.write_text("ID,CD4,blank1\n1,1.5,0.0\n2,2.5,0.1\n")
    assert read_channel_names(str(p)) == ["CD4", "blank1"]
    wide = read_expression_wide(spark, str(p))
    assert wide.columns == ["original_obs_id", "CD4", "blank1"]
    long = {
        (r["original_obs_id"], r["channel"]): r["total"]
        for r in melt_expression(wide).collect()
    }
    assert long == {
        ("1", "CD4"): 1.5,
        ("1", "blank1"): 0.0,
        ("2", "CD4"): 2.5,
        ("2", "blank1"): 0.1,
    }


def test_hdf5_real_decoder_is_gated():
    from codex_data_products_spark.sources.hdf5 import h5py_decoder

    with pytest.raises((NotImplementedError, Exception)):
        h5py_decoder(b"not-hdf5", "x/out.hdf5")


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_interchange_format_roundtrip(spark, sf_dir, fmt, tmp_path):
    """The engine's products must survive every mainstream interchange
    format, not just parquet: ORC (columnar peers), JSON lines
    (downstream tooling), CSV with header (the reference's own TSV
    world). Typed columns re-read losslessly; CSV re-applies the schema
    on read since it is untyped on disk."""
    from codex_data_products_spark.tables import table as T

    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    out = str(tmp_path / f"orders_{fmt}")
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(out)
        back = (
            spark.read.schema(src.schema).option("header", True).csv(out)
        )
    elif fmt == "json":
        writer.json(out)
        back = spark.read.schema(src.schema).json(out)
    else:
        writer.orc(out)
        back = spark.read.orc(out)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
