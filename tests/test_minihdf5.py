"""Byte-level HDF5 coverage: the two-key-fallback decode branch of
sources/hdf5.py exercised against REAL classic-format HDF5 bytes (no
injected fake decoder), via the pure-Python subset codec."""

from __future__ import annotations

import numpy as np
import pytest

from codex_data_products_spark.sources import minihdf5
from codex_data_products_spark.sources.hdf5 import (
    MEAN_KEYS,
    TOTAL_KEYS,
    convert_hdf5_to_parquet,
    h5py_decoder,
    read_hdf5_expression,
)


def _payload(variant: int, n_cells: int = 3, n_channels: int = 2) -> bytes:
    total = (
        np.arange(n_cells * n_channels, dtype=float).reshape(
            n_cells, n_channels
        )
        + 1.0
    )
    mean = total / 4.0
    return minihdf5.write(
        {TOTAL_KEYS[variant]: total, MEAN_KEYS[variant]: mean}
    )


def test_codec_roundtrip_nested_groups():
    a = np.array([[1.5, -2.0], [0.0, 3.25]])
    b = np.arange(6, dtype=float).reshape(2, 3)
    blob = minihdf5.write({"/g1/g2/a": a, "/top": b})
    r = minihdf5.Reader(blob)
    assert "/g1/g2/a" in r and "/top" in r
    assert "/g1/missing" not in r and "/nope" not in r
    assert np.array_equal(r.dataset("/g1/g2/a"), a)
    assert np.array_equal(r.dataset("/top"), b)
    with pytest.raises(KeyError):
        r.dataset("/nope")


def test_codec_rejects_non_hdf5():
    with pytest.raises(ValueError, match="signature"):
        minihdf5.Reader(b"not-hdf5-bytes")


@pytest.mark.parametrize("variant", [0, 1])
def test_decoder_two_key_fallback_on_real_bytes(variant):
    """bin/concatenate.py:239-264 semantics: try the stitched/reg1
    layout first, fall back to the reg001 layout — here against real
    HDF5 bytes, not an injected fake."""
    out = h5py_decoder(_payload(variant), f"ds{variant}/out.hdf5")
    assert list(out.columns) == [
        "original_obs_id",
        "channel_idx",
        "total",
        "mean",
    ]
    assert len(out) == 6  # 3 cells × 2 channels
    assert out["original_obs_id"].tolist() == ["0", "0", "1", "1", "2", "2"]
    assert out["channel_idx"].tolist() == [0, 1, 0, 1, 0, 1]
    assert out["total"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert out["mean"].tolist() == [x / 4.0 for x in out["total"]]


def test_decoder_raises_on_unknown_matrix_keys():
    blob = minihdf5.write({"/some/other/key": np.zeros((2, 2))})
    with pytest.raises(ValueError, match="no known matrix key"):
        h5py_decoder(blob, "x/out.hdf5")


def test_read_hdf5_expression_default_decoder_end_to_end(spark, tmp_path):
    """Distributed ingest over real HDF5 files with the DEFAULT decoder
    — one long relation, dataset uuid from the parent dir (E10)."""
    for i, uuid in enumerate(["uuid-aa", "uuid-bb"]):
        d = tmp_path / uuid
        d.mkdir()
        (d / "out.hdf5").write_bytes(_payload(i))
    df = read_hdf5_expression(spark, str(tmp_path / "*" / "out.hdf5"))
    rows = df.collect()
    assert len(rows) == 12
    assert {r["dataset"] for r in rows} == {"uuid-aa", "uuid-bb"}
    per_ds = {
        (r["dataset"], r["original_obs_id"], r["channel_idx"]): (
            r["total"],
            r["mean"],
        )
        for r in rows
    }
    assert per_ds[("uuid-aa", "0", 0)] == (1.0, 0.25)
    assert per_ds[("uuid-bb", "2", 1)] == (6.0, 1.5)


def test_convert_hdf5_to_parquet_partitions_by_dataset(spark, tmp_path):
    src = tmp_path / "src"
    for uuid in ["u1", "u2"]:
        d = src / uuid
        d.mkdir(parents=True)
        (d / "out.hdf5").write_bytes(_payload(0))
    out = str(tmp_path / "converted")
    convert_hdf5_to_parquet(spark, str(src / "*" / "out.hdf5"), out)
    back = spark.read.parquet(out)
    assert back.count() == 12
    parts = {p.name for p in (tmp_path / "converted").iterdir()}
    assert "dataset=u1" in parts and "dataset=u2" in parts


def test_decoder_reads_hdfstore_fixed_layout_index_ids():
    """pandas-HDFStore 'fixed' layout: the matrix key is a GROUP holding
    axis1 (the DataFrame index = real cell ids) and block0_values; the
    decoder must take original_obs_id from axis1 — the reference gets
    its obs index from the stored frame (bin/concatenate.py:264-269) —
    not from row positions."""
    total = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    mean = total / 10.0
    ids = np.array([1, 2, 7], dtype=np.int64)  # NOT 0..n-1
    blob = minihdf5.write(
        {
            f"{TOTAL_KEYS[0]}/axis1": ids,
            f"{TOTAL_KEYS[0]}/block0_values": total,
            f"{MEAN_KEYS[0]}/axis1": ids,
            f"{MEAN_KEYS[0]}/block0_values": mean,
        }
    )
    out = h5py_decoder(blob, "x/out.hdf5")
    assert out["original_obs_id"].tolist() == ["1", "1", "2", "2", "7", "7"]
    assert out["total"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def test_codex_product_builds_from_real_hdf5_bytes(spark, tmp_path):
    """Full CODEX product over real HDF5 bytes with the DEFAULT decoder
    (no injected fake anywhere): HDFStore-layout out.hdf5 written by
    the subset codec, ids aligned with the expression CSV."""
    from codex_data_products_spark.plans.codex_pipeline import build_product

    ds, anc = "d" * 32, "e" * 32
    d = tmp_path / "data" / ds
    d.mkdir(parents=True)
    stem = "reg1_stitched_expressions.ome.tiff"
    (d / f"{stem}-cell_channel_total.csv").write_text(
        "ID,CD4,CD8\n1,1.0,2.0\n2,3.0,4.0\n"
    )
    (d / f"{stem}-cell_centers.csv").write_text(
        "ID,x,y\n1,10.0,11.0\n2,20.0,21.0\n"
    )
    (d / f"{stem}_AdjacencyMatrix.mtx").write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n2 2 1\n1 2 1.0\n"
    )
    (d / f"{stem}_AdjacencyMatrixRowColLabels.txt").write_text("1\n2\n")
    total = np.array([[1.0, 2.0], [3.0, 4.0]])
    ids = np.array([1, 2], dtype=np.int64)
    (d / "out.hdf5").write_bytes(
        minihdf5.write(
            {
                f"{TOTAL_KEYS[0]}/axis1": ids,
                f"{TOTAL_KEYS[0]}/block0_values": total,
                f"{MEAN_KEYS[0]}/axis1": ids,
                f"{MEAN_KEYS[0]}/block0_values": total / 4.0,
            }
        )
    )
    a = tmp_path / "data" / anc
    a.mkdir()
    (a / "foo-antibodies.tsv").write_text(
        "antibody_name\tuniprot_accession_number\trr_id\tchannel_id\n"
        "Anti-CD4 antibody\tP01730\tAB_2\tch2\n"
        "CD8 antibody\tP01732\tAB_3\tch3\n"
    )
    (tmp_path / "uuids.tsv").write_text(
        "\tuuid\thubmap_id\timmediate_ancestor_ids\timmediate_descendant_ids"
        "\tage\tsex\theight\tweight\tbmi\tcause_of_death\trace\n"
        f"0\t{ds}\tHBM009\t{anc}\t\t50\tF\t170\t70\t24.2\t\tWhite\n"
        f"1\t{anc}\tHBM008\t\t['{ds}']\t\t\t\t\t\t\t\n"
    )
    product = build_product(
        spark,
        str(tmp_path / "data"),
        str(tmp_path / "uuids.tsv"),
        tissue="Spleen",
        product_uuid="real-bytes-product",
        creation_time="2026-01-01 00:00:00",
    )
    x = {
        (r["cell_id"], r["channel"]): (r["total"], r["mean"])
        for r in product.x_long.collect()
    }
    ds_prefix = ds
    assert x[(f"{ds_prefix}-1", "CD4")] == (1.0, 0.25)
    assert x[(f"{ds_prefix}-2", "CD8")] == (4.0, 1.0)
