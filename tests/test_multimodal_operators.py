"""operators.multimodal: plumbing correctness independent of any codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codex_data_products_spark.operators.multimodal import (
    av_metadata,
    fake_av_codec,
    fake_image_codec,
    image_metadata,
    real_av_codec,
    real_image_codec,
    resize_plan,
    sample_frames,
)


@pytest.fixture()
def assets(spark):
    rows = [(i, f"payload-{i}".encode()) for i in range(20)]
    return spark.createDataFrame(rows, "asset_id long, payload binary")


def test_real_codec_hooks_are_gated():
    with pytest.raises(NotImplementedError):
        real_image_codec(b"x")
    with pytest.raises(NotImplementedError):
        real_av_codec(b"x")


def test_image_metadata_schema_and_determinism(spark, assets):
    out = image_metadata(assets)
    assert [f.name for f in out.schema.fields] == [
        "asset_id", "n_bytes", "width", "height", "channels", "n_pixels",
    ]
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # row-local → repartitioning must not change any value
    rows2 = {r["asset_id"]: r for r in image_metadata(assets.repartition(7)).collect()}
    assert rows == rows2
    m = fake_image_codec(b"payload-3")
    assert rows[3]["width"] == m["width"] and rows[3]["height"] == m["height"]
    assert rows[3]["n_pixels"] == m["width"] * m["height"]


def test_resize_plan_fits_target(spark, assets):
    for r in resize_plan(assets, target=224).collect():
        assert max(r["dst_width"], r["dst_height"]) == 224
        assert 0 < r["scale"] <= 14  # 224/16 max upscale


def test_frame_sample_counts(spark, assets):
    meta = av_metadata(assets)
    frames = sample_frames(meta, stride=10)
    n_frames = {r["asset_id"]: r["n_frames"] for r in meta.collect()}
    got = (
        frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    for r in got:
        expect = (n_frames[r["asset_id"]] - 1) // 10 + 1
        assert r["n"] == expect
    # frame timestamps follow the fake 25 fps clock
    ts = {
        (r["asset_id"], r["frame_idx"]): r["frame_ts_ms"]
        for r in frames.collect()
    }
    for (aid, idx), v in ts.items():
        assert v == idx * 40.0


def test_av_metadata_matches_codec(spark, assets):
    rows = {r["asset_id"]: r for r in av_metadata(assets).collect()}
    m = fake_av_codec(b"payload-7")
    assert rows[7]["n_frames"] == m["n_frames"]
    assert rows[7]["rms"] == m["rms"]
    assert rows[7]["duration_ms"] == m["duration_ms"]
