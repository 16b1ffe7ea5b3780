"""Multimodal column operators: image / audio / video as opaque binary.

The data model (SURVEY extension mandate): a multimodal asset is a row
with an id, a ``binary`` payload column, and typed metadata columns. All
heavy per-asset work (decode, resize, frame sampling, feature
extraction) runs as Arrow-batched ``mapInPandas`` stages — one payload
per row, vectorized batch transfer, no driver collect — which is exactly
the production shape for codec work Spark's built-ins can't express.

This container ships no image/audio/video codecs, so the *real* codec
path is a clearly-marked hook that raises ``NotImplementedError``; the
default codec is a **deterministic fake** that derives every property
from ``md5(payload)``. That makes the whole pipeline testable end-to-end
(and even SQL-oracle-checkable: DuckDB can replicate the md5 math),
while the Spark-side plumbing — schemas, batching, partitioning, UDF
signatures — is the real thing you would run with Pillow/ffmpeg on a
cluster.

Scale notes (100 TB of assets):
  * payloads stay in executor memory one Arrow batch at a time; cap
    batch size via ``spark.sql.execution.arrow.maxRecordsPerBatch`` when
    assets are large (e.g. 64 for ~10 MB images);
  * decode stages are CPU-bound → repartition the scan to cluster width
    first (see ``tables.spread``); no shuffle is needed afterwards since
    every operator here is row-local;
  * frame sampling explodes rows; it happens *after* the per-video
    decode so the exploded frames never re-enter a Python stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- codecs ----------------------------------------------------------------

# A codec maps a binary payload to a property dict. Real codecs are
# injected here when the runtime has the libraries; everything else in
# this module is codec-agnostic.
Codec = Callable[[bytes], dict]


def real_image_codec(payload: bytes) -> dict:
    """Real image decode. Uncompressed 24-bit BMP, 8-bit truecolor PNG
    (all 5 scanline filters, DEFLATE via stdlib zlib), LZW-compressed
    GIF, and baseline-sequential JPEG (SOF0, Annex K Huffman +
    quantization tables, 4:4:4/grayscale) are handled natively by the
    from-scratch spec codecs (``operators/codecs.py`` — the minihdf5
    approach: real public byte formats, no third-party decoder).
    Progressive JPEG and exotic profiles still need a Pillow/opencv
    Codec injected with the same return keys (width, height,
    channels)."""
    if payload[:2] == b"BM":
        from codex_data_products_spark.operators.codecs import decode_bmp

        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from codex_data_products_spark.operators.codecs import decode_png

        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from codex_data_products_spark.operators.codecs import decode_gif

        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI marker
        from codex_data_products_spark.operators.codecs import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "unrecognized image payload (BMP, PNG, GIF and baseline JPEG "
        "decode natively); inject a Pillow/opencv-backed Codec with "
        "the same return keys (width, height, channels) for other "
        "formats"
    )


def real_av_codec(payload: bytes) -> dict:
    """Real audio decode. RIFF/WAVE 16-bit PCM and COMPRESSED G.711
    μ-law/A-law (format codes 7/6, ITU-T G.711 expansion implemented
    from the spec) are handled natively by the from-scratch codecs
    (``operators/codecs.py``); perceptual codecs (MP3/AAC/Opus) and
    video still need an ffmpeg-backed Codec injected."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from codex_data_products_spark.operators.codecs import decode_wav

        return decode_wav(payload)
    raise NotImplementedError(
        "no perceptual-a/v codec in this container (PCM and G.711 "
        "WAV decode natively); inject an ffmpeg-backed Codec with the "
        "same return keys (n_frames, fps, duration_ms, sample_rate, rms)"
    )


def _md5_fields(payload: bytes) -> list[int]:
    """Four 16-bit ints from md5(payload) — the fake codec's entropy.

    Kept bit-identical to the SQL replication used by the oracle
    queries: field i = int(md5_hex[4*i : 4*i+4], 16).
    """
    hx = hashlib.md5(payload).hexdigest()
    return [int(hx[i : i + 4], 16) for i in (0, 4, 8, 12)]


def fake_image_codec(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder."""
    a, b, _, _ = _md5_fields(payload)
    return {"width": 16 + a % 240, "height": 16 + b % 240, "channels": 3}


def fake_av_codec(payload: bytes) -> dict:
    """Deterministic stand-in for an audio/video demuxer."""
    _, _, c, d = _md5_fields(payload)
    return {
        "n_frames": 1 + c % 60,
        "fps": 25.0,
        "duration_ms": 40 * (1 + c % 60),  # n_frames / fps
        "sample_rate": 16000,
        # no rounding: d/10000.0 is the same IEEE double in every engine
        "rms": (d % 10000) / 10000.0,
    }


# --- operators -------------------------------------------------------------

IMAGE_META_SCHEMA = (
    "asset_id long, n_bytes long, width long, height long, "
    "channels long, n_pixels long"
)


def image_metadata(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    codec: Codec = fake_image_codec,
) -> DataFrame:
    """Decode image headers → (asset_id, n_bytes, width, height,
    channels, n_pixels). One Arrow-batched pandas stage, row-local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [codec(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                }
            )
            out["n_pixels"] = out["width"] * out["height"]
            yield out.astype("int64")

    return assets.select(id_col, payload_col).mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


RESIZE_SCHEMA = (
    "asset_id long, src_width long, src_height long, "
    "dst_width long, dst_height long, scale double"
)


def resize_plan(
    assets: DataFrame,
    target: int = 224,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    codec: Codec = fake_image_codec,
) -> DataFrame:
    """Aspect-preserving resize-to-fit: the decode runs in Python, the
    geometry is emitted per asset. A real pipeline would also emit the
    resized bytes; the byte re-encode is codec work stubbed with the
    decode (same batch, same row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            import math

            rows = []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                m = codec(bytes(p))
                w, h = m["width"], m["height"]
                scale = target / max(w, h)
                # floor(x + 0.5), not round(): python round() is
                # banker's, SQL round() is half-away — floor+0.5 is the
                # one halfway rule every engine computes identically
                rows.append(
                    {
                        "asset_id": int(aid),
                        "src_width": w,
                        "src_height": h,
                        "dst_width": max(1, math.floor(w * scale + 0.5)),
                        "dst_height": max(1, math.floor(h * scale + 0.5)),
                        "scale": math.floor(scale * 1e6 + 0.5) / 1e6,
                    }
                )
            yield pd.DataFrame(rows)

    return assets.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


VIDEO_META_SCHEMA = (
    "asset_id long, n_frames long, fps double, duration_ms long, "
    "sample_rate long, rms double"
)


def av_metadata(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    codec: Codec = fake_av_codec,
) -> DataFrame:
    """Demux audio/video container metadata + an audio feature (rms)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [codec(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_frames": [m["n_frames"] for m in metas],
                    "fps": [m["fps"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "rms": [m["rms"] for m in metas],
                }
            )

    return assets.select(id_col, payload_col).mapInPandas(
        run, schema=VIDEO_META_SCHEMA
    )


def sample_frames(video_meta: DataFrame, stride: int = 10) -> DataFrame:
    """Explode every ``stride``-th frame index per video.

    Pure column expressions (sequence + explode) — the decode already
    happened; the frame fan-out is JVM-side so 100 TB of videos never
    round-trips Python twice. Output: (asset_id, frame_idx, frame_ts_ms).
    """
    idx = F.explode(
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(stride)
        )
    ).alias("frame_idx")
    return video_meta.select("asset_id", "n_frames", "fps", idx).select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.round(F.col("frame_idx") * 1000.0 / F.col("fps"), 3).alias(
            "frame_ts_ms"
        ),
    )


def md5_field_sql(payload_sql: str, i: int) -> str:
    """DuckDB replication of ``_md5_fields(payload)[i]`` for oracles."""
    return (
        f"CAST(concat('0x', substring(md5({payload_sql}), {4 * i + 1}, 4)) "
        f"AS BIGINT)"
    )
