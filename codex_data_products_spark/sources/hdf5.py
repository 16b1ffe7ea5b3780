"""HDF5 expression-matrix ingest — SURVEY.md §2.1 S4 / §2.11.

The reference opens each ``out.hdf5`` with pandas HDFStore and tries two
key layouts (bin/concatenate.py:239-264):

  /total/channel/cell/expressions.ome.tiff/stitched/reg1  (+ matching /meanAll/...)
  /total/channel/cell/expr.ome.tiff/reg001                (+ matching /meanAll/...)

Spark has no native HDF5 source, so this is the one legitimate
pandas-UDF boundary: ``binaryFile`` rows → ``mapInPandas`` decode → long
rows (dataset, original_obs_id, channel_idx, total, mean). One file per
task (HDF5 is not splittable); parallelism = number of datasets, which
matches the reference's unit of work.

The byte→matrix decoder is injectable: the default uses ``h5py`` when
available and otherwise the built-in pure-Python classic-format subset
codec (``sources/minihdf5.py``), so the two-key fallback runs against
real HDF5 bytes even in containers without h5py. Tests also inject a
fake-format decoder to exercise the Spark plumbing (binary scan, Arrow
batching, schema, per-file tasks) independently of any byte format.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# decoder(payload, path) -> pandas DataFrame with columns
#   original_obs_id (str), channel_idx (int), total (float), mean (float)
Decoder = Callable[[bytes, str], pd.DataFrame]

TOTAL_KEYS = (
    "/total/channel/cell/expressions.ome.tiff/stitched/reg1",
    "/total/channel/cell/expr.ome.tiff/reg001",
)
MEAN_KEYS = (
    "/meanAll/channel/cell/expressions.ome.tiff/stitched/reg1",
    "/meanAll/channel/cell/expr.ome.tiff/reg001",
)

DECODED_SCHEMA = (
    "dataset string, original_obs_id string, channel_idx int, "
    "total double, mean double"
)


def _matrices_to_long(total, mean, index=None) -> pd.DataFrame:
    """(n_cells × n_channels) total/mean matrices → long rows.

    ``original_obs_id`` comes from the stored DataFrame index when the
    file carries one (pandas-HDFStore layout — the reference reads the
    matrix through HDFStore and takes ``adata.obs.index`` from it,
    bin/concatenate.py:264-269), else falls back to row positions for
    plain 2-D matrix files."""
    import numpy as np

    n_cells, n_channels = total.shape
    raw_ids = (
        np.asarray(index) if index is not None else np.arange(n_cells)
    )
    ids = np.repeat(np.asarray(raw_ids).astype(str), n_channels)
    ch = np.tile(np.arange(n_channels), n_cells)
    return pd.DataFrame(
        {
            "original_obs_id": ids,
            "channel_idx": ch,
            "total": np.asarray(total).ravel(),
            "mean": np.asarray(mean).ravel(),
        }
    )


def h5py_decoder(payload: bytes, path: str) -> pd.DataFrame:
    """Real decoder: two-key-variant fallback over an HDF5 payload.

    Prefers h5py (full-format coverage). Without it, falls back to the
    built-in pure-Python classic-format subset reader
    (``sources/minihdf5.py``) — enough for uncompressed contiguous
    f64 matrices, which is what the reference's own writer emits —
    and raises ValueError for files outside that subset.
    """
    try:
        import h5py  # noqa: F401
    except ImportError:
        from codex_data_products_spark.sources import minihdf5

        reader = minihdf5.Reader(bytes(payload))
        for tk, mk in zip(TOTAL_KEYS, MEAN_KEYS):
            # pandas-HDFStore 'fixed' layout: the key is a group with
            # axis1 (the DataFrame index = cell ids) + block0_values
            if f"{tk}/block0_values" in reader:
                return _matrices_to_long(
                    reader.dataset(f"{tk}/block0_values"),
                    reader.dataset(f"{mk}/block0_values"),
                    index=reader.dataset(f"{tk}/axis1"),
                )
            if tk in reader:  # plain 2-D matrix → positional ids
                return _matrices_to_long(
                    reader.dataset(tk), reader.dataset(mk)
                )
        raise ValueError(f"no known matrix key in {path}")
    import io

    import numpy as np

    with h5py.File(io.BytesIO(payload), "r") as f:  # pragma: no cover
        for tk, mk in zip(TOTAL_KEYS, MEAN_KEYS):
            if f"{tk}/block0_values" in f:
                return _matrices_to_long(
                    np.asarray(f[f"{tk}/block0_values"]),
                    np.asarray(f[f"{mk}/block0_values"]),
                    index=np.asarray(f[f"{tk}/axis1"]),
                )
            if tk in f:
                return _matrices_to_long(np.asarray(f[tk]), np.asarray(f[mk]))
    raise ValueError(f"no known matrix key in {path}")  # pragma: no cover


def dataset_uuid_from_path(path: str) -> str:
    """E10: the dataset uuid is the parent directory name
    (hdf5_store.parent.stem, bin/concatenate.py:232)."""
    parts = path.rstrip("/").split("/")
    return parts[-2] if len(parts) >= 2 else path


def read_hdf5_expression(
    spark: SparkSession,
    path_glob: str,
    decoder: Decoder = h5py_decoder,
) -> DataFrame:
    """Distributed HDF5 ingest: one decode task per file.

    Output is the long-format expression relation keyed by
    (dataset, original_obs_id, channel_idx); channel *names* come from
    the per-dataset CSV header (S3) and are joined on position later.
    """
    binary = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, payload in zip(pdf["path"], pdf["content"]):
                out = decoder(bytes(payload), path)
                out = out.assign(dataset=dataset_uuid_from_path(path))
                yield out[
                    ["dataset", "original_obs_id", "channel_idx", "total", "mean"]
                ]

    # One file per Arrow batch row; repartition so each file decodes in
    # its own task (binaryFile packs small files into shared splits).
    return binary.repartition("path").mapInPandas(decode, DECODED_SCHEMA)


def convert_hdf5_to_parquet(
    spark: SparkSession,
    path_glob: str,
    out_path: str,
    decoder: Decoder = h5py_decoder,
) -> None:
    """Offline converter: decode every matched ``out.hdf5`` once and
    land the long-format relation as parquet partitioned by dataset.

    At 100 TB the HDF5→parquet hop is a one-time cost that buys every
    later query predicate pushdown, column pruning, and splittable
    scans — none of which HDF5 offers. Partitioning by dataset keeps
    per-dataset re-runs (the reference's unit of work) incremental.
    """
    (
        read_hdf5_expression(spark, path_glob, decoder=decoder)
        .write.mode("overwrite")
        .partitionBy("dataset")
        .parquet(out_path)
    )
