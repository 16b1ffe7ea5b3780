"""Spark Python DataSource wrappers for the engine's custom formats.

The reference reads its custom formats through driver-side Python loops
(``scipy.io.mmread`` at bin/concatenate.py:313, ``h5py.File`` at
bin/concatenate.py:152). Here the same formats are REGISTERED Spark
sources via the Python DataSource API (Spark 4), so they compose with
the whole DataFrame surface the way parquet does::

    spark.dataSource.register(MatrixMarketDataSource)
    spark.read.format("matrixmarket").load("/data/*.mtx")

    spark.dataSource.register(MiniHDF5DataSource)
    spark.read.format("minihdf5").option("dataset", "/X").load("/data/*.h5")

Scale shape: ``partitions()`` expands the glob ON THE DRIVER (metadata
only) and emits one ``InputPartition`` per file — the natural split for
both formats (HDF5 is unsplittable; .mtx files are small-many in the
reference's layout). Each executor task parses only its own file and
yields plain tuples, which Spark batches to Arrow. Filters/column
pruning still apply above the scan; for the long-form output that is
what matters (the expensive part — decode — is O(file), unavoidable).

Functional parity with the plain readers (``sources/matrix_market.
read_matrix_market``, ``sources/minihdf5.Reader``) is pinned by
tests/test_spark_datasource.py.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _expand(path: str) -> list[str]:
    if any(ch in path for ch in "*?["):
        paths = sorted(glob.glob(path))
        if not paths:
            raise FileNotFoundError(f"no files match {path!r}")
        return paths
    # Non-glob paths fail fast on the DRIVER during planning instead of
    # surfacing as an opaque executor task failure in read() (ADVICE r4).
    if not os.path.isfile(path):
        raise FileNotFoundError(f"not a readable file: {path!r}")
    return [path]


# ---------------------------------------------------------------------------
# matrixmarket
# ---------------------------------------------------------------------------


class MatrixMarketReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("matrixmarket source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _expand(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        name = os.path.basename(partition.path)
        with open(partition.path) as f:
            body = False
            for line in f:
                line = line.strip()
                if not line or line.startswith("%"):
                    continue
                if not body:  # first non-comment line is the size line
                    body = True
                    continue
                fields = line.split()
                weight = float(fields[2]) if len(fields) > 2 else 1.0
                yield (name, int(fields[0]), int(fields[1]), weight)


class MatrixMarketDataSource(DataSource):
    """``spark.read.format("matrixmarket")`` — COO triples per file."""

    @classmethod
    def name(cls) -> str:
        return "matrixmarket"

    def schema(self) -> str:
        return "source_file string, i long, j long, weight double"

    def reader(self, schema) -> MatrixMarketReader:
        return MatrixMarketReader(self.options)


# ---------------------------------------------------------------------------
# minihdf5
# ---------------------------------------------------------------------------


class MiniHDF5Reader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("minihdf5 source requires a path")
        self.dataset = options.get("dataset", "/X")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _expand(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # import inside read(): runs on the executor, keeps the
        # DataSource class picklable with no heavy closure
        from codex_data_products_spark.sources.minihdf5 import Reader

        name = os.path.basename(partition.path)
        with open(partition.path, "rb") as f:
            reader = Reader(f.read())
        arr = reader.dataset(self.dataset)
        if arr.ndim == 1:
            for r, v in enumerate(arr.tolist()):
                yield (name, r, 0, float(v))
        else:
            for r, rowvals in enumerate(arr.tolist()):
                for c, v in enumerate(rowvals):
                    yield (name, r, c, float(v))


class MiniHDF5DataSource(DataSource):
    """``spark.read.format("minihdf5")`` — long-form (row, col, value)
    rows of one dataset per classic-format HDF5 file, decoded by the
    pure-Python ``sources/minihdf5.py`` codec (public HDF5 spec subset,
    no h5py)."""

    @classmethod
    def name(cls) -> str:
        return "minihdf5"

    def schema(self) -> str:
        return "source_file string, row long, col long, value double"

    def reader(self, schema) -> MiniHDF5Reader:
        return MiniHDF5Reader(self.options)





# ---------------------------------------------------------------------------
# arrowipc — Arrow IPC / Feather v2 files as a registered source
# ---------------------------------------------------------------------------

_ARROW_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _arrow_schema_ddl(path: str) -> str:
    """Spark DDL for an IPC file's schema (metadata-only driver read)."""
    import pyarrow.ipc as ipc

    with ipc.open_file(path) as rd:
        sch = rd.schema
    cols = []
    for field in sch:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t in _ARROW_DDL:
            ddl = _ARROW_DDL[t]
        else:
            raise ValueError(
                f"arrowipc: unsupported Arrow type {t!r} for column"
                f" {field.name!r}"
            )
        cols.append(f"`{field.name}` {ddl}")
    return ", ".join(cols)


class ArrowIPCReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _expand(self.path)]

    def read(self, partition: _FilePartition) -> Iterator:
        # Yield pyarrow RecordBatches directly — the zero-copy fast
        # path of the Python DataSource API (no per-row Python tuples;
        # Spark consumes the Arrow buffers as-is).
        import pyarrow.ipc as ipc

        with ipc.open_file(partition.path) as rd:
            for i in range(rd.num_record_batches):
                yield rd.get_batch(i)


class _ArrowWriteDone(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path, self.rows = path, rows


class ArrowIPCWriter(DataSourceWriter):
    """One .arrow file per partition under the target directory —
    the mirror of the reader's one-partition-per-file split."""

    def __init__(self, options: dict, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc sink requires a path")
        self.schema = schema

    def write(self, iterator) -> "_ArrowWriteDone":
        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        pid = TaskContext.get().partitionId()
        arrow_schema = to_arrow_schema(self.schema)
        rows = [tuple(r) for r in iterator]
        cols = list(zip(*rows)) if rows else [[] for _ in arrow_schema]
        table = pa.Table.from_arrays(
            [
                pa.array(list(c), f.type)
                for f, c in zip(arrow_schema, cols)
            ],
            schema=arrow_schema,
        )
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.arrow")
        with ipc.new_file(out, arrow_schema) as w:
            w.write_table(table)
        return _ArrowWriteDone(out, len(rows))

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ArrowIPCDataSource(DataSource):
    """``spark.read.format("arrowipc")`` — Arrow IPC (Feather v2)
    files; one InputPartition per file, record batches passed to Spark
    without row-level materialization. Schema is inferred from the
    first file's IPC metadata on the driver (footer read only — no
    data IO at planning time)."""

    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self) -> str:
        return _arrow_schema_ddl(_expand(self.options.get("path"))[0])

    def reader(self, schema) -> ArrowIPCReader:
        return ArrowIPCReader(self.options)

    def writer(self, schema, overwrite: bool) -> ArrowIPCWriter:
        return ArrowIPCWriter(self.options, schema)


# ---------------------------------------------------------------------------
# eventgen — deterministic streaming source
# ---------------------------------------------------------------------------

_GEN_TYPES = ("view", "click", "purchase", "refund")
_GEN_EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00Z


def _gen_row(i: int) -> tuple:
    """Row i of the synthetic stream — a pure function of i (Knuth
    multiplicative hash), so any offset range replays identically."""
    import datetime

    h = (i * 2654435761) % 4294967296
    ts = datetime.datetime.fromtimestamp(
        (_GEN_EPOCH_US + i * 7_000_000) / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (i, ts, h % 50, _GEN_TYPES[h % 4], (h % 10000) / 10.0)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class EventGenStreamReader(DataSourceStreamReader):
    """Offset-tracked deterministic generator. Offsets are row
    positions; ``latestOffset`` exposes the full bounded range, so an
    availableNow drain plans one micro-batch whose ``partitions`` split
    the offset range into ``batchrows`` chunks — each chunk generated
    IN PARALLEL on executors as a pure function of its offsets. Any
    committed range therefore replays bit-identically from the
    checkpoint alone — the contract a real broker-backed source (Kafka)
    provides, demonstrated with pure arithmetic."""

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("rows", 1000))
        self.batch = int(options.get("batchrows", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": self.total}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        return [
            _RangePartition(a, min(a + self.batch, hi))
            for a in range(lo, hi, self.batch)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return iter(
            [_gen_row(i) for i in range(partition.start, partition.end)]
        )

    def commit(self, end: dict) -> None:
        pass


class EventGenDataSource(DataSource):
    """``spark.readStream.format("eventgen")`` — bounded deterministic
    event stream for pipeline tests and backfill rehearsals."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        )

    def streamReader(self, schema) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


def register_all(spark) -> None:
    """Register every engine data source on a session."""
    spark.dataSource.register(MatrixMarketDataSource)
    spark.dataSource.register(MiniHDF5DataSource)
    spark.dataSource.register(EventGenDataSource)
    spark.dataSource.register(ArrowIPCDataSource)
