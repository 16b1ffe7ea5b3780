"""Minimal pure-Python HDF5 codec (classic-format subset).

The reference reads ``out.hdf5`` expression matrices with pandas
HDFStore / h5py (bin/concatenate.py:239-264). This container ships
neither, so the "real bytes" decode branch of ``sources/hdf5.py``
would otherwise be unreachable. This module implements the smallest
useful subset of the *public* HDF5 File Format Specification
(version 0 superblock, v1 object headers, v1 group B-trees, local
heaps, symbol-table nodes, contiguous little-endian float64
datasets) so that:

  * ``write`` produces a spec-layout HDF5 byte string containing
    nested groups and 2-D float64 matrices — the byte-level fixture
    for the two-key-fallback decoder tests;
  * ``Reader`` walks group paths and materializes datasets from those
    bytes (and from any classic-format file restricted to the same
    subset: uncompressed, unchunked, f64le).

Round 4 adds fixed-length null-terminated strings (datatype class 3,
spec IV.A.2.d) so the ``.h5mu`` compat export (plans/codex_pipeline.
export_h5mu) can serialize obs/var index columns without h5py.

Scope is deliberately narrow — no chunking, no filters, no attribute
messages, no v2+ headers, no variable-length strings. Files outside
the subset raise ValueError so callers can fall back to a full h5py
decode where available.
"""

from __future__ import annotations

import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# Object header message types (HDF5 spec IV.A.2)
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_LAYOUT = 0x0008
_MSG_SYMBOL_TABLE = 0x0011


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


class _Buf:
    def __init__(self) -> None:
        self.b = bytearray()

    def alloc(self, size: int) -> int:
        addr = len(self.b)
        self.b += b"\x00" * size
        return addr

    def put(self, addr: int, data: bytes) -> None:
        self.b[addr : addr + len(data)] = data

    def append(self, data: bytes) -> int:
        addr = len(self.b)
        self.b += data
        return addr


def _pad8(data: bytes) -> bytes:
    return data + b"\x00" * (-len(data) % 8)


def _object_header(messages: list[tuple[int, bytes]]) -> bytes:
    """Version-1 object header: 12-byte prologue + 4 pad + messages,
    each message 8-byte-aligned with an 8-byte message header."""
    body = b""
    for mtype, mdata in messages:
        mdata = _pad8(mdata)
        body += struct.pack("<HHB3x", mtype, len(mdata), 0) + mdata
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def _write_dataset(buf: _Buf, arr: np.ndarray) -> int:
    dspace = struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
        struct.pack("<Q", d) for d in arr.shape
    )
    if np.issubdtype(arr.dtype, np.str_):
        # fixed-length null-terminated UTF-8 strings (class 3 v1)
        encoded = [s.encode() for s in arr.ravel()]
        size = max((len(e) for e in encoded), default=0) + 1
        data = b"".join(e + b"\x00" * (size - len(e)) for e in encoded)
        data_addr = buf.append(data)
        dtype = bytes([0x13, 0x00, 0x00, 0x00]) + struct.pack("<I", size)
        layout = struct.pack("<BBQQ", 3, 1, data_addr, len(data))
        return buf.append(
            _object_header(
                [
                    (_MSG_DATASPACE, dspace),
                    (_MSG_DATATYPE, dtype),
                    (_MSG_LAYOUT, layout),
                ]
            )
        )
    is_int = np.issubdtype(arr.dtype, np.integer)
    wire = "<i8" if is_int else "<f8"
    data = np.ascontiguousarray(arr, dtype=wire).tobytes()
    data_addr = buf.append(data)
    if is_int:
        # I64LE: class 0 v1, LE, signed (bitfield bit 3), 64-bit
        dtype = (
            bytes([0x10, 0x08, 0x00, 0x00])
            + struct.pack("<I", 8)
            + struct.pack("<HH", 0, 64)
        )
    else:
        # IEEE f64le: class 1 v1, LE, mantissa-normalized (msb implied),
        # sign bit 63, exp at 52 (11 bits, bias 1023), mantissa at 0 (52)
        dtype = (
            bytes([0x11, 0x20, 63, 0x00])
            + struct.pack("<I", 8)
            + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        )
    layout = struct.pack("<BBQQ", 3, 1, data_addr, len(data))  # v3 contiguous
    oh = _object_header(
        [(_MSG_DATASPACE, dspace), (_MSG_DATATYPE, dtype), (_MSG_LAYOUT, layout)]
    )
    return buf.append(oh)


def _write_group(buf: _Buf, children: dict[str, int]) -> int:
    """Group = local heap (names) + SNOD (sorted entries) + 1-entry
    B-tree + object header carrying the symbol-table message."""
    names = sorted(children)
    heap_data = bytearray(8)  # offset 0 = the empty string
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
        heap_data += b"\x00" * (-len(heap_data) % 8)
    heap_data_addr = buf.append(bytes(heap_data))
    heap_addr = buf.append(
        b"HEAP"
        + b"\x00\x00\x00\x00"
        + struct.pack("<QQQ", len(heap_data), _UNDEF, heap_data_addr)
    )
    entries = b"".join(
        struct.pack("<QQII16x", name_off[n], children[n], 0, 0) for n in names
    )
    snod_addr = buf.append(
        b"SNOD" + struct.pack("<BxH", 1, len(names)) + entries
    )
    btree_addr = buf.append(
        b"TREE"
        + struct.pack("<BBH", 0, 0, 1)
        + struct.pack("<QQ", _UNDEF, _UNDEF)
        + struct.pack("<QQQ", 0, snod_addr, name_off[names[-1]])
    )
    st_msg = struct.pack("<QQ", btree_addr, heap_addr)
    return buf.append(_object_header([(_MSG_SYMBOL_TABLE, st_msg)]))


def write(datasets: dict[str, np.ndarray]) -> bytes:
    """Serialize ``{"/a/b/mat": array, ...}`` as classic-format HDF5
    bytes (contiguous f64le / i64le datasets under nested groups)."""
    tree: dict = {}
    for path, arr in datasets.items():
        parts = [p for p in path.split("/") if p]
        if not parts:
            raise ValueError(f"empty dataset path {path!r}")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"{path!r} conflicts with a dataset")
        arr = np.asarray(arr)
        if np.issubdtype(arr.dtype, np.str_) or arr.dtype == object:
            node[parts[-1]] = arr.astype(np.str_)
        else:
            node[parts[-1]] = arr.astype(
                "<i8" if np.issubdtype(arr.dtype, np.integer) else "<f8"
            )

    buf = _Buf()
    buf.alloc(96)  # superblock placeholder at address 0

    def emit(node) -> int:
        if isinstance(node, dict):
            return _write_group(
                buf, {name: emit(child) for name, child in node.items()}
            )
        return _write_dataset(buf, node)

    root_oh = emit(tree)
    superblock = (
        _SIG
        + struct.pack("<BBBxB BBx HHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
        + struct.pack("<QQQQ", 0, _UNDEF, len(buf.b), _UNDEF)
        + struct.pack("<QQII16x", 0, root_oh, 0, 0)  # root entry, no cache
    )
    assert len(superblock) == 96
    buf.put(0, superblock)
    return bytes(buf.b)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class Reader:
    """Walk classic-format HDF5 bytes; subset-only (see module doc)."""

    def __init__(self, payload: bytes) -> None:
        self.b = payload
        if payload[:8] != _SIG:
            raise ValueError("not an HDF5 file (bad signature)")
        if payload[13] != 8 or payload[14] != 8:
            raise ValueError("unsupported offset/length size")
        # v0 superblock: root symbol-table entry at byte 56; its object
        # header address is the second 8-byte field
        self.root_oh = struct.unpack_from("<Q", payload, 56 + 8)[0]

    # -- low-level walkers ------------------------------------------------

    def _messages(self, oh_addr: int) -> list[tuple[int, bytes]]:
        version, n_msgs, _refs, hdr_size = struct.unpack_from(
            "<BxHII", self.b, oh_addr
        )
        if version != 1:
            raise ValueError(f"unsupported object header v{version}")
        out = []
        pos = oh_addr + 16  # 12-byte prologue + 4 pad
        end = pos + hdr_size
        while pos < end and len(out) < n_msgs:
            mtype, msize, _flags = struct.unpack_from("<HHB3x", self.b, pos)
            pos += 8
            out.append((mtype, self.b[pos : pos + msize]))
            pos += msize
        return out

    def _group_children(self, oh_addr: int) -> dict[str, int]:
        st = dict(self._messages(oh_addr)).get(_MSG_SYMBOL_TABLE)
        if st is None:
            return {}
        btree_addr, heap_addr = struct.unpack_from("<QQ", st, 0)
        if self.b[heap_addr : heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        heap_data_addr = struct.unpack_from("<Q", self.b, heap_addr + 24)[0]

        def heap_str(off: int) -> str:
            start = heap_data_addr + off
            end = self.b.index(b"\x00", start)
            return self.b[start:end].decode()

        children: dict[str, int] = {}

        def walk_btree(addr: int) -> None:
            if self.b[addr : addr + 4] != b"TREE":
                raise ValueError("bad B-tree signature")
            _ntype, level, n_used = struct.unpack_from("<BBH", self.b, addr + 4)
            pos = addr + 24  # past siblings
            for _ in range(n_used):
                child = struct.unpack_from("<Q", self.b, pos + 8)[0]
                pos += 16
                if level > 0:
                    walk_btree(child)
                else:
                    self._read_snod(child, heap_str, children)

        walk_btree(btree_addr)
        return children

    def _read_snod(self, addr: int, heap_str, children: dict[str, int]) -> None:
        if self.b[addr : addr + 4] != b"SNOD":
            raise ValueError("bad symbol table node signature")
        n_syms = struct.unpack_from("<H", self.b, addr + 6)[0]
        pos = addr + 8
        for _ in range(n_syms):
            name_off, oh = struct.unpack_from("<QQ", self.b, pos)
            children[heap_str(name_off)] = oh
            pos += 40

    def _resolve(self, path: str) -> int | None:
        node = self.root_oh
        for part in [p for p in path.split("/") if p]:
            kids = self._group_children(node)
            if part not in kids:
                return None
            node = kids[part]
        return node

    # -- public API -------------------------------------------------------

    def __contains__(self, path: str) -> bool:
        return self._resolve(path) is not None

    def dataset(self, path: str) -> np.ndarray:
        oh = self._resolve(path)
        if oh is None:
            raise KeyError(path)
        msgs = dict(self._messages(oh))
        if _MSG_DATASPACE not in msgs or _MSG_LAYOUT not in msgs:
            raise ValueError(f"{path!r} is not a dataset in the subset")
        dspace = msgs[_MSG_DATASPACE]
        version, rank = struct.unpack_from("<BB", dspace, 0)
        if version != 1:
            raise ValueError(f"unsupported dataspace v{version}")
        shape = struct.unpack_from(f"<{rank}Q", dspace, 8)
        dt = msgs[_MSG_DATATYPE]
        dt_class = dt[0] & 0x0F
        elem = struct.unpack_from("<I", dt, 4)[0]
        lv, lclass, addr, size = struct.unpack_from("<BBQQ", msgs[_MSG_LAYOUT], 0)
        if lv != 3 or lclass != 1:
            raise ValueError("only v3 contiguous layout is in the subset")
        n = int(np.prod(shape)) if shape else 1
        if size != elem * n:
            raise ValueError("layout size does not match dataspace")
        if dt_class == 3:  # fixed-length null-terminated strings
            raw = self.b[addr : addr + size]
            vals = [
                raw[i * elem : (i + 1) * elem].split(b"\x00", 1)[0].decode()
                for i in range(n)
            ]
            return np.array(vals, dtype=np.str_).reshape(shape)
        if elem != 8 or dt_class not in (0, 1):
            raise ValueError(
                "only f64le/i64le/fixed-string datasets are in the subset"
            )
        wire = "<i8" if dt_class == 0 else "<f8"
        return np.frombuffer(self.b, dtype=wire, count=n, offset=addr).reshape(
            shape
        )
