"""Minimal HDF5 codec (pure stdlib + numpy).

SVHN's ``digitStruct.mat`` is a MATLAB v7.3 file, i.e. HDF5 (the reference
loader opens it with h5py: `doctr/datasets/svhn.py:82-100`); h5py is absent
in this container, so this module implements the subset of the PUBLIC HDF5
File Format Specification (v1.0 layout objects, the same structures h5py's
libhdf5 writes) needed to read those annotations — the same playbook as the
MAT v5 codec (`kernels/matv5.py`):

* superblock version 0 with 8-byte offsets/lengths,
* version-1 object headers with Dataspace (v1), Datatype (fixed-point,
  IEEE float64, object reference), contiguous Data Layout (v3) and Symbol
  Table messages,
* "old-style" groups: symbol-table message -> v1 B-tree (group nodes, any
  level) -> SNOD symbol-table nodes -> local heap for link names,
* object references as 8-byte object-header addresses.

The writer emits the same subset and exists for the fixture fabricators;
reader and writer are developed against the spec independently of any
h5py behavior (round-trip + structure tests in ``tests/test_hdf5.py``).
Everything outside the subset fails loudly (chunked/compact layouts,
new-style link messages, non-v0 superblocks).
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

# datatype classes (spec section IV.A.2.d)
_CLS_FIXED, _CLS_FLOAT, _CLS_REFERENCE = 0, 1, 7

_FIXED_DTYPES = {
    (1, 0): "<u1", (1, 1): "<i1", (2, 0): "<u2", (2, 1): "<i2",
    (4, 0): "<u4", (4, 1): "<i4", (8, 0): "<u8", (8, 1): "<i8",
}  # fmt: skip


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class H5Dataset:
    """A parsed contiguous dataset: ``data`` is an ndarray in C order; for
    reference-typed datasets the values are uint64 object-header
    addresses, resolvable via :meth:`H5File.deref`."""

    def __init__(self, data: np.ndarray, is_ref: bool):
        self.data = data
        self.is_ref = is_ref

    @property
    def shape(self) -> tuple[int, ...]:
        return self.data.shape


class H5Group:
    def __init__(self, file: H5File, members: dict[str, int]):
        self._file = file
        self._members = members

    def keys(self):
        return self._members.keys()

    def items(self):
        return ((k, self._file._object(a)) for k, a in self._members.items())

    def __contains__(self, name: str) -> bool:
        return name in self._members

    def __getitem__(self, name: str):
        obj: Any = self
        for part in name.split("/"):
            if not part:
                continue
            if not isinstance(obj, H5Group) or part not in obj._members:
                raise KeyError(name)
            obj = obj._file._object(obj._members[part])
        return obj


class H5File:
    """Read-only HDF5 file over ``bytes`` (superblock v0 subset)."""

    def __init__(self, data: bytes):
        if data[:8] != _SIG:
            raise ValueError("not an HDF5 file")
        if data[8] != 0:
            raise NotImplementedError(f"HDF5 superblock v{data[8]} is outside the codec subset")
        if data[13] != 8 or data[14] != 8:
            raise NotImplementedError("non-8-byte offsets/lengths are outside the codec subset")
        self._data = data
        self._cache: dict[int, Any] = {}
        # root symbol table entry at offset 56: header address at +8
        (self._root_addr,) = struct.unpack_from("<Q", data, 56 + 8)

    @classmethod
    def open(cls, path: str) -> H5File:
        with open(path, "rb") as f:
            return cls(f.read())

    @property
    def root(self) -> H5Group:
        return self._object(self._root_addr)

    def __getitem__(self, path: str):
        return self.root[path]

    def deref(self, ref: int):
        """Resolve an object reference (an object-header address)."""
        return self._object(int(ref))

    # -- object parsing ----------------------------------------------------

    def _object(self, addr: int):
        if addr in self._cache:
            return self._cache[addr]
        msgs = self._messages(addr)
        if 0x0011 in msgs:  # symbol table -> old-style group
            btree_addr, heap_addr = struct.unpack_from("<QQ", msgs[0x0011], 0)
            obj: Any = H5Group(self, self._group_members(btree_addr, heap_addr))
        elif 0x0008 in msgs:  # data layout -> dataset
            obj = self._dataset(msgs)
        else:
            raise NotImplementedError(
                "object with neither symbol-table nor layout message "
                "(new-style groups are outside the codec subset)"
            )
        self._cache[addr] = obj
        return obj

    def _messages(self, addr: int) -> dict[int, bytes]:
        d = self._data
        if d[addr] != 1:
            raise NotImplementedError(f"object header v{d[addr]} is outside the codec subset")
        nmsgs, = struct.unpack_from("<H", d, addr + 2)
        hdrsize, = struct.unpack_from("<I", d, addr + 8)
        out: dict[int, bytes] = {}
        blocks = [(addr + 16, hdrsize)]  # message block starts after 16-byte prefix
        parsed = 0
        while blocks and parsed < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and parsed < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", d, pos)
                body = d[pos + 8 : pos + 8 + msize]
                parsed += 1
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation block
                    cont_addr, cont_len = struct.unpack_from("<QQ", body, 0)
                    blocks.append((cont_addr, cont_len))
                elif mtype != 0x0000:  # NIL
                    out[mtype] = body
        return out

    def _dataset(self, msgs: dict[int, bytes]) -> H5Dataset:
        space = msgs.get(0x0001)
        dtype = msgs.get(0x0003)
        layout = msgs.get(0x0008)
        if space is None or dtype is None or layout is None:
            raise NotImplementedError("dataset missing dataspace/datatype/layout message")
        version, rank = space[0], space[1]
        if version != 1:
            raise NotImplementedError(f"dataspace v{version} is outside the codec subset")
        dims = struct.unpack_from(f"<{rank}Q", space, 8)
        cls, ver = dtype[0] & 0x0F, dtype[0] >> 4
        if ver != 1:
            raise NotImplementedError(f"datatype v{ver} is outside the codec subset")
        size, = struct.unpack_from("<I", dtype, 4)
        if layout[0] != 3 or layout[1] != 1:
            raise NotImplementedError(
                "only contiguous layout-v3 datasets are in the codec subset "
                "(chunked/compact need the full library)"
            )
        data_addr, data_size = struct.unpack_from("<QQ", layout, 2)
        n = int(np.prod(dims)) if dims else 1
        if data_addr == UNDEF:
            raw = b"\x00" * (n * size)
        else:
            raw = self._data[data_addr : data_addr + min(data_size, n * size)]
        if cls == _CLS_FIXED:
            signed = (dtype[1] >> 3) & 1
            np_dtype = _FIXED_DTYPES.get((size, signed))
            if np_dtype is None:
                raise NotImplementedError(f"{size}-byte fixed-point is outside the codec subset")
            arr = np.frombuffer(raw, dtype=np_dtype)
            return H5Dataset(arr.reshape(dims), is_ref=False)
        if cls == _CLS_FLOAT:
            if size != 8:
                raise NotImplementedError("only IEEE float64 is in the codec subset")
            return H5Dataset(np.frombuffer(raw, dtype="<f8").reshape(dims), is_ref=False)
        if cls == _CLS_REFERENCE:
            return H5Dataset(np.frombuffer(raw, dtype="<u8").reshape(dims), is_ref=True)
        raise NotImplementedError(f"datatype class {cls} is outside the codec subset")

    def _group_members(self, btree_addr: int, heap_addr: int) -> dict[str, int]:
        d = self._data
        if d[heap_addr : heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        heap_data_addr, = struct.unpack_from("<Q", d, heap_addr + 24)

        def name_at(off: int) -> str:
            start = heap_data_addr + off
            end = d.index(b"\x00", start)
            return d[start:end].decode()

        members: dict[str, int] = {}

        def walk(addr: int) -> None:
            sig = d[addr : addr + 4]
            if sig == b"TREE":
                level, = struct.unpack_from("<B", d, addr + 5)
                used, = struct.unpack_from("<H", d, addr + 6)
                pos = addr + 24  # past sig/type/level/used/left/right
                for i in range(used):
                    child, = struct.unpack_from("<Q", d, pos + 8 + i * 16)
                    walk(child)
            elif sig == b"SNOD":
                nsyms, = struct.unpack_from("<H", d, addr + 6)
                for i in range(nsyms):
                    base = addr + 8 + i * 40
                    name_off, hdr_addr = struct.unpack_from("<QQ", d, base)
                    members[name_at(name_off)] = hdr_addr
            else:
                raise ValueError(f"unexpected node signature {sig!r} in group B-tree")

        walk(btree_addr)
        return members


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _msg(mtype: int, body: bytes) -> bytes:
    pad = (-len(body)) % 8
    body += b"\x00" * pad
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _dataspace_msg(shape: tuple[int, ...]) -> bytes:
    return _msg(0x0001, struct.pack("<BBB5x", 1, len(shape), 0) + struct.pack(f"<{len(shape)}Q", *shape))


def _datatype_msg(kind: str, size: int, signed: bool = False) -> bytes:
    if kind == "fixed":
        b0 = 0x08 if signed else 0x00
        body = struct.pack("<B3BI", 0x10 | _CLS_FIXED, b0, 0, 0, size) + struct.pack(
            "<HH", 0, size * 8
        )
    elif kind == "float":  # IEEE little-endian float64
        body = struct.pack("<B3BI", 0x10 | _CLS_FLOAT, 0x20, 63, 0, 8) + struct.pack(
            "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023
        )
    elif kind == "ref":  # object reference
        body = struct.pack("<B3BI", 0x10 | _CLS_REFERENCE, 0, 0, 0, 8)
    else:  # pragma: no cover
        raise ValueError(kind)
    return _msg(0x0003, body)


def _layout_msg(addr: int, size: int) -> bytes:
    return _msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, size))


def _symtab_msg(btree: int, heap: int) -> bytes:
    return _msg(0x0011, struct.pack("<QQ", btree, heap))


def _object_header(messages: list[bytes]) -> bytes:
    block = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(block)) + block


class H5Writer:
    """Assemble an HDF5 file from datasets and old-style groups. Objects
    register as integer ids; ``tobytes(root_id)`` lays the file out and
    resolves ids to addresses (including object references in data)."""

    def __init__(self) -> None:
        self._objs: list[tuple[str, Any]] = []

    def dataset(self, arr: np.ndarray) -> int:
        arr = np.asarray(arr)
        if arr.dtype == np.float64:
            kind = ("float", 8, False)
        elif arr.dtype.kind in "ui" and arr.dtype.itemsize in (1, 2, 4, 8):
            kind = ("fixed", arr.dtype.itemsize, arr.dtype.kind == "i")
        else:
            raise NotImplementedError(f"dtype {arr.dtype} is outside the codec subset")
        self._objs.append(("dataset", (arr, kind)))
        return len(self._objs) - 1

    def ref_dataset(self, targets: list[int], shape: tuple[int, ...] | None = None) -> int:
        """Dataset of object references to previously registered objects."""
        self._objs.append(("refs", (list(targets), shape or (len(targets), 1))))
        return len(self._objs) - 1

    def group(self, members: dict[str, int]) -> int:
        self._objs.append(("group", dict(members)))
        return len(self._objs) - 1

    def tobytes(self, root_id: int) -> bytes:
        # -- layout pass: assign every object-header / sideband address
        addr = 96  # after superblock
        hdr_addr: dict[int, int] = {}
        side: dict[int, dict[str, int]] = {}
        for i, (kind, payload) in enumerate(self._objs):
            hdr_addr[i] = addr
            if kind == "dataset":
                arr, (tname, tsize, signed) = payload
                addr += len(
                    _object_header(
                        [_dataspace_msg(arr.shape), _datatype_msg(tname, tsize, signed), _layout_msg(0, 0)]
                    )
                )
            elif kind == "refs":
                targets, shape = payload
                addr += len(
                    _object_header([_dataspace_msg(shape), _datatype_msg("ref", 8), _layout_msg(0, 0)])
                )
            else:
                addr += len(_object_header([_symtab_msg(0, 0)]))
        for i, (kind, payload) in enumerate(self._objs):
            s: dict[str, int] = {}
            if kind == "dataset":
                arr = payload[0]
                s["data"] = addr
                addr += int(arr.nbytes)
            elif kind == "refs":
                targets, shape = payload
                s["data"] = addr
                addr += 8 * len(targets)
            else:
                members = payload
                names = sorted(members)
                heap_data = bytearray(8)  # offset 0 is the empty string
                name_off = {}
                for n in names:
                    name_off[n] = len(heap_data)
                    nb = n.encode() + b"\x00"
                    heap_data += nb + b"\x00" * ((-len(nb)) % 8)
                s["btree"] = addr
                addr += 24 + 16 * 1 + 8  # one SNOD child: 2 keys + 1 child ptr
                s["heap"] = addr
                addr += 32
                s["heap_data"] = addr
                addr += len(heap_data)
                s["snod"] = addr
                addr += 8 + 40 * len(names)
                s["_names"] = name_off  # type: ignore[assignment]
                s["_heap_bytes"] = bytes(heap_data)  # type: ignore[assignment]
            side[i] = s
        eof = addr

        # -- render pass
        out = bytearray()
        out += _SIG
        out += struct.pack("<BBBxB BBx HH I", 0, 0, 0, 0, 8, 8, 4, 16, 0)
        out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        out += struct.pack("<QQI4x16x", 0, hdr_addr[root_id], 0)  # root symtab entry
        assert len(out) == 96
        for i, (kind, payload) in enumerate(self._objs):
            s = side[i]
            if kind == "dataset":
                arr, (tname, tsize, signed) = payload
                out += _object_header(
                    [
                        _dataspace_msg(arr.shape),
                        _datatype_msg(tname, tsize, signed),
                        _layout_msg(s["data"], int(arr.nbytes)),
                    ]
                )
            elif kind == "refs":
                targets, shape = payload
                out += _object_header(
                    [
                        _dataspace_msg(shape),
                        _datatype_msg("ref", 8),
                        _layout_msg(s["data"], 8 * len(targets)),
                    ]
                )
            else:
                out += _object_header([_symtab_msg(s["btree"], s["heap"])])
        for i, (kind, payload) in enumerate(self._objs):
            s = side[i]
            if kind == "dataset":
                arr = payload[0]
                out += np.ascontiguousarray(arr).astype(arr.dtype.newbyteorder("<")).tobytes()
            elif kind == "refs":
                targets, _ = payload
                out += struct.pack(f"<{len(targets)}Q", *(hdr_addr[t] for t in targets))
            else:
                members = payload
                names = sorted(members)
                name_off = s["_names"]
                # B-tree v1 leaf with one SNOD child
                last_key = name_off[names[-1]] if names else 0
                out += b"TREE" + struct.pack("<BBH QQ QQQ", 0, 0, 1, UNDEF, UNDEF, 0, s["snod"], last_key)
                heap_bytes = s["_heap_bytes"]
                out += b"HEAP" + struct.pack("<B3x QQQ", 0, len(heap_bytes), UNDEF, s["heap_data"])
                out += heap_bytes
                out += b"SNOD" + struct.pack("<BxH", 1, len(names))
                for n in names:
                    out += struct.pack("<QQI4x16x", name_off[n], hdr_addr[members[n]], 0)
        assert len(out) == eof, (len(out), eof)
        return bytes(out)

    def save(self, path: str, root_id: int) -> None:
        with open(path, "wb") as f:
            f.write(self.tobytes(root_id))
