"""From-scratch minimal HDF5 codec (kernels/hdf5.py): writer->reader
round-trip over the structures SVHN's digitStruct.mat uses, plus the loud
gates for constructs outside the subset."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.hdf5 import H5File, H5Writer


def test_signature_and_gates():
    with pytest.raises(ValueError, match="not an HDF5"):
        H5File(b"nope" * 4)
    w = H5Writer()
    root = w.group({"x": w.dataset(np.array([[1.0]]))})
    data = bytearray(w.tobytes(root))
    data[8] = 2  # superblock version
    with pytest.raises(NotImplementedError, match="superblock v2"):
        H5File(bytes(data))


@given(
    st.lists(
        st.lists(st.floats(0, 1e6, allow_nan=False, width=32), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_scalar_and_ref_columns(columns):
    """Float64 scalar datasets, reference columns, nested groups and char
    matrices all survive write -> parse byte-identically."""
    w = H5Writer()
    grp_ids = []
    for vals in columns:
        scalars = [w.dataset(np.array([[float(v)]])) for v in vals]
        grp_ids.append(w.group({"vals": w.ref_dataset(scalars), "n": w.dataset(np.array([[float(len(vals))]]))}))
    names = [
        w.dataset(np.array([[ord(c)] for c in f"{i}.png"], dtype=np.uint16))
        for i in range(len(columns))
    ]
    top = w.group(
        {"bbox": w.ref_dataset(grp_ids), "name": w.ref_dataset(names)}
    )
    f = H5File(w.tobytes(w.group({"digitStruct": top})))
    nd = f["digitStruct/name"]
    bd = f["digitStruct/bbox"]
    assert nd.shape == bd.shape == (len(columns), 1)
    for i, vals in enumerate(columns):
        assert "".join(map(chr, f.deref(nd.data[i, 0]).data.flatten())) == f"{i}.png"
        grp = f.deref(bd.data[i, 0])
        assert int(grp["n"].data[0, 0]) == len(vals)
        got = [f.deref(r).data.item() for r in grp["vals"].data[:, 0]]
        assert got == [float(v) for v in vals]


def test_integer_dtypes_roundtrip():
    w = H5Writer()
    arrs = {
        "u1": np.arange(6, dtype=np.uint8).reshape(2, 3),
        "i4": (np.arange(6, dtype=np.int32) - 3).reshape(3, 2),
        "u2": np.array([[65535, 0]], dtype=np.uint16),
        "f8": np.linspace(-1, 1, 4).reshape(2, 2),
    }
    root = w.group({k: w.dataset(v) for k, v in arrs.items()})
    f = H5File(w.tobytes(root))
    for k, v in arrs.items():
        got = f.root[k].data
        assert got.shape == v.shape
        assert np.array_equal(got, v)


def test_chunked_layout_rejected():
    """A layout class other than contiguous must reject loudly."""
    w = H5Writer()
    root = w.group({"x": w.dataset(np.array([[1.0]]))})
    data = bytearray(w.tobytes(root))
    # find the layout message (v3, class 1) and flip its class to chunked
    idx = bytes(data).find(struct.pack("<HHB3xBB", 0x0008, 24, 0, 3, 1))
    assert idx != -1
    data[idx + 9] = 2
    f = H5File(bytes(data))
    with pytest.raises(NotImplementedError, match="contiguous"):
        f.root["x"]
