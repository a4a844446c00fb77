"""From-scratch JBIG2 codec (kernels/jbig2.py): MQ arithmetic coder
round trips, generic-region decode/encode, the embedded segment stream
PDF carries, the /JBIG2Decode XObject path, and the loud gates."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.jbig2 import (
    _NOMINAL_AT,
    MQDecoder,
    MQEncoder,
    decode_generic,
    decode_jbig2,
    encode_generic,
    encode_jbig2,
)
from doctr_spark.kernels.pdf import parse_pdf, rasterize_pdf, write_pdf


# --------------------------------------------------------- MQ coder


@given(st.integers(0, 2**32 - 1), st.integers(1, 1500), st.integers(1, 16))
@settings(max_examples=60, deadline=None)
def test_mq_roundtrip_property(seed, n, n_ctx):
    """Encoder and decoder are exact inverses over random bit streams
    with skewed and balanced densities across multiple contexts."""
    rng = random.Random(seed)
    p = rng.choice([0.02, 0.1, 0.5, 0.9])
    bits = [1 if rng.random() < p else 0 for _ in range(n)]
    ctxs = [rng.randrange(n_ctx) for _ in range(n)]
    enc = MQEncoder(n_ctx)
    for c, b in zip(ctxs, bits):
        enc.encode(c, b)
    dec = MQDecoder(enc.flush(), n_ctx)
    assert [dec.decode(c) for c in ctxs] == bits


def test_mq_all_zero_and_all_one_streams():
    """Degenerate inputs stress the carry/stuffing paths (all-MPS runs
    renormalize rarely; all-LPS runs renormalize every symbol)."""
    for bit in (0, 1):
        enc = MQEncoder(1)
        for _ in range(5000):
            enc.encode(0, bit)
        dec = MQDecoder(enc.flush(), 1)
        assert all(dec.decode(0) == bit for _ in range(5000))


# --------------------------------------------- generic region (§6.2)


@given(st.integers(1, 60), st.integers(1, 80), st.integers(0, 2**32 - 1), st.booleans())
@settings(max_examples=40, deadline=None)
def test_generic_region_roundtrip_property(h, w, seed, tpgdon):
    rng = np.random.default_rng(seed)
    bm = (rng.random((h, w)) < rng.random()).astype(np.uint8)
    data = encode_generic(bm, tpgdon)
    assert np.array_equal(decode_generic(data, w, h, 0, _NOMINAL_AT[0], tpgdon), bm)


def test_generic_region_tpgdon_compresses_typical_rows():
    """A banded bitmap (long runs of identical rows) must shrink under
    TPGDON — the typical-prediction bit replaces whole rows."""
    bm = np.zeros((64, 200), dtype=np.uint8)
    bm[20:44] = 1
    assert len(encode_generic(bm, True)) < len(encode_generic(bm, False))


def test_generic_region_template_gate():
    with pytest.raises(NotImplementedError, match="template"):
        decode_generic(b"\x00", 4, 4, 2, ((2, -1),), False)
    with pytest.raises(NotImplementedError, match="template"):
        decode_generic(b"\x00", 4, 4, 0, ((1, -1), (-3, -1), (2, -2), (-2, -2)), False)


# ------------------------------------------- embedded stream (D.2)


@pytest.mark.parametrize("mmr", [False, True], ids=["arith", "mmr"])
def test_embedded_stream_roundtrip(mmr):
    rng = np.random.default_rng(5)
    bm = (rng.random((90, 130)) < 0.15).astype(np.uint8)
    out = decode_jbig2(encode_jbig2(bm, mmr=mmr))
    assert out.dtype == np.uint8 and np.array_equal(out, bm)


def test_embedded_stream_gates():
    bm = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jbig2(bm)
    # symbol-dictionary segment type (0) rejects loudly
    bad = struct.pack(">IBBBI", 9, 0, 0, 1, 0) + good
    with pytest.raises(NotImplementedError, match="symbol"):
        decode_jbig2(bad)
    # region before page info: skip segment 0 (11-byte header + 19-byte
    # page-info payload) so the stream opens on the region segment
    with pytest.raises(ValueError, match="page information"):
        decode_jbig2(good[30:])
    # unknown-length segment
    with pytest.raises(NotImplementedError, match="unknown-length"):
        decode_jbig2(struct.pack(">IBBBI", 0, 48, 0, 1, 0xFFFFFFFF))
    # striped page (height 0xFFFFFFFF)
    page_info = struct.pack(">IIII", 8, 0xFFFFFFFF, 0, 0) + b"\x01\x00\x00"
    striped = struct.pack(">IBBBI", 0, 48, 0, 1, len(page_info)) + page_info
    with pytest.raises(NotImplementedError, match="striped"):
        decode_jbig2(striped)


# ----------------------------------------------- /JBIG2Decode in PDF


def test_pdf_jbig2_xobject_roundtrip():
    """/JBIG2Decode image XObject: the jbig2enc-style generic-region
    layout round trips to the exact ink mask at its placement."""
    rng = np.random.default_rng(11)
    ink = rng.random((40, 60)) < 0.25
    doc = write_pdf([[]], (200, 320), images={0: [(ink, 25, 30)]}, jbig2=True)
    assert b"/JBIG2Decode" in doc
    (page,) = parse_pdf(doc)
    [(x, y, arr)] = page["images"]
    assert (round(x), round(y)) == (25, 30)
    assert np.array_equal(arr > 0, ink)


@pytest.mark.parametrize("mmr", [False, True], ids=["arith", "mmr"])
def test_pdf_jbig2_scan_redetects_words(mmr):
    """JBIG2 scan end to end: render -> threshold -> T.88-embed ->
    rasterize -> detection/recognition reads back the exact words."""
    from doctr_spark.kernels.detection import detect_words, extract_crops
    from doctr_spark.kernels.recognition import recognize_crops_batched

    words = [[(12, 10, "alpha"), (120, 10, "beta"), (12, 48, "gamma7")]]
    (canvas,) = rasterize_pdf(write_pdf(words, (100, 260)))
    doc = write_pdf(
        [[]], (100, 260), images={0: [(canvas > 127, 0, 0)]}, jbig2=True, jbig2_mmr=mmr
    )
    (scan,) = rasterize_pdf(doc)
    boxes, _, _ = detect_words(scan)
    vals = recognize_crops_batched(extract_crops(scan, boxes))
    assert sorted(v for v, _ in vals) == ["alpha", "beta", "gamma7"]


def test_pdf_jbig2_gates():
    """Non-1-bit declarations and /JBIG2Globals (symbol dictionaries)
    reject loudly; size mismatch errors."""
    ink = np.zeros((10, 16), dtype=bool)
    doc = write_pdf([[]], (50, 50), images={0: [(ink, 0, 0)]}, jbig2=True)
    with pytest.raises(NotImplementedError, match="JBIG2Decode images outside"):
        parse_pdf(doc.replace(b"/BitsPerComponent 1", b"/BitsPerComponent 8"))
    with pytest.raises(ValueError, match="page size"):
        parse_pdf(doc.replace(b"/Width 16", b"/Width 14"))
    glob = doc.replace(
        b"/Filter /JBIG2Decode",
        b"/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 9 0 R >>",
    )
    with pytest.raises(NotImplementedError, match="globals"):
        parse_pdf(glob)
