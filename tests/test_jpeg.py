"""From-scratch baseline JPEG codec (kernels/jpeg.py): gray/color
round-trips, 4:2:0, restart intervals, and the loud non-baseline gates.

Reference parity: docTR decodes JPEG inside its loaders via PIL/cv2
(`doctr/io/image/base.py:16-54`); here the same byte streams flow
through the T.81 subset codec.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.jpeg import decode_jpeg, encode_jpeg


def _smooth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return (128 + 60 * np.sin(x / 9.0) + 40 * np.cos(y / 7.0)).clip(0, 255).astype(np.uint8)


def test_gray_roundtrip_smooth():
    """High-quality gray encode/decode is near-lossless on band-limited
    signals (all quantizer steps ~1 at q95)."""
    img = _smooth(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_gray_non_multiple_of_8_dims():
    """Edge-replicated padding: odd frame sizes crop back exactly."""
    img = _smooth(41, 57)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (41, 57)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_color_decodes_to_luma(subsampling):
    """RGB input -> JFIF YCbCr; the decoder returns the luma plane (the
    grayscale signal the pipeline consumes) within quantization error."""
    img = _smooth(41, 57)
    rgb = np.stack([img, np.roll(img, 5, axis=1), 255 - img], axis=-1)
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y_exp = np.clip(0.299 * r + 0.587 * g + 0.114 * b, 0, 255)
    dec = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling=subsampling))
    assert dec.shape == (41, 57)
    assert np.abs(dec.astype(np.float64) - y_exp).max() <= 3


def test_420_is_smaller_than_444():
    img = _smooth(48, 64)
    rgb = np.stack([img, img, 255 - img], axis=-1)
    b444 = encode_jpeg(rgb, quality=90, subsampling="4:4:4")
    b420 = encode_jpeg(rgb, quality=90, subsampling="4:2:0")
    assert len(b420) < len(b444)


def test_restart_intervals_roundtrip():
    """DRI/RSTn: predictors reset at each marker; stream still decodes
    exactly, and the markers are really present."""
    img = _smooth(40, 56)
    blob = encode_jpeg(img, quality=90, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    dec = decode_jpeg(blob)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_glyph_canvas_near_exact():
    """Bilevel glyph ink (the engine's own canvases) survives q95 with
    tiny ringing only — mean error well under a gray level."""
    canvas = np.full((64, 96), 0, np.uint8)
    canvas[10:20, 8:60] = 255
    canvas[30:45, 20:40] = 255
    dec = decode_jpeg(encode_jpeg(canvas, quality=95))
    assert np.abs(dec.astype(float) - canvas).mean() < 0.5
    # thresholded reconstruction is the exact ink mask
    assert np.array_equal(dec > 127, canvas > 127)


@given(st.integers(2, 30), st.integers(2, 30), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_roundtrip_property_bounded_error(h, w, seed):
    """Any uint8 image round-trips with error bounded by the q100
    quantizer (all steps 1 -> IDCT rounding only)."""
    rng = np.random.default_rng(seed)
    # smooth random field: random DC per 8x8 region, so q100 is ~exact
    img = np.repeat(np.repeat(rng.integers(0, 256, (4, 4)), 8, 0), 8, 1)[:h, :w].astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("quality", [25, 75, 95])
def test_progressive_matches_baseline_gray(quality):
    """SOF2 decode (Annex G successive approximation) reconstructs the
    IDENTICAL pixels as the baseline path: same quantized coefficients,
    different entropy layout."""
    img = _smooth(41, 57)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog_blob = encode_jpeg(img, quality=quality, progressive=True)
    assert b"\xff\xc2" in prog_blob and b"\xff\xc0" not in prog_blob[2:4]
    assert np.array_equal(decode_jpeg(prog_blob), base)


def test_progressive_matches_baseline_color():
    img = _smooth(33, 49)
    rgb = np.stack([img, np.roll(img, 5, axis=1), 255 - img], axis=-1)
    base = decode_jpeg(encode_jpeg(rgb, quality=80))
    prog = decode_jpeg(encode_jpeg(rgb, quality=80, progressive=True))
    assert np.array_equal(prog, base)


@given(st.integers(1, 60), st.integers(1, 60), st.integers(1, 100), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_progressive_equals_baseline_property(h, w, quality, seed):
    """Property: for ANY image and quality, progressive and baseline
    decode to the same plane (exercises EOBRUN, ZRL-with-history-bits,
    DC/AC refinement)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 120, np.uint8)
    n = max(1, h * w // 40)  # sparse spikes -> long runs + refinements
    img[rng.integers(0, h, n), rng.integers(0, w, n)] = rng.integers(0, 256, n)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg(img, quality=quality, progressive=True))
    assert np.array_equal(prog, base)


def test_gates_reject_loudly():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
    # arithmetic SOF9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(b"\xff\xd8\xff\xc9\x00\x05aaa")
    # lossless SOF3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x05aaa")
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(np.zeros((8, 8), np.uint8), progressive=True, restart_interval=2)
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), progressive=True, subsampling="4:2:0")
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1")


def test_12bit_precision_rejected():
    img = _smooth(16, 16)
    blob = bytearray(encode_jpeg(img))
    i = blob.index(b"\xff\xc0")
    blob[i + 4] = 12  # precision byte
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(blob))
