"""From-scratch CCITT G3/G4 fax codec (kernels/ccitt.py): table sanity,
G4 round trips, MH decode, parms, and the loud gates."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.ccitt import (
    _EOL,
    _RUN_DECODE,
    _RUN_ENCODE,
    decode_ccitt,
    encode_g4,
)


def test_run_tables_prefix_free_and_complete():
    """Transcription safety net: each color's full table (terminating +
    makeup + shared extended makeup) is prefix-free and covers runs
    0..63 and every multiple of 64 up to 2560."""
    for color in (0, 1):
        codes = list(_RUN_DECODE[color])
        assert len(set(codes)) == len(codes)
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not a.startswith(b) and not b.startswith(a), (a, b)
        runs = set(_RUN_DECODE[color].values())
        assert set(range(64)) <= runs
        assert {64 * i for i in range(1, 41)} <= runs  # 64..2560
        # no run code may collide with the EOL prefix
        for c in codes:
            assert not c.startswith(_EOL)


def _roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    blob = encode_g4(img, **kw)
    return decode_ccitt(blob, columns=img.shape[1], rows=img.shape[0], **kw)


@given(st.integers(1, 12), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_g4_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)) < rng.random()  # varying densities
    assert np.array_equal(_roundtrip(img), img)


@pytest.mark.parametrize(
    "img",
    [
        np.zeros((3, 17), dtype=bool),
        np.ones((3, 17), dtype=bool),
        np.eye(9, dtype=bool),
        np.tri(8, 21, dtype=bool),
    ],
    ids=["all-white", "all-black", "diag", "tri"],
)
def test_g4_roundtrip_shapes(img):
    assert np.array_equal(_roundtrip(img), img)


def test_g4_long_runs_repeat_makeup():
    """A 6000-px row forces runs past the 2560 makeup ceiling (encoder
    repeats the makeup, decoder accumulates)."""
    img = np.zeros((2, 6000), dtype=bool)
    img[0, 5800:] = True
    img[1, :3000] = True
    assert np.array_equal(_roundtrip(img), img)


def test_g4_glyph_canvas_roundtrip():
    from doctr_spark.fixtures.layout import layout_paragraphs

    canvas = layout_paragraphs([["hello", "world"]])[0].canvas
    ink = canvas > 127
    assert np.array_equal(_roundtrip(ink), ink)


def test_g4_byte_align_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.random((7, 30)) < 0.4
    assert np.array_equal(_roundtrip(img, byte_align=True), img)


def test_g4_ends_at_eofb_without_rows():
    img = np.tri(5, 12, dtype=bool)
    dec = decode_ccitt(encode_g4(img), columns=12)  # rows unspecified
    assert np.array_equal(dec, img)


def test_mh_k0_decode():
    """Group 3 1-D: hand-built run-code stream (white 3, black 4, white 5
    per row) decodes under /K 0, with and without a leading EOL."""
    row_codes = _RUN_ENCODE[0][3] + _RUN_ENCODE[1][4] + _RUN_ENCODE[0][5]
    expect = np.array([[0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0]], dtype=bool).repeat(2, 0)
    for prefix in ("", _EOL):
        s = (prefix + row_codes) * 2 + _EOL + _EOL  # RTC ends it
        blob = bytes(
            int(s.ljust((len(s) + 7) & ~7, "0")[i : i + 8], 2)
            for i in range(0, (len(s) + 7) & ~7, 8)
        )
        dec = decode_ccitt(blob, columns=12, k=0)
        assert np.array_equal(dec, expect)


def test_mh_long_run_makeup_accumulates():
    s = _RUN_ENCODE[0][64] + _RUN_ENCODE[0][6] + _RUN_ENCODE[1][2]  # 70 white, 2 black
    blob = bytes(
        int(s.ljust((len(s) + 7) & ~7, "0")[i : i + 8], 2)
        for i in range(0, (len(s) + 7) & ~7, 8)
    )
    dec = decode_ccitt(blob, columns=72, rows=1, k=0)
    assert dec[0, :70].sum() == 0 and dec[0, 70:].all()


def test_gates():
    with pytest.raises(NotImplementedError, match="K > 0"):
        decode_ccitt(b"\x00\x00", k=1)
    with pytest.raises(ValueError, match="2-D boolean"):
        encode_g4(np.zeros(5, dtype=bool))
    with pytest.raises(ValueError, match="invalid CCITT"):
        # 000000000010...: not an EOL, and no run code within 14 bits
        decode_ccitt(b"\x00\x20\x00\x00\x00", columns=8, rows=1, k=0)
