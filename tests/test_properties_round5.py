"""Property layer over the round-5 kernels: element re-import, the
letterbox preprocessor, and the language classifier — same degenerate-
input discipline as tests/test_properties_geometry.py."""

from __future__ import annotations

import json

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.elements import page_from_dict, render_page_dict
from doctr_spark.kernels.language import _SEEDS, get_language
from doctr_spark.kernels.preprocessor import (
    batch_inputs,
    letterbox,
    resize_bilinear,
    unletterbox_boxes,
)

_val = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
)
_geom = st.tuples(
    st.floats(0, 0.9, allow_nan=False), st.floats(0, 0.9, allow_nan=False)
).map(lambda p: [p[0], p[1], p[0] + 0.05, p[1] + 0.05])


def _word(draw_val, draw_geom):
    return {
        "value": draw_val,
        "confidence": 0.5,
        "geometry": draw_geom,
        "objectness_score": 0.9,
        "crop_orientation": {"value": 0, "confidence": 1.0},
    }


_page = st.lists(  # blocks
    st.lists(  # lines
        st.lists(st.tuples(_val, _geom), min_size=1, max_size=4), min_size=1, max_size=3
    ),
    min_size=0,
    max_size=3,
).map(
    lambda blocks: {
        "page_idx": 0,
        "dimensions": [100, 200],
        "orientation": {"value": 0, "confidence": 1.0},
        "language": {"value": "", "confidence": 0.0},
        "blocks": [
            {
                "geometry": [0.0, 0.0, 1.0, 1.0],
                "objectness_score": 0.9,
                "lines": [
                    {
                        "geometry": [0.0, 0.0, 1.0, 1.0],
                        "objectness_score": 0.9,
                        "words": [_word(v, g) for v, g in line],
                    }
                    for line in block
                ],
            }
            for block in blocks
        ],
    }
)


@given(_page)
@settings(max_examples=100, deadline=None)
def test_page_from_dict_roundtrip_is_idempotent(page):
    once = page_from_dict(json.loads(json.dumps(page)))
    twice = page_from_dict(json.loads(json.dumps(once)))
    assert once == twice
    assert render_page_dict(once) == render_page_dict(twice)
    # the render is exactly the nested join of the word values
    expected = "\n\n".join(
        "\n".join(" ".join(w["value"] for w in line["words"]) for line in b["lines"])
        for b in page["blocks"]
    )
    assert render_page_dict(once) == expected


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=2, max_value=80),
    st.integers(min_value=2, max_value=80),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_letterbox_shape_bounds_and_inverse(h, w, H, W, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w), dtype=np.uint8)
    out, meta = letterbox(img, (H, W))
    assert out.shape == (H, W)
    # resampling can never leave the input's value range
    assert int(out.max()) <= int(img.max()) and int(out.min()) >= 0
    ch, cw = meta["content_hw"]
    left, top = meta["offset_xy"]
    assert 1 <= ch <= H and 1 <= cw <= W
    assert left + cw <= W and top + ch <= H
    # padding is exact zero outside the content window
    mask = np.ones((H, W), dtype=bool)
    mask[top : top + ch, left : left + cw] = False
    assert (out[mask] == 0).all()
    # box inverse: content-frame corners map back inside the page
    full = np.array([[left / W, top / H, (left + cw) / W, (top + ch) / H]])
    back = unletterbox_boxes(full, meta, (H, W))
    assert np.allclose(back, [[0.0, 0.0, 1.0, 1.0]], atol=1e-9)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=150, deadline=None)
def test_resize_bilinear_range_and_constant_preservation(h, w, H, W):
    img = np.full((h, w), 137, dtype=np.uint8)
    out = resize_bilinear(img, H, W)
    assert out.shape == (H, W)
    assert (out == 137).all()  # a constant field resamples to itself


@given(st.integers(min_value=0, max_value=50), st.integers(min_value=1, max_value=9))
@settings(max_examples=100, deadline=None)
def test_batch_inputs_partition(n, bs):
    samples = [np.full((2, 2), i % 251, dtype=np.uint8) for i in range(n)]
    batches = batch_inputs(samples, bs)
    assert sum(b.shape[0] for b in batches) == n
    assert all(b.shape[0] == bs for b in batches[:-1])
    if n:
        rebuilt = [row for b in batches for row in b]
        assert all(np.array_equal(a, b) for a, b in zip(rebuilt, samples))


def test_language_classifier_self_consistent():
    """Every embedded seed classifies as its own language, deterministically."""
    for lang, seed in _SEEDS.items():
        got1 = get_language(seed)
        got2 = get_language(seed)
        assert got1 == got2
        assert got1[0] == lang and got1[1] > 0.9
