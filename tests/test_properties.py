"""Property-based tests (hypothesis) over the core kernels — a layer the
reference's suite lacks entirely (SURVEY §5: no property-based testing).
Each property pins an algebraic contract the pipeline's exactness rests on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels.rgeometry import (
    min_area_rect,
    rotate_image_shear,
    unrotate_image_shear,
)
from doctr_spark.kernels.vocab import DEFAULT_VOCAB, decode_sequence, encode_string

_words = st.text(alphabet=DEFAULT_VOCAB, min_size=0, max_size=24)


@given(_words)
def test_vocab_codec_roundtrip(word):
    assert decode_sequence(encode_string(word), DEFAULT_VOCAB) == word


@given(
    st.integers(min_value=20, max_value=120),
    st.integers(min_value=20, max_value=160),
    st.floats(min_value=-14.9, max_value=14.9, allow_nan=False),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_shear_rotation_is_lossless(h, w, theta, seed):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < 0.15).astype(np.uint8) * 200
    back = unrotate_image_shear(rotate_image_shear(img, theta), theta)
    assert back.shape == img.shape and (back == img).all()


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=60, deadline=None)
def test_min_area_rect_encloses_points(pts):
    pts = np.asarray(pts, dtype=np.float64)
    rect = min_area_rect(pts)
    assert rect.shape == (4, 2)
    # every input point sits inside (or on) the rect: express each point in
    # the rect's edge basis and check the projections stay within the sides
    extent = max(1.0, float(np.max(np.ptp(pts.reshape(-1, 2), axis=0))))
    tol = 1e-9 + 1e-9 * extent
    e1, e2 = rect[1] - rect[0], rect[3] - rect[0]
    for p in pts:
        d = p - rect[0]
        for e in (e1, e2):
            ln = float(np.hypot(*e))
            if ln <= 1e-6 * extent:
                # hairline side RELATIVE TO THE RECT'S SCALE: its direction
                # is reconstructed from differences of extent-sized corners,
                # so it carries ~eps*extent/ln of angular noise — projecting
                # extent-sized offsets onto it amplifies rounding into
                # arbitrary values (the kernel guarantees enclosure in the
                # rotated frame by construction; see min_area_rect)
                continue
            # signed distance along the unit edge, absolute tolerance: a
            # relative test explodes on near-degenerate (hairline) rects
            proj = float(d @ e) / ln
            assert -tol <= proj <= ln + tol


@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_ctc_collapse_idempotent(frames):
    # CTC run-length collapse: repeated frames never change the decoded word
    from doctr_spark.config import LOGIT_HI
    from doctr_spark.kernels.recognition import ctc_best_path

    vocab = DEFAULT_VOCAB
    codes = [vocab.index(c) for c in frames]

    def logits_of(seq):
        lg = np.zeros((len(seq), len(vocab) + 1), dtype=np.float32)
        for i, c in enumerate(seq):
            lg[i, c] = LOGIT_HI
        return lg

    doubled = [c for c in codes for _ in (0, 1)]
    w1, _ = ctc_best_path(logits_of(codes), vocab)
    w2, _ = ctc_best_path(logits_of(doubled), vocab)
    assert w1 == w2


@given(
    st.lists(
        st.tuples(
            st.integers(0, 80), st.integers(0, 80), st.integers(1, 40), st.integers(1, 40)
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(max_examples=40, deadline=None)
def test_intersection_over_area_bounds(boxes):
    from doctr_spark.kernels.layout import intersection_over_area

    arr = np.asarray([[x, y, x + w, y + h] for x, y, w, h in boxes], dtype=float).reshape(-1, 4)
    cov = intersection_over_area(arr, arr)
    assert ((cov >= -1e-12) & (cov <= 1 + 1e-9)).all()
    if len(boxes):
        assert np.allclose(np.diag(cov), 1.0)  # every box covers itself fully


@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    ),
    st.lists(st.integers(min_value=-999, max_value=999), min_size=1, max_size=24),
    st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_matv5_roundtrip_property(strings, ints, compress):
    import numpy as np

    from doctr_spark.kernels.matv5 import Cell, loadmat_bytes, savemat_bytes

    arr = np.asarray(ints, dtype=float).reshape(1, -1)
    d = loadmat_bytes(
        savemat_bytes({"c": Cell(strings), "a": arr, "s": strings[0]}, compress=compress)
    )
    assert d["c"] == strings and d["s"] == strings[0]
    assert np.array_equal(d["a"], arr)


@given(
    st.lists(st.floats(min_value=0.0, max_value=0.8, allow_nan=False), min_size=4, max_size=4),
    st.lists(st.floats(min_value=0.0, max_value=0.8, allow_nan=False), min_size=4, max_size=4),
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
)
@settings(max_examples=60, deadline=None)
def test_polygon_iou_rigid_invariance_property(a, b, angle):
    import numpy as np

    from doctr_spark.kernels.geometry import box_iou, polygon_iou, rotate_polygon

    boxes = []
    for v in (a, b):
        x0, y0 = v[0], v[1]
        x1, y1 = x0 + 0.05 + v[2] / 4, y0 + 0.05 + v[3] / 4
        boxes.append((x0, y0, x1, y1))
    base = box_iou(np.array([boxes[0]]), np.array([boxes[1]]))[0, 0]
    polys = [
        rotate_polygon(
            np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]), angle, (0.5, 0.5)
        )
        for x0, y0, x1, y1 in boxes
    ]
    got = polygon_iou(polys[0][None], polys[1][None])[0, 0]
    assert abs(got - base) < 1e-9
