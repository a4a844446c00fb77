import numpy as np

from doctr_spark.fixtures.layout import layout_paragraphs
from doctr_spark.kernels.detection import detect_words, extract_crops


def test_detection_recovers_exact_word_boxes():
    pages = layout_paragraphs([["alpha", "beta", "gamma42"], ["second", "par"]])
    page = pages[0]
    abs_boxes, rel_boxes, scores = detect_words(page.canvas)
    got = sorted(map(tuple, abs_boxes.tolist()))
    expected = sorted(b for _, b in page.words)
    assert got == expected
    h, w = page.canvas.shape
    assert np.allclose(rel_boxes, abs_boxes / np.array([w, h, w, h]))
    assert np.all(scores >= 0.1) and np.all(scores <= 1.0)


def test_bin_thresh_filters_faint_ink():
    img = np.zeros((32, 32), dtype=np.uint8)
    img[4:8, 4:12] = 50  # prob 0.196 < 0.3 -> not detected
    img[20:24, 4:12] = 204
    boxes, _, _ = detect_words(img)
    assert boxes.tolist() == [[4, 20, 12, 24]]


def test_min_size_filter():
    img = np.zeros((32, 32), dtype=np.uint8)
    img[4, 4] = 204  # 1x1 speck
    img[10:14, 10:20] = 204
    boxes, _, _ = detect_words(img)
    assert boxes.tolist() == [[10, 10, 20, 14]]


def test_extract_crops_slices():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    crops = extract_crops(img, np.array([[1, 2, 4, 6]]))
    assert crops[0].shape == (4, 3)
    assert (crops[0] == img[2:6, 1:4]).all()
