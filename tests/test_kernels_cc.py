import numpy as np

from doctr_spark.kernels.cc import component_boxes


def _boxes(mask, thresh=0.5):
    return component_boxes(mask.astype(np.float64), thresh)


def test_two_separate_components():
    m = np.zeros((10, 20))
    m[1:4, 1:5] = 1.0
    m[6:9, 10:15] = 0.6
    boxes, scores = _boxes(m)
    assert boxes.tolist() == [[1, 1, 5, 4], [10, 6, 15, 9]]
    assert np.allclose(scores, [1.0, 0.6])


def test_diagonal_touch_is_one_component():
    m = np.zeros((4, 4))
    m[0, 0] = 1.0
    m[1, 1] = 1.0
    boxes, _ = _boxes(m)
    assert boxes.shape[0] == 1
    assert boxes[0].tolist() == [0, 0, 2, 2]


def test_l_shape_union():
    m = np.zeros((6, 6))
    m[0, 0:5] = 1.0
    m[0:5, 0] = 1.0
    m[4, 0:5] = 1.0  # C shape: all one component
    boxes, _ = _boxes(m)
    assert boxes.shape[0] == 1
    assert boxes[0].tolist() == [0, 0, 5, 5]


def test_empty_mask():
    boxes, scores = _boxes(np.zeros((5, 5)))
    assert boxes.shape == (0, 4)
    assert scores.shape == (0,)


def test_mean_score_over_component():
    m = np.zeros((3, 6))
    m[1, 1] = 0.8
    m[1, 2] = 0.6
    boxes, scores = _boxes(m)
    assert np.allclose(scores, [0.7])


def test_output_sorted_reading_order():
    m = np.zeros((10, 10))
    m[5:7, 0:2] = 1.0  # lower-left
    m[0:2, 5:7] = 1.0  # upper-right
    m[0:2, 0:2] = 1.0  # upper-left
    boxes, _ = _boxes(m)
    assert boxes.tolist() == [[0, 0, 2, 2], [5, 0, 7, 2], [0, 5, 2, 7]]
