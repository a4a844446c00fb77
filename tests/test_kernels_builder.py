import numpy as np

from doctr_spark.kernels.builder import (
    build_page,
    enclosing_bbox,
    render_document,
    resolve_blocks,
    resolve_lines,
    resolve_sub_lines,
    sort_boxes,
)


def _box(x0, y0, x1, y1):
    return [x0, y0, x1, y1]


def test_sort_boxes_reading_order():
    # two rows; second row's leftmost word must come after first row
    boxes = np.array([
        _box(0.5, 0.1, 0.6, 0.16),
        _box(0.1, 0.1, 0.2, 0.16),
        _box(0.1, 0.3, 0.2, 0.36),
    ])
    order, _ = sort_boxes(boxes)
    assert order.tolist() == [1, 0, 2]


def test_sort_boxes_rotated_fit():
    polys = np.array([
        [[0.1, 0.1], [0.3, 0.1], [0.3, 0.2], [0.1, 0.2]],
    ])
    order, straight = sort_boxes(polys)
    assert straight.shape == (1, 4)
    assert np.allclose(straight[0], [0.1, 0.1, 0.3, 0.2])


def test_resolve_sub_lines_gap_split():
    boxes = np.array([
        _box(0.1, 0.1, 0.2, 0.16),
        _box(0.22, 0.1, 0.3, 0.16),  # gap 0.02 < break
        _box(0.5, 0.1, 0.6, 0.16),  # gap 0.2 >= break
    ])
    subs = resolve_sub_lines(boxes, [0, 1, 2], break_dist=0.035)
    assert subs == [[0, 1], [2]]


def test_resolve_lines_rows_and_adaptive_break():
    # 3 rows of 3 words with uniform small gaps -> 3 lines
    boxes = []
    for r in range(3):
        y0 = 0.1 + r * 0.1
        x = 0.05
        for _ in range(3):
            boxes.append(_box(x, y0, x + 0.08, y0 + 0.0625))
            x += 0.08 + 0.015
    lines = resolve_lines(np.array(boxes), shape=(256, 512))
    assert [sorted(line) for line in lines] == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]


def test_resolve_lines_column_gap_splits():
    boxes = [
        _box(0.05, 0.1, 0.15, 0.16),
        _box(0.55, 0.1, 0.65, 0.16),  # same row, column gap 0.4
        _box(0.05, 0.2, 0.15, 0.26),
        _box(0.55, 0.2, 0.65, 0.26),
    ]
    lines = resolve_lines(np.array(boxes), shape=(256, 512))
    assert lines == [[0], [1], [2], [3]]


def test_resolve_blocks_single_linkage():
    # two vertically distant groups of lines -> two blocks
    boxes = np.array([
        _box(0.1, 0.10, 0.5, 0.13),
        _box(0.1, 0.14, 0.5, 0.17),
        _box(0.1, 0.80, 0.5, 0.83),
        _box(0.1, 0.84, 0.5, 0.87),
    ])
    lines = [[0], [1], [2], [3]]
    blocks = resolve_blocks(boxes, lines, t=0.1)
    assert blocks == [[[0], [1]], [[2], [3]]]


def test_enclosing_bbox():
    boxes = np.array([_box(0.2, 0.3, 0.4, 0.5), _box(0.1, 0.35, 0.3, 0.6)])
    assert enclosing_bbox(boxes).tolist() == [0.1, 0.3, 0.4, 0.6]


def test_build_page_empty():
    page = build_page(np.empty((0, 4)), np.empty(0), [], [], (256, 512), page_idx=3)
    assert page["text"] == ""
    assert page["blocks"] == []
    assert page["page_idx"] == 3
    assert page["dimensions"] == [256, 512]


def test_build_page_nesting_and_render():
    boxes = np.array([
        _box(0.05, 0.1, 0.15, 0.16),
        _box(0.17, 0.1, 0.25, 0.16),
        _box(0.05, 0.2, 0.15, 0.26),
    ])
    scores = np.array([0.8, 0.8, 0.8])
    page = build_page(boxes, scores, ["hello", "world", "again"], [0.9, 0.9, 0.9], (256, 512))
    assert page["text"] == "hello world\nagain"
    assert len(page["blocks"]) == 1
    block = page["blocks"][0]
    assert len(block["lines"]) == 2
    assert block["lines"][0]["words"][0]["value"] == "hello"
    assert block["lines"][0]["geometry"] == [0.05, 0.1, 0.25, 0.16]
    assert block["geometry"] == [0.05, 0.1, 0.25, 0.26]
    assert abs(block["objectness_score"] - 0.8) < 1e-12


def test_render_document_page_separator():
    assert render_document(["p1", "p2"]) == "p1\n\n\n\np2"
