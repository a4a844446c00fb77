import numpy as np
import pytest

from doctr_spark.kernels.reading_order import (
    detect_text_direction,
    sort_reading_order,
    topological_order,
)


def test_reference_docstring_oracle():
    # reference sort_reading_order docstring (reading_order/base.py:394-402)
    geoms = [
        ((0.55, 0.2), (0.9, 0.8)),  # right column
        ((0.1, 0.05), (0.9, 0.15)),  # title
        ((0.1, 0.2), (0.45, 0.8)),  # left column
    ]
    assert sort_reading_order(geoms) == [1, 2, 0]


def test_two_columns_of_lines():
    # 3 lines per column; default row-major order would interleave
    geoms = []
    for r in range(3):
        geoms.append((0.1, 0.1 + r * 0.1, 0.45, 0.15 + r * 0.1))  # left col: 0,2,4
        geoms.append((0.55, 0.1 + r * 0.1, 0.9, 0.15 + r * 0.1))  # right col: 1,3,5
    order = sort_reading_order(geoms)
    assert order == [0, 2, 4, 1, 3, 5]


def test_rtl_direction_mirrors_columns():
    geoms = [
        (0.1, 0.1, 0.45, 0.8),  # left column
        (0.55, 0.1, 0.9, 0.8),  # right column
    ]
    assert sort_reading_order(geoms, direction="ltr") == [0, 1]
    assert sort_reading_order(geoms, direction="rtl") == [1, 0]


def test_detect_text_direction():
    assert detect_text_direction(["Hello", "world"]) == "ltr"
    assert detect_text_direction(["مرحبا", "بالعالم"]) == "rtl"
    assert detect_text_direction(["123", "!!"]) == "ltr"  # no strong chars
    assert detect_text_direction(["123"], language="ar") == "rtl"


def test_labels_roles_and_caption_attachment():
    geoms = [
        (0.1, 0.9, 0.9, 0.95),  # footer
        (0.1, 0.05, 0.9, 0.1),  # header
        (0.1, 0.2, 0.9, 0.5),   # figure (float)
        (0.1, 0.52, 0.9, 0.56), # caption just below the figure
        (0.1, 0.6, 0.9, 0.8),   # body text
    ]  # fmt: skip
    labels = ["page_footer", "page_header", "picture", "caption", "text"]
    order = sort_reading_order(geoms, labels=labels)
    assert order == [1, 2, 3, 4, 0]  # header, figure, caption after it, body, footer


def test_topological_order_single_and_empty():
    assert topological_order(np.zeros((0, 4))) == []
    assert topological_order(np.array([[0.1, 0.1, 0.2, 0.2]])) == [0]


def test_invalid_direction():
    with pytest.raises(ValueError):
        sort_reading_order([(0.1, 0.1, 0.2, 0.2)] * 2, direction="btt")


def test_builder_keep_reading_order_two_columns():
    from doctr_spark.kernels.builder import build_page

    boxes, values = [], []
    for r in range(3):
        y0 = 0.1 + r * 0.1
        boxes.append([0.05, y0, 0.3, y0 + 0.0625])
        values.append(f"L{r}")
        boxes.append([0.55, y0, 0.8, y0 + 0.0625])
        values.append(f"R{r}")
    boxes = np.array(boxes)
    scores = np.full(6, 0.8)
    confs = [0.9] * 6
    default = build_page(boxes, scores, values, confs, (256, 512))
    assert default["text"] == "L0\nR0\nL1\nR1\nL2\nR2"  # interleaved sub-lines
    ro = build_page(boxes, scores, values, confs, (256, 512), keep_reading_order=True)
    # column-major, and each column becomes its own paragraph segment/block
    assert ro["text"] == "L0\nL1\nL2\n\nR0\nR1\nR2"
    assert len(ro["blocks"]) == 2


def test_resolve_reading_segments_two_columns_and_title():
    from doctr_spark.kernels.reading_order import resolve_reading_segments

    # title spanning both columns, then two columns of close-packed lines
    geoms = [
        (0.1, 0.05, 0.9, 0.11),   # 0 title
        (0.1, 0.20, 0.45, 0.26),  # 1 left line 1
        (0.1, 0.28, 0.45, 0.34),  # 2 left line 2
        (0.1, 0.60, 0.45, 0.66),  # 3 left line 3 (big gap: new paragraph)
        (0.55, 0.20, 0.9, 0.26),  # 4 right line 1
        (0.55, 0.28, 0.9, 0.34),  # 5 right line 2
    ]  # fmt: skip
    segs = resolve_reading_segments(geoms)
    assert segs == [[0], [1, 2], [3], [4, 5]]


def test_resolve_reading_segments_labels_and_floats():
    from doctr_spark.kernels.reading_order import resolve_reading_segments

    geoms = [
        (0.1, 0.10, 0.9, 0.16),  # 0 text
        (0.1, 0.18, 0.9, 0.24),  # 1 text, close -> same paragraph
        (0.1, 0.26, 0.9, 0.50),  # 2 table (float): never merged
        (0.1, 0.52, 0.9, 0.58),  # 3 text after the float -> new segment
    ]
    labels = ["text", "text", "table", "text"]
    segs = resolve_reading_segments(geoms, labels=labels)
    assert segs == [[0, 1], [2], [3]]


def test_group_reading_items_list_bullets():
    from doctr_spark.kernels.reading_order import group_reading_items

    # two list bullets, each wrapped over two visual lines, then a paragraph
    geoms = [
        (0.10, 0.10, 0.90, 0.15),  # 0 bullet 1, line 1
        (0.12, 0.16, 0.90, 0.21),  # 1 bullet 1, line 2 (same region)
        (0.10, 0.23, 0.90, 0.28),  # 2 bullet 2, line 1
        (0.12, 0.29, 0.90, 0.34),  # 3 bullet 2, line 2
        (0.10, 0.40, 0.90, 0.45),  # 4 body text
    ]
    labels = ["list_item", "list_item", "list_item", "list_item", "text"]
    regions = [
        (0.08, 0.09, 0.92, 0.22),  # region of bullet 1
        (0.08, 0.22, 0.92, 0.35),  # region of bullet 2
    ]
    items = group_reading_items(geoms, labels=labels, region_geoms=regions)
    assert items == [[0, 1], [2, 3], [4]]
    # without regions, the whole list collapses into one close-packed segment
    assert group_reading_items(geoms, labels=labels) == [[0, 1, 2, 3], [4]]


def test_ordered_line_words_directions():
    from doctr_spark.kernels.reading_order import ordered_line_words

    boxes = np.array([[0.1, 0.1, 0.2, 0.2], [0.3, 0.1, 0.4, 0.2], [0.5, 0.1, 0.6, 0.2]])
    assert ordered_line_words(boxes, ["a", "b", "c"], "ltr") == [0, 1, 2]
    assert ordered_line_words(boxes, ["a", "b", "c"], "rtl") == [2, 1, 0]
    # auto: each line takes its OWN base direction from its text
    assert ordered_line_words(boxes, ["שלום", "עולם", "טוב"], "ltr", auto=True) == [2, 1, 0]
    assert ordered_line_words(boxes, ["hello", "big", "world"], "rtl", auto=True) == [0, 1, 2]
    # vertical: top-to-bottom by y
    vert = np.array([[0.1, 0.5, 0.2, 0.6], [0.1, 0.1, 0.2, 0.2]])
    assert ordered_line_words(vert, ["a", "b"], "ttb-rtl") == [1, 0]


def test_builder_text_direction_option():
    from doctr_spark.kernels.builder import build_page

    boxes = np.array([[0.05, 0.1, 0.15, 0.16], [0.16, 0.1, 0.26, 0.16], [0.27, 0.1, 0.37, 0.16]])
    scores = np.full(3, 0.8)
    args = (boxes, scores, ["aa", "bb", "cc"], [0.9] * 3, (256, 512))
    assert build_page(*args)["text"] == "aa bb cc"
    assert build_page(*args, text_direction="rtl")["text"] == "cc bb aa"
    assert build_page(*args, text_direction="auto")["text"] == "aa bb cc"  # ASCII -> ltr


def test_resolve_reading_segments_empty():
    from doctr_spark.kernels.reading_order import resolve_reading_segments

    assert resolve_reading_segments([]) == []
