import numpy as np

from doctr_spark.fixtures.tables import render_table_page
from doctr_spark.kernels.detection import detect_words, extract_crops
from doctr_spark.kernels.recognition import recognize_crop
from doctr_spark.kernels.tables import (
    build_tables,
    detect_table_structure,
    points_in_polygons,
    render_table,
    table_to_grid,
)


def _sq(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_points_in_polygons_ray_cast():
    polys = np.array([_sq(0.0, 0.0, 1.0, 1.0), _sq(2.0, 2.0, 3.0, 3.0)])
    pts = np.array([[0.5, 0.5], [2.5, 2.5], [1.5, 1.5]])
    inside = points_in_polygons(pts, polys)
    assert inside.tolist() == [[True, False], [False, True], [False, False]]
    assert points_in_polygons(np.empty((0, 2)), polys).shape == (0, 2)


def test_detect_structure_and_tsv_roundtrip():
    cells = [[["a1"], ["b2", "c"]], [["dd"], ["e"]], [["f"], []]]
    tp = render_table_page(cells)
    tables = detect_table_structure(tp.canvas)
    assert len(tables) == 1
    assert (tables[0]["num_rows"], tables[0]["num_cols"]) == (3, 2)
    ab, rb, _ = detect_words(tp.canvas)
    vals, confs = zip(*[recognize_crop(c) for c in extract_crops(tp.canvas, ab)])
    built, consumed = build_tables(rb, list(vals), list(confs), tables)
    assert consumed.all()
    assert render_table(built[0]) == tp.gt_tsv
    grid = table_to_grid(built[0])
    assert grid[0] == ["a1", "b2 c"]
    assert grid[2] == ["f", ""]  # empty cell stays empty


def test_word_detection_ignores_ruling_lines():
    tp = render_table_page([[["hi"]]])
    ab, _, _ = detect_words(tp.canvas)
    assert ab.shape[0] == 1  # the word, not the grid


def test_nearest_cell_fallback():
    # word center inside the table extent but on a ruling boundary (outside
    # every cell polygon) -> attached to nearest cell
    tables = [
        {
            "cells": [
                {"geometry": [0.1, 0.1, 0.4, 0.3], "score": 1.0,
                 "row_start": 0, "row_end": 0, "col_start": 0, "col_end": 0},
                {"geometry": [0.42, 0.1, 0.7, 0.3], "score": 1.0,
                 "row_start": 0, "row_end": 0, "col_start": 1, "col_end": 1},
            ],
            "num_rows": 1,
            "num_cols": 2,
        }
    ]  # fmt: skip
    boxes = np.array([
        [0.15, 0.17, 0.2, 0.23],      # inside cell 0
        [0.405, 0.17, 0.415, 0.23],   # gap between cells, within capture radius
        [0.9, 0.5, 0.95, 0.55],       # far outside the table -> body word
    ])
    built, consumed = build_tables(boxes, ["a", "b", "c"], [0.9] * 3, tables)
    assert consumed.tolist() == [True, True, False]
    grid = table_to_grid(built[0])
    assert grid[0] == ["a", "b"]  # nearest cell = cell 1 (center distance 0.15 vs 0.16)


def test_no_tables_noop():
    boxes = np.array([[0.1, 0.1, 0.2, 0.2]])
    built, consumed = build_tables(boxes, ["x"], [0.9], [])
    assert built == [] and not consumed.any()
