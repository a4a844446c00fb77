"""Table structure detection + table building (the spatial-join operators).

Reference semantics reimplemented:

* table-structure "model" — the reference runs TableCenterNet over layout
  table regions (`doctr/models/table_structure/predictor/pytorch.py:37-80`).
  The deterministic stand-in reads the ruling-line channel of the page
  (grid lines are drawn below the word-detection binarization threshold,
  the way a multi-head model separates text and line channels): connected
  ruling components are tables, row/column line positions come from
  full-extent projections, and cells are the inter-line rectangles with
  0-based logical coordinates.
* word->cell assignment — `DocumentBuilder._build_tables`
  (`doctr/models/builder.py:430-560`): vectorized ray-cast
  point-in-polygon of word centers against cell polygons
  (`_points_in_polygons`, builder.py:348-368), first containing cell wins,
  then a nearest-cell fallback for words inside the table extent within
  0.5 * median cell diagonal (builder.py:508-529), and in-cell reading
  order via running-mean row clustering (`_order_cell_words`,
  builder.py:370-395). Consumed words are removed from the page blocks
  (the anti-join, builder.py:780-787).
* `to_grid` / TSV render — `doctr/io/elements.py:284-302`.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..config import BIN_THRESH, RULING_THRESH, TABLE_NEAREST_FRAC
from .cc import label_runs


def points_in_polygons(points: np.ndarray, polys: np.ndarray) -> np.ndarray:
    """Vectorized ray casting: (N, 2) points x (C, V, 2) polygons -> (N, C)."""
    if points.shape[0] == 0 or polys.shape[0] == 0:
        return np.zeros((points.shape[0], polys.shape[0]), dtype=bool)
    px = points[:, 0].astype(np.float64)[:, None, None]
    py = points[:, 1].astype(np.float64)[:, None, None]
    vi = polys.astype(np.float64)
    vj = np.roll(vi, 1, axis=1)
    xi, yi = vi[None, ..., 0], vi[None, ..., 1]
    xj, yj = vj[None, ..., 0], vj[None, ..., 1]
    crossing = ((yi > py) != (yj > py)) & (px < (xj - xi) * (py - yi) / (yj - yi + 1e-12) + xi)
    return (crossing.sum(axis=-1) % 2).astype(bool)


def _line_positions(strip: np.ndarray, span: int) -> list[int]:
    """Centers of full-span ruling lines in a 1-D coverage profile."""
    covered = np.flatnonzero(strip >= 0.9 * span)
    if covered.size == 0:
        return []
    groups = np.split(covered, np.flatnonzero(np.diff(covered) > 1) + 1)
    return [int(g.mean()) for g in groups]


def detect_table_structure(page: np.ndarray) -> list[dict[str, Any]]:
    """Detect ruled tables on a page -> list of raw table grids
    ``{"cells": [{"geometry", "score", "row_start", ...}], "num_rows",
    "num_cols"}`` with cell geometry in page-relative coords."""
    h, w = page.shape
    ruling = (page >= RULING_THRESH) & (page < BIN_THRESH * 255.0)
    if not ruling.any():
        return []
    rows, starts, ends, labels = label_runs(ruling)
    tables: list[dict[str, Any]] = []
    for root in np.unique(labels):
        sel = labels == root
        y0, y1 = int(rows[sel].min()), int(rows[sel].max()) + 1
        x0, x1 = int(starts[sel].min()), int(ends[sel].max())
        sub = ruling[y0:y1, x0:x1]
        hlines = _line_positions(sub.sum(axis=1), x1 - x0)
        vlines = _line_positions(sub.sum(axis=0), y1 - y0)
        if len(hlines) < 2 or len(vlines) < 2:
            continue
        cells = []
        for i in range(len(hlines) - 1):
            for j in range(len(vlines) - 1):
                cx0 = (x0 + vlines[j] + 1) / w
                cy0 = (y0 + hlines[i] + 1) / h
                cx1 = (x0 + vlines[j + 1]) / w
                cy1 = (y0 + hlines[i + 1]) / h
                cells.append(
                    {
                        "geometry": [cx0, cy0, cx1, cy1],
                        "score": 1.0,
                        "row_start": i,
                        "row_end": i,
                        "col_start": j,
                        "col_end": j,
                    }
                )
        tables.append(
            {"cells": cells, "num_rows": len(hlines) - 1, "num_cols": len(vlines) - 1}
        )
    return tables


def _cell_polygon(geometry) -> np.ndarray:
    arr = np.asarray(geometry, dtype=np.float64)
    if arr.ndim == 1:
        x0, y0, x1, y1 = arr
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    return arr.reshape(-1, 2)


def _order_cell_words(w_idcs: list[int], centers: np.ndarray, heights: np.ndarray) -> list[int]:
    """In-cell reading order: running-mean row clustering top-to-bottom,
    then left-to-right per row (builder.py:370-395)."""
    idcs = sorted(w_idcs, key=lambda i: float(centers[i][1]))
    med_h = float(np.median([heights[i] for i in idcs]))
    if not np.isfinite(med_h) or med_h <= 0:
        med_h = 1.0
    rows: list[list[int]] = [[idcs[0]]]
    y_sum = float(centers[idcs[0]][1])
    for idx in idcs[1:]:
        if float(centers[idx][1]) - y_sum / len(rows[-1]) < med_h / 2:
            rows[-1].append(idx)
            y_sum += float(centers[idx][1])
        else:
            rows.append([idx])
            y_sum = float(centers[idx][1])
    return [i for row in rows for i in sorted(row, key=lambda i: float(centers[i][0]))]


def _localize_logic(cells: list[dict[str, Any]]) -> tuple[list[dict[str, Any]], int, int]:
    min_row = min(int(c["row_start"]) for c in cells)
    min_col = min(int(c["col_start"]) for c in cells)
    out, max_row, max_col = [], 0, 0
    for c in cells:
        nc = dict(c)
        nc["row_start"] = int(c["row_start"]) - min_row
        nc["row_end"] = int(c["row_end"]) - min_row
        nc["col_start"] = int(c["col_start"]) - min_col
        nc["col_end"] = int(c["col_end"]) - min_col
        max_row, max_col = max(max_row, nc["row_end"]), max(max_col, nc["col_end"])
        out.append(nc)
    return out, max_row + 1, max_col + 1


def build_tables(
    boxes: np.ndarray,
    values: list[str],
    confidences: list[float],
    page_tables: list[dict[str, Any]] | None,
) -> tuple[list[dict[str, Any]], np.ndarray]:
    """Assign words to table cells; returns (table export dicts, consumed mask)."""
    n = boxes.shape[0]
    consumed = np.zeros(n, dtype=bool)
    if not page_tables:
        return [], consumed

    centers = (
        np.stack([(boxes[:, 0] + boxes[:, 2]) / 2, (boxes[:, 1] + boxes[:, 3]) / 2], axis=1)
        if n
        else np.empty((0, 2))
    )
    heights = boxes[:, 3] - boxes[:, 1] if n else np.empty(0)

    out_tables = []
    for raw in page_tables:
        if not raw or not raw.get("cells"):
            continue
        cells, n_rows, n_cols = _localize_logic(raw["cells"])
        polys = np.stack([_cell_polygon(c["geometry"]) for c in cells])
        cell_words: list[list[int]] = [[] for _ in cells]

        free = np.flatnonzero(~consumed)
        if free.size:
            inside = points_in_polygons(centers[free], polys)
            assigned = inside.any(axis=1)
            first = np.where(assigned, inside.argmax(axis=1), -1)
            for w, c in zip(free, first):
                if c >= 0:
                    cell_words[c].append(int(w))
                    consumed[w] = True
            # nearest-cell fallback inside the table extent
            leftover = free[~assigned]
            if leftover.size:
                tx0, ty0 = polys[..., 0].min(), polys[..., 1].min()
                tx1, ty1 = polys[..., 0].max(), polys[..., 1].max()
                cell_centers = polys.mean(axis=1)
                max_dist = TABLE_NEAREST_FRAC * float(
                    np.median(np.linalg.norm(polys[:, 2] - polys[:, 0], axis=1))
                )
                in_region = (
                    (centers[leftover, 0] >= tx0)
                    & (centers[leftover, 0] <= tx1)
                    & (centers[leftover, 1] >= ty0)
                    & (centers[leftover, 1] <= ty1)
                )
                for w in leftover[in_region]:
                    dists = np.linalg.norm(cell_centers - centers[w], axis=1)
                    nearest = int(dists.argmin())
                    if dists[nearest] <= max_dist:
                        cell_words[nearest].append(int(w))
                        consumed[w] = True

        cell_exports = []
        for cell, poly, w_idcs in zip(cells, polys, cell_words):
            if w_idcs:
                ordered = _order_cell_words(w_idcs, centers, heights)
                value = " ".join(values[i] for i in ordered)
                conf = float(np.mean([confidences[i] for i in ordered]))
            else:
                value, conf = "", float(cell["score"])
            cell_exports.append(
                {
                    "value": value,
                    "confidence": conf,
                    "geometry": [float(poly[:, 0].min()), float(poly[:, 1].min()),
                                 float(poly[:, 0].max()), float(poly[:, 1].max())],
                    "row_start": cell["row_start"],
                    "row_end": cell["row_end"],
                    "col_start": cell["col_start"],
                    "col_end": cell["col_end"],
                }
            )  # fmt: skip
        out_tables.append(
            {
                "geometry": [float(polys[..., 0].min()), float(polys[..., 1].min()),
                             float(polys[..., 0].max()), float(polys[..., 1].max())],
                "num_rows": n_rows,
                "num_cols": n_cols,
                "confidence": 1.0,
                "cells": cell_exports,
            }
        )  # fmt: skip
    return out_tables, consumed


def table_to_grid(table: dict[str, Any]) -> list[list[str]]:
    grid = [["" for _ in range(table["num_cols"])] for _ in range(table["num_rows"])]
    for cell in table["cells"]:
        if 0 <= cell["row_start"] < table["num_rows"] and 0 <= cell["col_start"] < table["num_cols"]:
            grid[cell["row_start"]][cell["col_start"]] = cell["value"]
    return grid


def render_table(table: dict[str, Any], row_break: str = "\n", col_break: str = "\t") -> str:
    """TSV render (`doctr/io/elements.py:300-302`)."""
    return row_break.join(col_break.join(row) for row in table_to_grid(table))
