"""Ruled-table page fixture: renders a word grid with ruling lines and
exact TSV ground truth (mirrors the reference's table test fixtures,
`tests/conftest.py:166-186`)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import GLYPH_H, MARGIN, PAGE_H, PAGE_W, RULING_INK, TABLE_CELL_H, WORD_GAP
from ..kernels.glyphs import draw_word, word_width


@dataclass
class TablePage:
    canvas: np.ndarray
    gt_tsv: str
    n_words: int


def render_table_page(
    cell_words: list[list[list[str]]],
    page_h: int = PAGE_H,
    page_w: int = PAGE_W,
) -> TablePage:
    """cell_words[row][col] = list of word strings for that cell."""
    n_rows = len(cell_words)
    n_cols = len(cell_words[0])
    need = max(
        (sum(word_width(w) for w in ws) + WORD_GAP * max(len(ws) - 1, 0))
        for row in cell_words
        for ws in row
    )
    cw = min(max(need + 8, 40), (page_w - 2 * MARGIN - 1) // n_cols)
    ch = TABLE_CELL_H
    x0t, y0t = MARGIN, MARGIN
    canvas = np.zeros((page_h, page_w), dtype=np.uint8)

    # ruling lines (sub-threshold intensity: invisible to word detection)
    for i in range(n_rows + 1):
        canvas[y0t + i * ch, x0t : x0t + n_cols * cw + 1] = RULING_INK
    for j in range(n_cols + 1):
        canvas[y0t : y0t + n_rows * ch + 1, x0t + j * cw] = RULING_INK

    n_words = 0
    drawn: list[list[list[str]]] = []
    for i, row in enumerate(cell_words):
        drawn_row: list[list[str]] = []
        for j, ws in enumerate(row):
            x = x0t + j * cw + 3
            y = y0t + i * ch + 4
            got: list[str] = []
            for w in ws:
                if x + word_width(w) > x0t + (j + 1) * cw - 1:
                    break  # cell overflow guard: ground truth tracks what was drawn
                draw_word(canvas, x, y, w)
                x += word_width(w) + WORD_GAP
                got.append(w)
                n_words += 1
            drawn_row.append(got)
        drawn.append(drawn_row)
    gt = "\n".join("\t".join(" ".join(ws) for ws in row) for row in drawn)
    return TablePage(canvas=canvas, gt_tsv=gt, n_words=n_words)
