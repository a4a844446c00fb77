"""Layout-region operators.

* `assign_layout_labels` — the area-coverage join
  (`doctr/models/reading_order/base.py:534-578`, same criterion in
  `doctr/io/exporters.py:71-89`): each element takes the label of the
  region covering >= `min_coverage` of its own area, argmax over the
  N x R intersection-over-area matrix; uncovered elements keep None.
* `detect_layout_regions` — deterministic stand-in for the LW-DETR layout
  predictor (`doctr/models/layout/predictor/pytorch.py:19-84`, DocLayNet
  classes `doctr/models/layout/lw_detr/pytorch.py:36-51`): regions are the
  vertical ink bands of the page (blank-row splits), labeled by
  position/shape signatures — header/footer margins, ruling structure
  (grid -> table, single underline -> section_header, left gutter bar ->
  list_item), artefact-dominated bands -> picture, a centered narrow top
  band -> title, a text band hugging a float band -> caption, a bottom
  band opening with a bracketed digit marker -> footnote, a single rule
  with ink above AND below -> fraction bar -> formula (the classic
  rule-based layout-analysis cues). Covers all 11 DocLayNet classes
  and drives the role handling in reading order,
  caption attachment, list-item grouping, and the furniture filter with
  real geometry.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..config import BIN_THRESH, RULING_THRESH


def intersection_over_area(elements: np.ndarray, regions: np.ndarray) -> np.ndarray:
    """(N, 4) x (R, 4) -> (N, R) matrix of |elem ∩ region| / |elem|."""
    if elements.shape[0] == 0 or regions.shape[0] == 0:
        return np.zeros((elements.shape[0], regions.shape[0]))
    lt = np.maximum(elements[:, None, :2], regions[None, :, :2])
    rb = np.minimum(elements[:, None, 2:], regions[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = np.clip(
        (elements[:, 2] - elements[:, 0]) * (elements[:, 3] - elements[:, 1]), 1e-12, None
    )
    return inter / area[:, None]


def assign_layout_labels(
    elements: np.ndarray,
    regions: np.ndarray,
    labels: list[str],
    min_coverage: float = 0.5,
) -> list[str | None]:
    """Label of the region covering >= min_coverage of each element
    (argmax over coverage); None when uncovered."""
    cov = intersection_over_area(elements, regions)
    out: list[str | None] = []
    for i in range(elements.shape[0]):
        if cov.shape[1] == 0 or cov[i].max() < min_coverage:
            out.append(None)
        else:
            out.append(labels[int(cov[i].argmax())])
    return out


def _true_runs(mask: np.ndarray) -> int:
    """Number of contiguous True runs in a 1-D boolean mask."""
    if not mask.any():
        return 0
    m = mask.astype(np.int8)
    return int(((np.diff(m) == 1).sum()) + int(m[0] == 1))


def _ruled_band_label(ruled: np.ndarray, ink: np.ndarray) -> str:
    """Classify a band containing ruling-intensity ink by its structure:

    * >= 2 horizontal rules, or a horizontal + a vertical rule -> grid ->
      ``table``;
    * exactly one horizontal rule with text ink BOTH above and below it ->
      a fraction bar -> ``formula``;
    * exactly one horizontal rule otherwise (the underline beneath the
      text) -> ``section_header``;
    * only a vertical rule (the left gutter bar) -> ``list_item``.
    """
    rule_rows = ruled.mean(axis=1) > 0.5
    row_runs = _true_runs(rule_rows)
    col_runs = _true_runs(ruled.mean(axis=0) > 0.5)
    if row_runs >= 2 or (row_runs >= 1 and col_runs >= 1):
        return "table"
    if row_runs == 1:
        ink_rows = np.flatnonzero(ink.any(axis=1))
        rr = np.flatnonzero(rule_rows)
        if ink_rows.size and ink_rows[0] < rr[0] and ink_rows[-1] > rr[-1]:
            return "formula"
        return "section_header"
    if col_runs >= 1:
        return "list_item"
    return "table"  # fragmentary ruling (partial grid) stays a table


def _footnote_marker(band: np.ndarray) -> bool:
    """True when the band's first word decodes to a bracketed digit marker
    ("[1]", "[23]", ...) — the classic footnote cue. Only consulted for
    single-line bands in the lower page region."""
    import re

    from ..config import GLYPH_H, WORD_GAP
    from .glyphs import read_codes
    from .vocab import DEFAULT_VOCAB, decode_sequence

    if band.shape[0] != GLYPH_H:
        return False
    cols = np.flatnonzero((band > 0).any(axis=0))
    if cols.size == 0:
        return False
    gaps = np.flatnonzero(np.diff(cols) >= WORD_GAP)
    end = int(cols[gaps[0]]) + 1 if gaps.size else int(cols[-1]) + 1
    first = band[:, int(cols[0]) : end]
    codes = read_codes(first)
    codes = codes[codes < len(DEFAULT_VOCAB)]
    return bool(re.fullmatch(r"\[\d+\]", decode_sequence(codes)))


def detect_layout_regions(page: np.ndarray) -> dict[str, Any]:
    """Page -> `{"boxes": (R, 4) relative, "class_names": [...], "scores": [...]}`
    (the LayoutPredictor output contract, builder.py:290-312)."""
    h, w = page.shape
    ink = page >= BIN_THRESH * 255.0
    ruling = (page >= RULING_THRESH) & ~ink
    any_ink = ink.any(axis=1) | ruling.any(axis=1)
    rows = np.flatnonzero(any_ink)
    boxes, names = [], []
    if rows.size:
        splits = np.split(rows, np.flatnonzero(np.diff(rows) > 1) + 1)
        for band in splits:
            y0, y1 = int(band[0]), int(band[-1]) + 1
            cols = np.flatnonzero(ink[y0:y1].any(axis=0) | ruling[y0:y1].any(axis=0))
            x0, x1 = int(cols[0]), int(cols[-1]) + 1
            # artefact-shaped bands (photo/logo/bar/QR signatures) label as
            # picture, driving the float role + ignore_regions path with
            # real geometry
            is_picture = False
            if (y1 - y0) >= 32:
                from .artefacts import detect_artefacts

                band_img = page[y0:y1, x0:x1]
                arts = detect_artefacts(band_img)
                band_area = (y1 - y0) * (x1 - x0)
                art_area = sum((b[2] - b[0]) * (b[3] - b[1]) for b in (a["box"] for a in arts))
                is_picture = art_area > 0.5 * band_area
            if is_picture:
                name = "picture"
            elif ruling[y0:y1, x0:x1].any():
                name = _ruled_band_label(ruling[y0:y1, x0:x1], ink[y0:y1, x0:x1])
            elif y1 <= 0.12 * h:
                name = "page_header"
            elif y0 >= 0.88 * h:
                name = "page_footer"
            else:
                name = "text"
            boxes.append([x0, y0, x1, y1])
            names.append(name)
    # second pass over the y-ordered bands: geometry/context cues that need
    # neighbors — title, caption, footnote
    for i, (name, (x0, y0, x1, y1)) in enumerate(zip(names, boxes)):
        if name != "text":
            continue
        first_content = all(n == "page_header" for n in names[:i])
        if first_content and y0 < 0.3 * h and x0 > 0.2 * w and (x1 - x0) < 0.5 * w:
            names[i] = "title"
            continue
        hugs_prev = i > 0 and names[i - 1] in ("picture", "table") and y0 - boxes[i - 1][3] <= 6
        hugs_next = (
            i + 1 < len(names)
            and names[i + 1] in ("picture", "table")
            and boxes[i + 1][1] - y1 <= 6
        )
        if hugs_prev or hugs_next:
            names[i] = "caption"
            continue
        if y1 > 0.7 * h and _footnote_marker(page[y0:y1, x0:x1]):
            names[i] = "footnote"
    rel = [[x0 / w, y0 / h, x1 / w, y1 / h] for x0, y0, x1, y1 in boxes]
    return {
        "boxes": np.asarray(rel, dtype=float).reshape(-1, 4),
        "class_names": names,
        "scores": [1.0] * len(names),
    }
