"""Reading-order linearization (reference
`/root/reference/doctr/models/reading_order/base.py`).

Reimplements the Breuel-2003-style column-aware topological sort:

* reads-before relations: `i` before `j` when they overlap horizontally
  (> x_overlap_threshold, normalized by the smaller interval) and `i` is
  above `j`; or when they share a visual row (vertical overlap >
  y_overlap_threshold, no horizontal link) and `i` is left of `j`
  (base.py:180-230); strict axis ranks prevent 2-cycles.
* Kahn's algorithm with column-continuation preference among ready nodes
  on multi-column pages, with column connected components (horizontal
  overlap graph, page-spanning elements excluded) as the stay-in-column
  fallback (base.py:230-283).
* direction handling via canonical-LTR remapping (mirror / axis swap,
  base.py:138-156) and bidi-category text-direction detection
  (base.py:83-120).
* layout roles: headers first, footnotes + footers last, captions attached
  to the nearest float by y_gap + 2*x_gap <= 0.1 (base.py:283-315,
  sort_reading_order base.py:382-460).
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterable, Sequence
from typing import Any

import numpy as np

from .cc import _min_label_components

_RTL_BIDI = {"R", "AL"}
RTL_LANGUAGES = {"ar", "he", "fa", "ur", "yi", "ps", "sd", "ug", "dv"}
SUPPORTED_DIRECTIONS = ("ltr", "rtl", "ttb-ltr", "ttb-rtl")

_ROLE_BY_LABEL = {
    "page_header": "header",
    "header": "header",
    "page_footer": "footer",
    "footer": "footer",
    "footnote": "footnote",
    "caption": "caption",
    "table": "float",
    "picture": "float",
    "figure": "float",
    "formula": "float",
}


def detect_text_direction(texts: Iterable[str], language: str | None = None) -> str:
    """ltr/rtl from strong bidi character counts; language-code fallback."""
    rtl = ltr = 0
    for text in texts:
        if not isinstance(text, str):
            continue
        for ch in text:
            bidi = unicodedata.bidirectional(ch)
            if bidi in _RTL_BIDI:
                rtl += 1
            elif bidi == "L":
                ltr += 1
    if rtl == 0 and ltr == 0:
        if isinstance(language, str) and language.split("-")[0].lower() in RTL_LANGUAGES:
            return "rtl"
        return "ltr"
    return "rtl" if rtl > ltr else "ltr"


def _to_boxes(geoms: Sequence[Any] | np.ndarray) -> np.ndarray:
    if isinstance(geoms, np.ndarray) and geoms.ndim == 2 and geoms.shape[1] >= 4:
        return geoms[:, :4].astype(np.float64)
    if isinstance(geoms, np.ndarray) and geoms.ndim == 3:
        return np.concatenate((geoms.min(axis=1), geoms.max(axis=1)), axis=-1).astype(np.float64)
    if len(geoms) == 0:
        return np.zeros((0, 4))
    out = []
    for g in geoms:
        pts = np.asarray(g, dtype=np.float64).reshape(-1, 2)
        out.append([pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()])
    return np.asarray(out)


def _canonical_ltr(boxes: np.ndarray, direction: str) -> np.ndarray:
    if direction == "ltr" or boxes.shape[0] == 0:
        return boxes
    x0, y0, x1, y1 = boxes.T
    pivot = float(x0.min() + x1.max())
    if direction == "rtl":
        return np.stack([pivot - x1, y0, pivot - x0, y1], axis=1)
    if direction == "ttb-ltr":
        return np.stack([y0, x0, y1, x1], axis=1)
    if direction == "ttb-rtl":
        return np.stack([y0, pivot - x1, y1, pivot - x0], axis=1)
    raise ValueError(f"unsupported direction {direction!r}")


def _overlap_ratios(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Pairwise 1-D interval overlap normalized by the smaller interval."""
    lengths = ends - starts
    inter = np.minimum(ends[:, None], ends[None, :]) - np.maximum(starts[:, None], starts[None, :])
    np.clip(inter, 0.0, None, out=inter)
    denom = np.clip(np.minimum(lengths[:, None], lengths[None, :]), 1e-9, None)
    return inter / denom


def _strict_rank(primary: np.ndarray, secondary: np.ndarray) -> np.ndarray:
    order = np.lexsort((np.arange(primary.shape[0]), secondary, primary))
    ranks = np.empty_like(order)
    ranks[order] = np.arange(order.shape[0])
    return ranks


def topological_order(
    boxes: np.ndarray, x_overlap_threshold: float = 0.2, y_overlap_threshold: float = 0.5
) -> list[int]:
    n = boxes.shape[0]
    if n <= 1:
        return list(range(n))
    x0, y0, x1, y1 = boxes.T
    x_overlap = _overlap_ratios(x0, x1)
    y_overlap = _overlap_ratios(y0, y1)
    x_rank = _strict_rank(x0, x1)
    y_rank = _strict_rank(y0, y1)

    x_linked = x_overlap > x_overlap_threshold
    edges = (y_rank[:, None] < y_rank[None, :]) & x_linked
    same_row = (y_overlap > y_overlap_threshold) & ~x_linked & (x_rank[:, None] < x_rank[None, :])
    edges |= same_row
    np.fill_diagonal(edges, False)

    in_degree = edges.sum(axis=0)
    emitted = np.zeros(n, dtype=bool)

    # column components over the horizontal-overlap graph, excluding
    # page-spanning elements (titles) that would merge columns
    page_width = float(x1.max() - x0.min()) or 1.0
    spanning = (x1 - x0) > 0.5 * page_width
    col_adj = x_linked & ~spanning[:, None] & ~spanning[None, :]
    np.fill_diagonal(col_adj, False)
    pairs = np.argwhere(np.triu(col_adj, 1))
    component = _min_label_components(n, pairs[:, 0], pairs[:, 1]) if pairs.size else np.arange(n)

    # multi-column test: a vertical split with few crossers and both sides
    # holding >= 25% of the elements
    multi_column = False
    if n >= 3:
        tolerance = max(1, int(0.05 * n))
        centers = (x0 + x1) / 2
        lo, hi = x0.min() + 0.25 * page_width, x0.min() + 0.75 * page_width
        for split in np.unique(x1[(x1 >= lo) & (x1 <= hi)]):
            crossing = int(np.count_nonzero(np.minimum(x1 - split, split - x0) > 0.02 * page_width))
            left = int(np.count_nonzero(centers <= split))
            if crossing <= tolerance and left >= 0.25 * n and n - left >= 0.25 * n:
                multi_column = True
                break

    order: list[int] = []
    last = -1
    while len(order) < n:
        ready = np.flatnonzero((in_degree == 0) & ~emitted)
        if ready.size == 0:  # degenerate-cycle safety net
            ready = np.flatnonzero(~emitted)
            candidates = ready
        else:
            candidates = (
                ready[(x_overlap[last, ready] > x_overlap_threshold) & (y0[ready] >= y0[last])]
                if last >= 0 and multi_column
                else np.empty(0, dtype=int)
            )
            if candidates.size == 0 and last >= 0:
                candidates = ready[y_overlap[last, ready] > y_overlap_threshold]
            if candidates.size == 0 and last >= 0 and not spanning[last]:
                same_col = ready[component[ready] == component[last]]
                candidates = same_col if same_col.size else ready
            elif candidates.size == 0:
                candidates = ready
        nxt = int(candidates[np.lexsort((x0[candidates], y0[candidates]))[0]])
        order.append(nxt)
        emitted[nxt] = True
        in_degree = in_degree - edges[nxt]
        last = nxt
    return order


def _attach_captions(
    order: list[int], captions: list[int], boxes: np.ndarray, roles: list[str], max_distance: float
) -> list[int]:
    floats = [i for i in order if roles[i] == "float"]
    for cap in captions:
        cx0, cy0, cx1, cy1 = boxes[cap]
        best, best_d = -1, float("inf")
        for t in floats:
            tx0, ty0, tx1, ty1 = boxes[t]
            d = max(ty0 - cy1, cy0 - ty1, 0.0) + 2 * max(tx0 - cx1, cx0 - tx1, 0.0)
            if d < best_d:
                best, best_d = t, d
        if best >= 0 and best_d <= max_distance:
            pos = order.index(best)
            above = (cy0 + cy1) / 2 <= (boxes[best, 1] + boxes[best, 3]) / 2
            order.insert(pos if above else pos + 1, cap)
        else:
            pos = next((i for i, idx in enumerate(order) if boxes[idx, 1] >= cy0), len(order))
            order.insert(pos, cap)
    return order


def sort_reading_order(
    geoms: Sequence[Any] | np.ndarray,
    direction: str = "ltr",
    labels: Sequence[str | None] | None = None,
    x_overlap_threshold: float = 0.2,
    y_overlap_threshold: float = 0.5,
    caption_max_distance: float = 0.1,
) -> list[int]:
    """Permutation of the input indices in reading order.

    Docstring oracle from the reference (base.py:394-402): a title spanning
    two columns -> [title, left column, right column].
    """
    if direction not in SUPPORTED_DIRECTIONS:
        raise ValueError(f"direction must be one of {SUPPORTED_DIRECTIONS}")
    boxes = _to_boxes(geoms)
    n = boxes.shape[0]
    if n <= 1:
        return list(range(n))
    canonical = _canonical_ltr(boxes, direction)

    def _order(idcs: list[int]) -> list[int]:
        if not idcs:
            return []
        sub = topological_order(canonical[idcs], x_overlap_threshold, y_overlap_threshold)
        return [idcs[i] for i in sub]

    if labels is None:
        return _order(list(range(n)))

    roles = [_ROLE_BY_LABEL.get((label or "").lower(), "body") for label in labels]
    groups: dict[str, list[int]] = {"header": [], "body": [], "caption": [], "footnote": [], "footer": []}
    for i, role in enumerate(roles):
        groups["body" if role == "float" else role].append(i)
    body = _attach_captions(
        _order(groups["body"]), _order(groups["caption"]), canonical,
        ["float" if r == "float" else r for r in roles], caption_max_distance,
    )  # fmt: skip
    return _order(groups["header"]) + body + _order(groups["footnote"]) + _order(groups["footer"])


def resolve_reading_segments(
    geoms: Sequence[Any] | np.ndarray,
    direction: str = "ltr",
    labels: Sequence[str | None] | None = None,
    x_overlap_threshold: float = 0.2,
    y_overlap_threshold: float = 0.5,
    caption_max_distance: float = 0.1,
    paragraph_gap: float = 0.8,
) -> list[list[int]]:
    """Reading order + paragraph/region segmentation (reference
    `resolve_reading_segments`, reading_order/base.py:460-531): consecutive
    ordered elements merge into one segment when they carry the same layout
    label, are not floats, share a column (x-overlap > threshold in the
    canonical-LTR frame) and sit within ``paragraph_gap`` x median element
    height vertically. Returns a partition of the indices into
    reading-ordered segments."""
    order = sort_reading_order(
        geoms,
        direction=direction,
        labels=labels,
        x_overlap_threshold=x_overlap_threshold,
        y_overlap_threshold=y_overlap_threshold,
        caption_max_distance=caption_max_distance,
    )
    if not order:
        return []
    canonical = _canonical_ltr(_to_boxes(geoms), direction)
    median_height = float(np.median(canonical[:, 3] - canonical[:, 1]))
    roles = [
        _ROLE_BY_LABEL.get(((labels[i] if labels is not None else None) or "").lower(), "body")
        for i in range(len(order))
    ]
    norm = [((labels[i] if labels is not None else None) or "").lower() for i in range(len(order))]

    segments: list[list[int]] = [[order[0]]]
    for prev, cur in zip(order[:-1], order[1:]):
        x_gap = min(canonical[prev, 2], canonical[cur, 2]) - max(canonical[prev, 0], canonical[cur, 0])
        x_overlap = x_gap / max(
            min(canonical[prev, 2] - canonical[prev, 0], canonical[cur, 2] - canonical[cur, 0]), 1e-9
        )
        same_segment = (
            norm[prev] == norm[cur]
            and roles[cur] != "float"
            and x_overlap > x_overlap_threshold
            and canonical[cur, 1] - canonical[prev, 3] <= paragraph_gap * median_height
        )
        if same_segment:
            segments[-1].append(cur)
        else:
            segments.append([cur])
    return segments


def ordered_line_words(
    word_boxes: np.ndarray,
    values: Sequence[str],
    direction: str = "ltr",
    auto: bool = False,
) -> list[int]:
    """Word order within one line, by reading direction (reference
    `ordered_line_words` / `_line_render_direction`,
    io/exporters.py:219-250): vertical pages read top-to-bottom; with an
    auto-detected page direction each line takes its OWN base direction
    from its text (an embedded Latin run on an RTL page keeps its natural
    order); an explicit direction applies uniformly. Returns a permutation
    of the word indices."""
    n = word_boxes.shape[0]
    if auto and direction not in ("ttb-rtl", "ttb-ltr") and n > 1:
        direction = detect_text_direction(values)
    if direction in ("ttb-rtl", "ttb-ltr"):
        key = (word_boxes[:, 1] + word_boxes[:, 3]) / 2
        return [int(i) for i in np.argsort(key, kind="stable")]
    if direction == "rtl":
        key = -(word_boxes[:, 0] + word_boxes[:, 2]) / 2
        return [int(i) for i in np.argsort(key, kind="stable")]
    return list(range(n))


_LIST_LABELS = {"list_item"}


def _covering_region_indices(boxes: np.ndarray, region_boxes: np.ndarray, min_cov: float = 0.5) -> list[int]:
    """Per element: index of the region covering most of its area (>=
    min_cov), else -1 (reference `_covering_region_indices`,
    io/exporters.py:92-111 companion of assign_layout_labels)."""
    if region_boxes.shape[0] == 0:
        return [-1] * boxes.shape[0]
    ix0 = np.maximum(boxes[:, None, 0], region_boxes[None, :, 0])
    iy0 = np.maximum(boxes[:, None, 1], region_boxes[None, :, 1])
    ix1 = np.minimum(boxes[:, None, 2], region_boxes[None, :, 2])
    iy1 = np.minimum(boxes[:, None, 3], region_boxes[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    areas = np.clip((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-9, None)
    cov = inter / areas[:, None]
    best = cov.argmax(axis=1)
    return [int(b) if cov[i, b] >= min_cov else -1 for i, b in enumerate(best)]


def group_reading_items(
    geoms: Sequence[Any] | np.ndarray,
    direction: str = "ltr",
    labels: Sequence[str | None] | None = None,
    region_geoms: Sequence[Any] | np.ndarray | None = None,
    **segment_kwargs: Any,
) -> list[list[int]]:
    """Reading segments with list-item grouping (the reference's
    `page_reading_order` list handling, io/exporters.py:176-205): inside a
    segment labeled as a list item, consecutive lines covered by the SAME
    list region merge into one item — a bullet wrapped over several visual
    lines renders as a single bullet — while lines from different regions
    start new items. Non-list segments pass through unchanged."""
    segments = resolve_reading_segments(geoms, direction=direction, labels=labels, **segment_kwargs)
    if labels is None or region_geoms is None or len(segments) == 0:
        return segments
    region_idx = _covering_region_indices(_to_boxes(geoms), _to_boxes(region_geoms))
    items: list[list[int]] = []
    open_region: int | None = None
    for seg in segments:
        label = ((labels[seg[0]] if labels is not None else None) or "").lower()
        if label in _LIST_LABELS:
            for i in seg:
                r = region_idx[i]
                if open_region is not None and r == open_region and r != -1:
                    items[-1].append(i)
                else:
                    items.append([i])
                    open_region = r
        else:
            items.append(list(seg))
            open_region = None
    return items
