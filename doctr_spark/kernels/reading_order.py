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


def _pairwise_overlap(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """n x n matrix of 1-D interval overlaps, each normalized by the
    shorter of the two intervals (so a thin fragment nested in a wide line
    still counts as fully overlapping)."""
    shared = np.clip(
        np.minimum.outer(hi, hi) - np.maximum.outer(lo, lo), 0.0, None
    )
    span = hi - lo
    shorter = np.clip(np.minimum.outer(span, span), 1e-9, None)
    return shared / shorter


def _axis_rank(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Position of each interval in the strict total order (lo, hi, index).

    Comparing RANKS instead of raw coordinates makes "above"/"left of"
    antisymmetric even for identical boxes, so the precedence relation can
    never contain a 2-cycle.
    """
    n = lo.shape[0]
    by = np.lexsort((np.arange(n), hi, lo))
    rank = np.empty(n, dtype=np.int64)
    rank[by] = np.arange(n)
    return rank


def _precedence(
    boxes: np.ndarray, x_thr: float, y_thr: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the reads-before DAG (Breuel-2003 relations, cf. reference
    reading_order/base.py:180-230).

    Returns ``(prec, stacked, y_overlap)`` where ``prec[i, j]`` means i is
    read before j: either the two share a column (horizontal overlap above
    ``x_thr``) and i sits higher, or they share a visual row (vertical
    overlap above ``y_thr``, no column link) and i sits further left.
    """
    x0, y0, x1, y1 = boxes.T
    stacked = _pairwise_overlap(x0, x1) > x_thr
    y_overlap = _pairwise_overlap(y0, y1)
    v_rank, h_rank = _axis_rank(y0, y1), _axis_rank(x0, x1)
    higher = np.less.outer(v_rank, v_rank)
    lefter = np.less.outer(h_rank, h_rank)
    prec = (stacked & higher) | (~stacked & (y_overlap > y_thr) & lefter)
    np.fill_diagonal(prec, False)
    return prec, stacked, y_overlap


def _column_ids(stacked: np.ndarray, full_span: np.ndarray) -> np.ndarray:
    """Connected components of the column graph: elements linked by
    horizontal overlap, with page-spanning elements (titles) removed so
    they cannot bridge two columns into one."""
    n = stacked.shape[0]
    narrow = ~full_span
    adj = stacked & narrow[:, None] & narrow[None, :]
    np.fill_diagonal(adj, False)
    src, dst = np.nonzero(np.triu(adj, 1))
    return _min_label_components(n, src, dst) if src.size else np.arange(n)


def _looks_multi_column(boxes: np.ndarray, page_width: float) -> bool:
    """True when some vertical line splits the elements into two groups of
    >= 25% each with at most ~5% of elements crossing it."""
    n = boxes.shape[0]
    if n < 3:
        return False
    x0, x1 = boxes[:, 0], boxes[:, 2]
    allowed_crossers = max(1, int(0.05 * n))
    mid = (x0 + x1) / 2
    lo, hi = x0.min() + 0.25 * page_width, x0.min() + 0.75 * page_width
    for cut in np.unique(x1[(x1 >= lo) & (x1 <= hi)]):
        crossers = int(np.count_nonzero(np.minimum(x1 - cut, cut - x0) > 0.02 * page_width))
        n_left = int(np.count_nonzero(mid <= cut))
        if crossers <= allowed_crossers and min(n_left, n - n_left) >= 0.25 * n:
            return True
    return False


def topological_order(
    boxes: np.ndarray, x_overlap_threshold: float = 0.2, y_overlap_threshold: float = 0.5
) -> list[int]:
    """Column-following Kahn traversal of the reads-before DAG (reference
    reading_order/base.py:180-283; relations re-derived above).

    Among the ready nodes, the walk prefers — in this priority order —
    (1) on split layouts, a column continuation of the element just
    emitted (overlapping it horizontally, not above it), (2) the rest of
    its visual row, (3) anything left in its column component; each pool
    falls through to the next when empty, and ties always resolve
    topmost-then-leftmost.
    """
    n = boxes.shape[0]
    if n <= 1:
        return list(range(n))
    x0, y0, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    prec, stacked, y_overlap = _precedence(boxes, x_overlap_threshold, y_overlap_threshold)

    page_width = float(x1.max() - x0.min()) or 1.0
    full_span = (x1 - x0) > 0.5 * page_width
    column = _column_ids(stacked, full_span)
    split_layout = _looks_multi_column(boxes, page_width)

    blockers = prec.sum(axis=0)
    done = np.zeros(n, dtype=bool)
    walk: list[int] = []
    prev = -1

    def _pools(ready: np.ndarray) -> Iterable[np.ndarray]:
        if prev >= 0:
            if split_layout:
                yield ready[stacked[prev, ready] & (y0[ready] >= y0[prev])]
            yield ready[y_overlap[prev, ready] > y_overlap_threshold]
            if not full_span[prev]:
                yield ready[column[ready] == column[prev]]
        yield ready

    while len(walk) < n:
        ready = np.flatnonzero((blockers == 0) & ~done)
        if ready.size == 0:  # degenerate geometry produced a cycle: flush
            ready = np.flatnonzero(~done)
            pool = ready
        else:
            pool = next(p for p in _pools(ready) if p.size)
        pick = int(pool[np.lexsort((x0[pool], y0[pool]))[0]])
        walk.append(pick)
        done[pick] = True
        blockers -= prec[pick]
        prev = pick
    return walk


def _caption_gap(boxes: np.ndarray, cap: int, targets: list[int]) -> np.ndarray:
    """Rectangle gap from one caption to each target float, horizontal
    shift penalized 2x (captions sit right above/below their float)."""
    t = boxes[targets]
    dy = np.maximum(np.maximum(t[:, 1] - boxes[cap, 3], boxes[cap, 1] - t[:, 3]), 0.0)
    dx = np.maximum(np.maximum(t[:, 0] - boxes[cap, 2], boxes[cap, 0] - t[:, 2]), 0.0)
    return dy + 2 * dx


def _attach_captions(
    order: list[int], captions: list[int], boxes: np.ndarray, roles: list[str], max_distance: float
) -> list[int]:
    """Splice captions next to their float (before when the caption sits
    above the float's center, after otherwise); a caption with no float
    within ``max_distance`` re-enters at its natural vertical position
    (reference reading_order/base.py:283-315)."""
    floats = [i for i in order if roles[i] == "float"]
    for cap in captions:
        anchor = -1
        if floats:
            gaps = _caption_gap(boxes, cap, floats)
            nearest = int(gaps.argmin())  # ties -> earliest float in reading order
            if gaps[nearest] <= max_distance:
                anchor = floats[nearest]
        if anchor >= 0:
            cap_mid = (boxes[cap, 1] + boxes[cap, 3]) / 2
            anchor_mid = (boxes[anchor, 1] + boxes[anchor, 3]) / 2
            at = order.index(anchor) + (0 if cap_mid <= anchor_mid else 1)
        else:
            below = [i for i, idx in enumerate(order) if boxes[idx, 1] >= boxes[cap, 1]]
            at = below[0] if below else len(order)
        order.insert(at, cap)
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
    frame = _canonical_ltr(boxes, direction)

    def _ordered(members: list[int]) -> list[int]:
        if not members:
            return []
        return [members[k] for k in topological_order(frame[members], x_overlap_threshold, y_overlap_threshold)]

    if labels is None:
        return _ordered(list(range(n)))

    roles = [_ROLE_BY_LABEL.get((label or "").lower(), "body") for label in labels]
    by_role: dict[str, list[int]] = {"header": [], "body": [], "caption": [], "footnote": [], "footer": []}
    for i, role in enumerate(roles):
        by_role["body" if role == "float" else role].append(i)
    body = _attach_captions(
        _ordered(by_role["body"]), _ordered(by_role["caption"]), frame, roles, caption_max_distance
    )
    return _ordered(by_role["header"]) + body + _ordered(by_role["footnote"]) + _ordered(by_role["footer"])


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
    frame = _canonical_ltr(_to_boxes(geoms), direction)
    typical_height = float(np.median(frame[:, 3] - frame[:, 1]))
    tags = [((labels[i] if labels is not None else None) or "").lower() for i in range(len(order))]

    # vectorized over consecutive ordered pairs: merge iff same tag, the
    # follower is not a float, the pair shares a column, and the vertical
    # gap stays under paragraph_gap x typical element height
    seq = np.asarray(order)
    lead, follow = frame[seq[:-1]], frame[seq[1:]]
    shared_x = np.minimum(lead[:, 2], follow[:, 2]) - np.maximum(lead[:, 0], follow[:, 0])
    narrower = np.maximum(np.minimum(lead[:, 2] - lead[:, 0], follow[:, 2] - follow[:, 0]), 1e-9)
    tag_pairs = np.array(
        [
            tags[a] == tags[b] and _ROLE_BY_LABEL.get(tags[b], "body") != "float"
            for a, b in zip(seq[:-1], seq[1:])
        ],
        dtype=bool,
    )
    merge = (
        tag_pairs
        & (shared_x / narrower > x_overlap_threshold)
        & (follow[:, 1] - lead[:, 3] <= paragraph_gap * typical_height)
    )
    return [chunk.tolist() for chunk in np.split(seq, np.flatnonzero(~merge) + 1)]


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
