"""Run-based 8-connected component labeling, pure numpy + union-find.

This is the engine's replacement for `cv2.findContours` in the detection
postprocess (reference
`doctr/models/detection/differentiable_binarization/base.py:95-140` finds
contours of the binarized probability map and scores each one). We label
components over horizontal runs: runs are extracted with one vectorized pass,
then runs in adjacent rows are unioned when they overlap or touch
diagonally. Cost is O(runs) with tiny constants — ink on synthetic pages is
sparse, so this is far cheaper than pixel-level labeling.
"""

from __future__ import annotations

import numpy as np


def _find(parent: np.ndarray, i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    while parent[i] != root:  # path compression
        parent[i], i = root, parent[i]
    return root


def label_runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Extract horizontal runs of True pixels.

    Returns (rows, starts, ends, labels) where ends are exclusive and labels
    are root ids (not yet compacted) after 8-connectivity unioning.
    """
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = mask
    diff = np.diff(padded.view(np.int8), axis=1)
    start_pos = np.argwhere(diff == 1)  # row-major order
    end_pos = np.argwhere(diff == -1)
    rows = start_pos[:, 0]
    starts = start_pos[:, 1]
    ends = end_pos[:, 1]  # exclusive

    n = rows.shape[0]
    parent = np.arange(n, dtype=np.int64)
    if n:
        # row boundaries in the run arrays (rows are sorted ascending)
        row_first = np.searchsorted(rows, np.arange(h), side="left")
        row_last = np.searchsorted(rows, np.arange(h), side="right")
        for r in range(1, h):
            lo, hi = row_first[r], row_last[r]
            plo, phi = row_first[r - 1], row_last[r - 1]
            if lo == hi or plo == phi:
                continue
            cur_s, cur_e = starts[lo:hi], ends[lo:hi]
            prev_s, prev_e = starts[plo:phi], ends[plo:phi]
            # 8-connectivity: runs [s,e) touch iff prev_s <= cur_e and cur_s <= prev_e
            j_lo = np.searchsorted(prev_e, cur_s, side="left")
            j_hi = np.searchsorted(prev_s, cur_e, side="right")
            for i in range(hi - lo):
                a = _find(parent, lo + i)
                for j in range(j_lo[i], j_hi[i]):
                    b = _find(parent, plo + j)
                    if a != b:
                        parent[b] = a
        for i in range(n):
            parent[i] = _find(parent, i)
    return rows, starts, ends, parent


def component_boxes(prob: np.ndarray, bin_thresh: float) -> tuple[np.ndarray, np.ndarray]:
    """Binarize a probability map and return per-component (boxes, scores).

    boxes: (N, 4) int64 abs pixel coords (xmin, ymin, xmax, ymax), max
    exclusive; scores: (N,) mean probability over the component's ink pixels
    (the reference scores the contour region the same way,
    `detection/core.py:36-58`).
    """
    mask = prob >= bin_thresh
    rows, starts, ends, labels = label_runs(mask)
    if rows.shape[0] == 0:
        return np.empty((0, 4), dtype=np.int64), np.empty(0, dtype=np.float64)

    # per-run probability sums via row-wise cumsum
    cs = np.cumsum(prob, axis=1, dtype=np.float64)
    run_sum = cs[rows, ends - 1] - np.where(starts > 0, cs[rows, starts - 1], 0.0)
    run_px = (ends - starts).astype(np.int64)

    roots, inv = np.unique(labels, return_inverse=True)
    k = roots.shape[0]
    xmin = np.full(k, np.iinfo(np.int64).max)
    xmax = np.zeros(k, dtype=np.int64)
    ymin = np.full(k, np.iinfo(np.int64).max)
    ymax = np.zeros(k, dtype=np.int64)
    np.minimum.at(xmin, inv, starts)
    np.maximum.at(xmax, inv, ends)
    np.minimum.at(ymin, inv, rows)
    np.maximum.at(ymax, inv, rows + 1)
    psum = np.zeros(k, dtype=np.float64)
    pcnt = np.zeros(k, dtype=np.int64)
    np.add.at(psum, inv, run_sum)
    np.add.at(pcnt, inv, run_px)

    boxes = np.stack([xmin, ymin, xmax, ymax], axis=1)
    scores = psum / pcnt
    # deterministic output order: top-to-bottom, left-to-right
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    return boxes[order], scores[order]
