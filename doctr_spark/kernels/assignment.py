"""Optimal linear-sum assignment (Hungarian algorithm, augmenting-path /
Jonker-Volgenant potentials form — the classic O(n^3) textbook algorithm).

The reference matches predicted to ground-truth boxes with
`scipy.optimize.linear_sum_assignment` on the negated IoU matrix
(`doctr/utils/metrics.py:268-290`); scipy is absent in this container, so
the solver is reimplemented from the standard shortest-augmenting-path
formulation. Greedy best-first matching (round 1) diverges exactly when
boxes compete for the same partner — the hard pages where the metric
matters."""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimize sum(cost[rows, cols]) over one-to-one assignments.

    Rectangular matrices assign min(n_rows, n_cols) pairs. Returns
    (row_idx, col_idx) sorted by row, matching scipy's contract.
    """
    c = np.asarray(cost, dtype=np.float64)
    if c.ndim != 2:
        raise ValueError("cost must be 2-D")
    transposed = c.shape[0] > c.shape[1]
    if transposed:
        c = c.T
    n, m = c.shape
    if n == 0 or m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    # potentials over rows (u) and columns (v); p[j] = row assigned to col j
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, np.inf)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = int(p[j0])
            js = np.flatnonzero(~used[1:]) + 1
            cur = c[i0 - 1, js - 1] - u[i0] - v[js]
            better = cur < minv[js]
            minv[js[better]] = cur[better]
            way[js[better]] = j0
            jb = js[np.argmin(minv[js])]
            delta = minv[jb]
            upd = used
            u[p[upd]] += delta
            v[upd] -= delta
            minv[~upd] -= delta
            j0 = int(jb)
            if p[j0] == 0:
                break
        while j0:
            j1 = int(way[j0])
            p[j0] = p[j1]
            j0 = j1
    rows = np.flatnonzero(p[1:]) + 1
    row_idx = p[rows] - 1
    col_idx = rows - 1
    order = np.argsort(row_idx)
    row_idx, col_idx = row_idx[order], col_idx[order]
    if transposed:
        row_idx, col_idx = col_idx, row_idx
        order = np.argsort(row_idx)
        row_idx, col_idx = row_idx[order], col_idx[order]
    return row_idx, col_idx
