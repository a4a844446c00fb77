"""Arbitrary-angle rotated-page geometry.

Raster path — rotation by three shears (Paeth '86, "A Fast Algorithm for
General Raster Rotation"): R(a) = Sx(-tan(a/2)) . Sy(sin a) . Sx(-tan(a/2)).
Each shear shifts whole rows/columns by integer offsets, so it is a
permutation of pixels — lossless and exactly invertible by applying the
inverse shears in reverse order. This matters here because the engine's
deterministic glyph ink must survive a rotate -> straighten round trip
bit-for-bit for recognition to stay exact; interpolating rotation (the
cv2.warpAffine path the reference uses, `doctr/utils/geometry.py:333-460`
rotate_image) cannot guarantee that without a real NN's robustness.

Skew estimation — projection-profile search (Baird '87 / Postl '86): for
each candidate angle the ink pixels are projected onto the y axis after
counter-rotation and the profile variance is scored; text lines realign at
the true skew, maximizing variance. The top coarse candidates are then
re-scored exactly (unrotate + row-profile variance). The reference's own
mechanism — `estimate_orientation` (`doctr/models/_utils.py:42-160`),
median of min-area-rect angles over the most elongated contours — is also
implemented (`estimate_orientation_contours`, with findContours/minAreaRect
re-expressed as run-labeled components + rotating calipers) and feeds the
same shortlist; the exact re-score arbitrates between the two mechanisms.

Polygon path — numpy re-expressions of the reference kernels:
`rotate_abs_geoms` (`geometry.py:220-248`), `remap_boxes`
(`geometry.py:251-276`), `resolve_enclosing_rbbox` (`geometry.py:150-168`,
minAreaRect replaced by convex hull + rotating calipers), `extract_rcrops`
(`geometry.py:533-648`, warpAffine replaced by an inverse-mapped
nearest-neighbor affine sample).
"""

from __future__ import annotations

import numpy as np

from .cc import label_runs

SKEW_GRID_DEG = 0.5  # skew search resolution
SKEW_MAX_DEG = 15.0  # +/- search range
_MIN_INK = 32  # below this many ink pixels, skew estimation abstains


# ---------------------------------------------------------------------------
# lossless shears + Paeth rotation
# ---------------------------------------------------------------------------


def _shifts(n: int, s: float) -> np.ndarray:
    """Integer shift per row/column index (round-half-even, symmetric in s)."""
    return np.rint(s * np.arange(n)).astype(np.int64)


def shear_x(img: np.ndarray, s: float) -> np.ndarray:
    """Shift row y right by rint(s*y) px (canvas grows to fit). Lossless."""
    h, w = img.shape
    sh = _shifts(h, s)
    mn = int(sh.min())
    out = np.zeros((h, w + int(sh.max()) - mn), dtype=img.dtype)
    for y in range(h):
        o = int(sh[y]) - mn
        out[y, o : o + w] = img[y]
    return out


def unshear_x(img: np.ndarray, s: float) -> np.ndarray:
    """Exact inverse of `shear_x` (input width is recomputed from s and h)."""
    h = img.shape[0]
    sh = _shifts(h, s)
    mn = int(sh.min())
    w = img.shape[1] - (int(sh.max()) - mn)
    out = np.empty((h, w), dtype=img.dtype)
    for y in range(h):
        o = int(sh[y]) - mn
        out[y] = img[y, o : o + w]
    return out


def shear_y(img: np.ndarray, s: float) -> np.ndarray:
    return shear_x(img.T, s).T.copy()


def unshear_y(img: np.ndarray, s: float) -> np.ndarray:
    return unshear_x(img.T, s).T.copy()


def _paeth_coeffs(angle_deg: float) -> tuple[float, float]:
    a = np.deg2rad(angle_deg)
    return -np.tan(a / 2.0), np.sin(a)


def rotate_image_shear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate by three lossless shears (canvas expands; no resampling)."""
    if angle_deg == 0:
        return img
    sx, sy = _paeth_coeffs(angle_deg)
    return shear_x(shear_y(shear_x(img, sx), sy), sx)


def unrotate_image_shear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Exact inverse of `rotate_image_shear` at the same angle: applying it
    to a rotated page returns the original raster bit-for-bit."""
    if angle_deg == 0:
        return img
    sx, sy = _paeth_coeffs(angle_deg)
    return unshear_x(unshear_y(unshear_x(img, sx), sy), sx)


def rotate_points_shear(
    points: np.ndarray, angle_deg: float, img_shape: tuple[int, int]
) -> np.ndarray:
    """Exact forward map of pixel coordinates (N, 2) as (x, y) through
    `rotate_image_shear(img, angle_deg)` for an image of ``img_shape``.
    Tracks the same per-row/column integer shifts and canvas offsets, so a
    pixel at (x, y) lands exactly at the returned coordinate."""
    if angle_deg == 0:
        return points.copy()
    sx, sy = _paeth_coeffs(angle_deg)
    h, w = img_shape
    x = points[:, 0].astype(np.int64).copy()
    y = points[:, 1].astype(np.int64).copy()
    sh1 = _shifts(h, sx)
    x = x + np.rint(sx * y).astype(np.int64) - int(sh1.min())
    w1 = w + int(sh1.max() - sh1.min())
    sh2 = _shifts(w1, sy)
    y = y + np.rint(sy * x).astype(np.int64) - int(sh2.min())
    h2 = h + int(sh2.max() - sh2.min())
    sh3 = _shifts(h2, sx)
    x = x + np.rint(sx * y).astype(np.int64) - int(sh3.min())
    return np.stack([x, y], axis=1)


def rotate_image_bilinear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Interpolating (RESAMPLING) rotation with canvas expansion — the
    numpy analogue of the reference's cv2.warpAffine `rotate_image`
    (`doctr/utils/geometry.py:333-460`). Unlike the three-shear path this
    is lossy: it exists to FIXTURE real scanned-page conditions, where the
    rotate -> straighten round trip can only be approximately inverted and
    the downstream decode must tolerate resampled ink."""
    if angle_deg == 0:
        return img.copy()
    a = np.deg2rad(angle_deg)
    ca, sa = float(np.cos(a)), float(np.sin(a))
    h, w = img.shape
    out_w = int(np.ceil(abs(w * ca) + abs(h * sa)))
    out_h = int(np.ceil(abs(h * ca) + abs(w * sa)))
    yy, xx = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    # inverse map (output pixel -> source coordinate), rotating about centers;
    # screen coords (y down), same orientation convention as the shear path
    cx_o, cy_o = (out_w - 1) / 2.0, (out_h - 1) / 2.0
    cx_i, cy_i = (w - 1) / 2.0, (h - 1) / 2.0
    xs = ca * (xx - cx_o) + sa * (yy - cy_o) + cx_i
    ys = -sa * (xx - cx_o) + ca * (yy - cy_o) + cy_i
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    vals = np.zeros((out_h, out_w), dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            sx_, sy_ = x0 + dx, y0 + dy
            inside = (sx_ >= 0) & (sx_ < w) & (sy_ >= 0) & (sy_ < h)
            vals += wgt * np.where(inside, img[sy_.clip(0, h - 1), sx_.clip(0, w - 1)], 0)
    return np.rint(vals).astype(img.dtype)


def is_resampled(img: np.ndarray) -> bool:
    """True when the page shows interpolation artifacts (a substantial
    share of its nonzero pixels at intermediate gray levels). The engine's
    crisp rasters use a handful of exact intensities, so this separates
    scanner-style resampled input (straightened by the interpolating
    inverse) from synthetic ink (straightened losslessly by shears)."""
    nz = img[img > 0]
    if nz.size < _MIN_INK:
        return False
    levels, counts = np.unique(nz, return_counts=True)
    # mass outside the 4 most common levels = interpolation halo
    top = np.sort(counts)[-4:].sum()
    return float(1.0 - top / nz.size) > 0.10


def unrotate_image_resampled(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Interpolating inverse for resampled pages: bilinear counter-rotation
    plus padding trim (the cv2 route of the reference's rotate_image with
    expand, geometry.py:333-460)."""
    return crop_to_ink(rotate_image_bilinear(img, -angle_deg))


def crop_to_ink(img: np.ndarray, margin: int = 0) -> np.ndarray:
    """Remove blank padding around the ink bbox (the reference's
    `remove_image_padding`, `doctr/utils/geometry.py:463-477`)."""
    ys, xs = np.nonzero(img)
    if ys.size == 0:
        return img
    h, w = img.shape
    y0, y1 = max(int(ys.min()) - margin, 0), min(int(ys.max()) + 1 + margin, h)
    x0, x1 = max(int(xs.min()) - margin, 0), min(int(xs.max()) + 1 + margin, w)
    return np.ascontiguousarray(img[y0:y1, x0:x1])


# ---------------------------------------------------------------------------
# skew estimation
# ---------------------------------------------------------------------------


def _profile_variance(img: np.ndarray) -> float:
    """Max of the row- and column-profile ink variances: text aligned to
    EITHER axis scores sharp, so a page that is both fractionally skewed
    and 90/270-rotated (lines vertical) still peaks at its true skew."""
    ink = img > 0
    rows = ink.sum(axis=1).astype(np.float64)
    cols = ink.sum(axis=0).astype(np.float64)
    return float(max(rows.var(), cols.var()))


def _dilate_window(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """1-D boolean dilation with a length-k window along ``axis`` (windowed
    cumsum > 0 — no scipy). Window anchor matches a centered rect kernel."""
    if k <= 1:
        return mask
    cs = np.cumsum(mask.astype(np.int32), axis=axis)
    n = mask.shape[axis]
    idx = np.arange(n)
    hi = np.take(cs, np.clip(idx + (k - 1) // 2, 0, n - 1), axis=axis)
    lo_i = idx - k // 2 - 1
    shape = [-1 if a == axis else 1 for a in range(mask.ndim)]
    lo = np.where(
        (lo_i >= 0).reshape(shape),
        np.take(cs, np.clip(lo_i, 0, n - 1), axis=axis),
        0,
    )
    return (hi - lo) > 0


def estimate_orientation_contours(
    img: np.ndarray,
    n_ct: int = 70,
    ratio_threshold_for_lines: float = 3.0,
    lower_area: int = 100,
) -> float:
    """Contour-median skew estimate — the reference's `estimate_orientation`
    mechanism (`doctr/models/_utils.py:42-160`): dilate ink so words merge
    toward line blobs, take the ``n_ct`` most elongated components, fit each
    a min-area rotated rect, and median the major-axis angles ("text lines
    should be horizontal"). cv2 findContours/minAreaRect are re-expressed as
    run-labeled components (`kernels/cc.py`) + convex hull with rotating
    calipers (`min_area_rect`). Returns degrees in the engine's forward
    sign convention (`rotate_image_shear(page, theta)` estimates theta);
    blobs squarer than the ratio threshold are ignored, and an exact +/-90
    median (vertical lines read as horizontal) abstains to 0 like the
    reference.
    """
    mask = img > 0
    if int(mask.sum()) < _MIN_INK:
        return 0.0
    h, w = mask.shape
    mask = _dilate_window(_dilate_window(mask, max(1, w // 100), 1), max(1, h // 100), 0)
    rows, starts, ends, labels = label_runs(mask)
    if rows.shape[0] == 0:
        return 0.0
    _, inv = np.unique(labels, return_inverse=True)
    area = np.zeros(inv.max() + 1, dtype=np.int64)
    np.add.at(area, inv, ends - starts)
    cands: list[tuple[float, float]] = []  # (elongation, major-axis angle)
    for ci in np.nonzero(area > lower_area)[0]:
        m = inv == ci
        # per-row extremes are enough for the hull: for a fixed y only the
        # outermost x can be vertices, so multi-run rows collapse to 2 points
        r, s, e_m = rows[m], starts[m], ends[m] - 1
        rr, ridx = np.unique(r, return_inverse=True)
        lo = np.full(rr.shape[0], np.iinfo(np.int64).max)
        hi = np.full(rr.shape[0], np.iinfo(np.int64).min)
        np.minimum.at(lo, ridx, s)
        np.maximum.at(hi, ridx, e_m)
        pts = np.concatenate(
            [np.stack([lo, rr], axis=1), np.stack([hi, rr], axis=1)]
        ).astype(np.float64)
        rect = min_area_rect(pts)
        e1, e2 = rect[1] - rect[0], rect[2] - rect[1]
        l1, l2 = float(np.hypot(*e1)), float(np.hypot(*e2))
        major, lmaj, lmin = (e1, l1, l2) if l1 >= l2 else (e2, l2, l1)
        ang = float(np.degrees(np.arctan2(major[1], major[0])))
        while ang <= -90:
            ang += 180
        while ang > 90:
            ang -= 180
        cands.append((lmaj / max(lmin, 1e-9), ang))
    cands.sort(reverse=True)
    angles = sorted(a for r, a in cands[:n_ct] if r > ratio_threshold_for_lines)
    if not angles:
        return 0.0
    med = angles[(len(angles) - 1) // 2]  # median_low: a value from the data
    return 0.0 if abs(round(med)) == 90 else med


def estimate_orientation(
    img: np.ndarray,
    general_page_orientation: tuple[int, float] | None = None,
    min_confidence: float = 0.2,
) -> int:
    """Composed page-angle estimate, reference API parity
    (`doctr/models/_utils.py:42-160` tail): a classifier-provided right
    angle is trusted when confident (and the page analyzed as if
    pre-rotated to it), the contour-median mechanism supplies the residual
    skew, and the result wraps to (-180, 180]. A perpendicular residual
    under a confident base is treated as 0 like the reference (it is
    usually a vertical reading of horizontal lines)."""
    base_angle, conf = general_page_orientation or (0, 0.0)
    is_confident = base_angle is not None and conf >= min_confidence
    if not is_confident:
        base_angle = 0
    # undo the right-angle part first (straighten_page convention: +90
    # pages straighten with one clockwise quarter turn)
    work = np.rot90(img, -((base_angle % 360) // 90)) if is_confident and base_angle else img
    skew = int(round(estimate_orientation_contours(work)))
    if abs(skew) == 90 or (is_confident and skew % 90 == 0):
        skew = 0
    final = base_angle + skew
    while final > 180:
        final -= 360
    while final <= -180:
        final += 360
    return int(final)


def estimate_skew_angle(
    img: np.ndarray,
    max_deg: float = SKEW_MAX_DEG,
    grid_deg: float = SKEW_GRID_DEG,
    n_refine: int = 3,
) -> float:
    """Estimate the page skew on a `grid_deg` grid in [-max_deg, max_deg].

    Coarse pass: counter-rotate the ink coordinates analytically for every
    candidate and score the BETTER of the two axis-projection variances
    (vectorized, no raster work) — the x projection covers pages whose
    lines run vertically (90/270-composed skew). Refine pass: exactly
    unrotate the raster for the top candidates and re-score — the exact
    pass disambiguates the +/-1-bin blur the analytic projection picks up
    from the three-shear forward rounding.
    Returns 0.0 when the page is blank or already scores best upright.
    """
    ys, xs = np.nonzero(img)
    if ys.size < _MIN_INK:
        return 0.0
    ys = ys.astype(np.float64)
    xs = xs.astype(np.float64)
    cands = np.arange(-max_deg, max_deg + grid_deg / 2, grid_deg)
    y_scores = np.empty_like(cands)
    x_scores = np.empty_like(cands)
    for i, deg in enumerate(cands):
        a = np.deg2rad(deg)
        yr = np.rint(ys * np.cos(a) - xs * np.sin(a)).astype(np.int64)
        xr = np.rint(xs * np.cos(a) + ys * np.sin(a)).astype(np.int64)
        y_scores[i] = np.bincount(yr - yr.min()).var()
        x_scores[i] = np.bincount(xr - xr.min()).var()
    # shortlist per axis (the axes must not crowd each other out: a page
    # with horizontal lines has a sharp y peak, a 90/270-composed page a
    # sharp x peak), then let the exact re-score arbitrate
    top = np.unique(
        np.concatenate(
            [
                cands[np.argsort(y_scores)[-n_refine:]],
                cands[np.argsort(x_scores)[-n_refine:]],
            ]
        )
    )
    # corroborating mechanism: the contour-median estimate (reference's
    # estimate_orientation approach) joins the shortlist, snapped to the
    # grid; the exact re-score below arbitrates between both mechanisms
    ct = estimate_orientation_contours(img)
    ct_snap = float(np.clip(round(ct / grid_deg) * grid_deg, -max_deg, max_deg))
    if ct_snap not in top:
        top = np.append(top, ct_snap)
    if 0.0 not in top:
        top = np.append(top, 0.0)  # never skew an upright page on a whim
    best_deg, best_score = 0.0, -1.0
    for deg in top:
        cand = img if deg == 0.0 else unrotate_image_shear(img, deg)
        score = _profile_variance(crop_to_ink(cand))
        if score > best_score or (score == best_score and abs(deg) < abs(best_deg)):
            best_deg, best_score = float(deg), score
    return best_deg


# ---------------------------------------------------------------------------
# polygon kernels (reference parity)
# ---------------------------------------------------------------------------


def order_points(pts: np.ndarray) -> np.ndarray:
    """Order 4 points clockwise (image coords, y down) starting top-left
    (reference `doctr/utils/geometry.py` order_points convention). Sorting
    by angle around the centroid is tie-safe for diamonds, where the
    classic sum/diff corner picking degenerates."""
    c = pts.mean(axis=0)
    order = np.argsort(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]))
    ring = pts[order]
    s = ring.sum(axis=1)
    start = np.lexsort((ring[:, 1], s))[0]
    return np.roll(ring, -start, axis=0)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull points counter-clockwise."""
    pts = np.unique(pts, axis=0)
    if pts.shape[0] <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        # scalar 2-D cross product: np.cross carries ~40 us of axis
        # bookkeeping per call, which dominates at hull scale
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2:
                ax, ay = out[-1][0] - out[-2][0], out[-1][1] - out[-2][1]
                bx, by = p[0] - out[-2][0], p[1] - out[-2][1]
                if ax * by - ay * bx > 0:
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray) -> np.ndarray:
    """Minimum-area enclosing rotated rectangle via rotating calipers:
    the optimal rectangle has a side collinear with a hull edge. Returns
    the 4 corners (unordered).

    The angle is SELECTED on the hull (cheap) but the corners are
    RECOMPUTED from every input point: the float hull's collinearity pop
    can absorb a point clustered on a tiny edge with an offset its cross
    product cannot resolve, so hull-derived corners could miss it —
    min/max of all points in the chosen rotated frame guarantees
    enclosure by construction, and the corners are exactly orthogonal
    even for degenerate (collinear/duplicate/sliver) input."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    hull = _convex_hull(pts)
    if hull.shape[0] == 1:
        return np.repeat(hull, 4, axis=0)
    if hull.shape[0] > 2:
        # A hull whose area is rounding noise relative to its extent (e.g.
        # a subnormal-width sliver from near-collinear input) is really a
        # segment: skip the caliper sweep and use its diameter direction.
        x, y = hull[:, 0], hull[:, 1]
        area2 = abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
        extent = float(np.max(np.ptp(hull, axis=0)))
        if area2 <= 1e-12 * extent * extent:
            d = hull[:, None, :] - hull[None, :, :]
            i, j = np.unravel_index(
                int(np.argmax((d * d).sum(axis=-1))), (hull.shape[0], hull.shape[0])
            )
            hull = hull[[i, j]]
    if hull.shape[0] == 2:
        seg = hull[1] - hull[0]
        best_ang = float(np.mod(np.arctan2(seg[1], seg[0]), np.pi / 2))
    else:
        best_area, best_ang = np.inf, 0.0
        edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
        angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
        for ang in angles:
            c, s = np.cos(ang), np.sin(ang)
            rot = hull @ np.array([[c, -s], [s, c]])
            x0, y0 = rot.min(axis=0)
            x1, y1 = rot.max(axis=0)
            area = (x1 - x0) * (y1 - y0)
            if area < best_area:
                best_area, best_ang = area, float(ang)
    c, s = np.cos(best_ang), np.sin(best_ang)
    rot = pts @ np.array([[c, -s], [s, c]])
    x0, y0 = rot.min(axis=0)
    x1, y1 = rot.max(axis=0)
    corners = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    return corners @ np.array([[c, s], [-s, c]])


def resolve_enclosing_rbbox(rbboxes: list[np.ndarray]) -> np.ndarray:
    """Enclosing rotated bbox of (*, 4, 2) polygon arrays -> (4, 2), ordered
    clockwise from top-left (reference `geometry.py:150-168`; minAreaRect
    re-expressed as hull + rotating calipers)."""
    cloud = np.concatenate(rbboxes, axis=0).reshape(-1, 2)
    return order_points(min_area_rect(cloud))


def rotate_abs_points(points: np.ndarray, angle: float = 0.0) -> np.ndarray:
    """Counter-clockwise rotation of (N, 2) points about the origin
    (reference `geometry.py:171-186`)."""
    a = np.deg2rad(angle)
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], dtype=points.dtype)
    return np.matmul(points, rot.T)


def compute_expanded_shape(img_shape: tuple[int, int], angle: float) -> tuple[int, int]:
    """(H, W) of the expanded canvas after rotation (reference
    `geometry.py:189-211`)."""
    h, w = img_shape
    corners = np.array([[w / 2, h / 2], [-w / 2, h / 2]])
    rotated = np.abs(rotate_abs_points(corners, angle))
    return int(2 * rotated[:, 1].max()), int(2 * rotated[:, 0].max())


def rotate_abs_geoms(
    geoms: np.ndarray, angle: float, img_shape: tuple[int, int], expand: bool = True
) -> np.ndarray:
    """Rotate absolute (N, 4) straight boxes or (N, 4, 2) polygons about
    the image center, counter-clockwise (reference `geometry.py:214-248`)."""
    polys = (
        np.stack([geoms[:, [0, 1]], geoms[:, [2, 1]], geoms[:, [2, 3]], geoms[:, [0, 3]]], axis=1)
        if geoms.ndim == 2
        else geoms
    ).astype(np.float64)
    polys[..., 0] -= img_shape[1] / 2
    polys[..., 1] = img_shape[0] / 2 - polys[..., 1]
    rotated = rotate_abs_points(polys.reshape(-1, 2), angle).reshape(-1, 4, 2)
    target = compute_expanded_shape(img_shape, angle) if expand else img_shape
    rotated[..., 0] = (rotated[..., 0] + target[1] / 2).clip(0, target[1])
    rotated[..., 1] = (target[0] / 2 - rotated[..., 1]).clip(0, target[0])
    return rotated


def remap_boxes(
    loc_preds: np.ndarray, orig_shape: tuple[int, int], dest_shape: tuple[int, int]
) -> np.ndarray:
    """Re-express relative (N, 4, 2) polygons after a centered pad/crop of
    the page (reference `geometry.py:251-276`)."""
    oh, ow = orig_shape
    dh, dw = dest_shape
    out = loc_preds.copy()
    out[:, :, 0] = (loc_preds[:, :, 0] * ow + (dw - ow) / 2) / dw
    out[:, :, 1] = (loc_preds[:, :, 1] * oh + (dh - oh) / 2) / dh
    return out


def extract_rcrops(img: np.ndarray, polys: np.ndarray) -> list[np.ndarray]:
    """Warp rotated (N, 4, 2) relative polygons to axis-aligned crops via an
    inverse-mapped nearest-neighbor affine sample (reference
    `geometry.py:533-648`, general-orientation path: affine from the first
    three corners)."""
    if polys.shape[0] == 0:
        return []
    if polys.shape[1:] != (4, 2):
        raise ValueError("polys must be (N, 4, 2)")
    h, w = img.shape[:2]
    boxes = polys.astype(np.float64).copy()
    boxes[:, :, 0] *= w
    boxes[:, :, 1] *= h
    crops = []
    for box in boxes:
        p0, p1, p2 = box[0], box[1], box[2]
        d1 = int(round(np.linalg.norm(p1 - p0)))
        d2 = int(round(np.linalg.norm(p2 - p1)))
        if d1 < 1 or d2 < 1:
            crops.append(np.zeros((0, 0), dtype=img.dtype))
            continue
        ux = (p1 - p0) / d1  # unit step along the top edge
        uy = (p2 - p1) / d2  # unit step down the right edge
        jj, ii = np.meshgrid(np.arange(d1), np.arange(d2))
        src_x = np.rint(p0[0] + jj * ux[0] + ii * uy[0]).astype(np.int64).clip(0, w - 1)
        src_y = np.rint(p0[1] + jj * ux[1] + ii * uy[1]).astype(np.int64).clip(0, h - 1)
        crops.append(img[src_y, src_x])
    return crops
