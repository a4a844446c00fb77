"""Crop orientation classification + rectification.

Reference: `OrientationPredictor` classifies word crops among
{0, 90, 180, 270} degrees and `_rectify_crops` rot90s them upright
(`doctr/models/classification/predictor/pytorch.py:17-70`,
`doctr/models/predictor/base.py:198-215`). The deterministic stand-in
scores each of the four rotations by the fraction of glyph cells whose
marker bar is intact — the barcode font makes a wrong orientation
unreadable, so the classifier is a 4-way argmax over real evidence, with
confidence = the winning validity fraction (ties prefer the smaller
rotation, so upright crops always report 0).
"""

from __future__ import annotations

import numpy as np

from ..config import GLYPH_H, GLYPH_W

ORIENTATIONS = (0, 90, 180, 270)


def _validity(crop: np.ndarray) -> float:
    """Fraction of complete glyph cells readable in this orientation."""
    h, w = crop.shape
    if h != GLYPH_H:
        return 0.0
    n = w // GLYPH_W
    if n == 0:
        return 0.0
    cells = crop[:, : n * GLYPH_W].reshape(h, n, GLYPH_W)
    valid = (cells[:, :, 0] > 0).all(axis=0)
    return float(valid.sum()) / n


def estimate_crop_orientation(crop: np.ndarray) -> tuple[int, float]:
    """Return (angle, confidence); angle is how far the crop is rotated
    from upright (counter-clockwise), i.e. rot90(crop, angle//90 * -1 ...)
    restores it — use `rectify_crop` to apply."""
    best_angle, best_score = 0, -1.0
    for k, angle in enumerate(ORIENTATIONS):
        score = _validity(np.rot90(crop, -k) if k else crop)
        if score > best_score:
            best_angle, best_score = angle, score
        if score == 1.0:  # fully readable: no other orientation can beat it
            break
    return best_angle, max(best_score, 0.0)


def rectify_crop(crop: np.ndarray, angle: int) -> np.ndarray:
    """Undo a detected rotation (reference `_rectify_crops` rot90 path)."""
    k = ORIENTATIONS.index(angle)
    return np.rot90(crop, -k) if k else crop
