"""Artefact detection stand-in (reference `ArtefactDetector`,
`/root/reference/doctr/contrib/artefacts.py:17-129`): a side predictor that
finds non-text artefacts (bar codes, QR codes, logos, photos) on a page and
returns `{label, confidence, box}` dicts per page.

The reference runs a YOLOv8 ONNX model; this container has no inference
runtime, so the "forward" is a deterministic ink-statistics classifier over
connected components — each artefact kind has an unambiguous raster
signature (solid fill, hollow ring, vertical stripes, checkerboard) drawn
by the fixture generator, so the detector is exercised end-to-end against
generation-time ground truth, and swapping in a real model is a
one-function change (`_classify`).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..config import GLYPH_H, INK
from .cc import component_boxes

ARTEFACT_LABELS = ("bar_code", "qr_code", "logo", "photo")
_STRIPE = 3  # bar-code stripe width / QR cell size
_RING = 3  # logo border thickness
_MIN_SIDE = 2 * GLYPH_H  # anything smaller is plausibly text, skip it


def draw_artefact(canvas: np.ndarray, kind: str, x0: int, y0: int, w: int, h: int) -> tuple[int, int, int, int]:
    """Render one artefact; returns its (xmin, ymin, xmax, ymax) box."""
    region = canvas[y0 : y0 + h, x0 : x0 + w]
    if kind == "photo":
        region[:] = INK
    elif kind == "logo":
        region[:_RING, :] = INK
        region[-_RING:, :] = INK
        region[:, :_RING] = INK
        region[:, -_RING:] = INK
    elif kind == "bar_code":
        cols = (np.arange(w) // _STRIPE) % 2 == 0
        region[:, cols] = INK
    elif kind == "qr_code":
        yy, xx = np.meshgrid(np.arange(h) // _STRIPE, np.arange(w) // _STRIPE, indexing="ij")
        region[(yy + xx) % 2 == 0] = INK
    else:
        raise ValueError(f"unknown artefact kind {kind!r}")
    return (x0, y0, x0 + w, y0 + h)


def _match_fraction(binary: np.ndarray, ideal: np.ndarray) -> float:
    return float((binary == ideal).mean())


def _classify(binary: np.ndarray) -> tuple[str | None, float]:
    """Component binary mask -> (label, confidence) via pattern templates."""
    h, w = binary.shape
    ink = float(binary.mean())
    # photo: solid fill
    if ink > 0.95:
        return "photo", ink
    # logo: full ring, hollow interior
    if h > 2 * _RING and w > 2 * _RING:
        interior = binary[_RING:-_RING, _RING:-_RING]
        ring_mask = np.ones_like(binary)
        ring_mask[_RING:-_RING, _RING:-_RING] = 0
        ring_ink = float(binary[ring_mask.astype(bool)].mean())
        if ring_ink > 0.9 and float(interior.mean()) < 0.05:
            return "logo", ring_ink
    # bar_code: vertical stripes (all rows identical, columns alternate)
    stripes = ((np.arange(w) // _STRIPE) % 2 == 0)[None, :].repeat(h, axis=0)
    score = _match_fraction(binary, stripes)
    if score > 0.9:
        return "bar_code", score
    # qr_code: checkerboard blocks
    yy, xx = np.meshgrid(np.arange(h) // _STRIPE, np.arange(w) // _STRIPE, indexing="ij")
    checker = (yy + xx) % 2 == 0
    score = _match_fraction(binary, checker)
    if score > 0.9:
        return "qr_code", score
    return None, 0.0


def _dilate(binary: np.ndarray, r: int) -> np.ndarray:
    """Binary dilation with a (2r+1)-square structuring element, via rolled
    maxima (the reference dilates with cv2 to merge fragmented patterns
    before contour extraction, models/_utils.py:84-90)."""
    out = binary.copy()
    for axis in (0, 1):
        acc = out.copy()
        for d in range(1, r + 1):
            acc[tuple(slice(d, None) if a == axis else slice(None) for a in (0, 1))] |= out[
                tuple(slice(None, -d) if a == axis else slice(None) for a in (0, 1))
            ]
            acc[tuple(slice(None, -d) if a == axis else slice(None) for a in (0, 1))] |= out[
                tuple(slice(d, None) if a == axis else slice(None) for a in (0, 1))
            ]
        out = acc
    return out


def detect_artefacts(page: np.ndarray, conf_threshold: float = 0.5) -> list[dict[str, Any]]:
    """One page -> [{label, confidence, box}] with absolute pixel boxes
    (the reference postprocess contract, artefacts.py:69-105). The binary
    map is dilated first so striped/checkered patterns become one region
    (a bar code's stripes are separate connected components); boxes are
    then trimmed back to the original ink and classified on raw pixels.
    Text-sized components are skipped; connected components replace NMS
    (merged regions cannot overlap by construction)."""
    binary = page > 0
    merged = (_dilate(binary, _STRIPE - 1) * np.uint8(255)).astype(np.uint8)
    boxes, _ = component_boxes(merged, 1.0)
    out: list[dict[str, Any]] = []
    for x0, y0, x1, y1 in boxes:
        region = binary[y0:y1, x0:x1]
        ys, xs = np.nonzero(region)
        if ys.size == 0:
            continue
        ty0, ty1 = y0 + int(ys.min()), y0 + int(ys.max()) + 1
        tx0, tx1 = x0 + int(xs.min()), x0 + int(xs.max()) + 1
        if (tx1 - tx0) < _MIN_SIDE or (ty1 - ty0) < _MIN_SIDE:
            continue
        label, conf = _classify(binary[ty0:ty1, tx0:tx1])
        if label is not None and conf >= conf_threshold:
            out.append(
                {
                    "label": label,
                    "confidence": round(float(conf), 6),
                    "box": [int(tx0), int(ty0), int(tx1), int(ty1)],
                }
            )
    return out


class ArtefactDetector:
    """API-parity facade over `detect_artefacts` (reference constructor
    surface minus the ONNX/model-download options, which have no meaning
    without an inference runtime)."""

    def __init__(
        self,
        labels: list[str] | None = None,
        conf_threshold: float = 0.5,
        iou_threshold: float = 0.5,  # kept for parity; components never overlap
    ) -> None:
        self.labels = list(labels or ARTEFACT_LABELS)
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self._results: list[list[dict[str, Any]]] = []

    def __call__(self, pages: list[np.ndarray]) -> list[list[dict[str, Any]]]:
        self._results = [
            [r for r in detect_artefacts(p, self.conf_threshold) if r["label"] in self.labels]
            for p in pages
        ]
        return self._results
