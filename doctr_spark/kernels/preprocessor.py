"""PreProcessor geometry: aspect-preserving letterbox resize + batching.

The reference's ``PreProcessor`` (`doctr/models/preprocessor/pytorch.py`)
resizes every page to the model's fixed input size with
``Resize(preserve_aspect_ratio, symmetric_pad)``
(`doctr/transforms/modules/pytorch.py:31-205`), batches, and normalizes;
after detection the predictor undoes the padding on the relative
localizations (`doctr/models/detection/_utils/base.py:_remove_padding`).
This module re-implements that geometry from scratch in numpy:

* `resize_bilinear` — separable bilinear sampling, align_corners=False
  convention (``src = (dst + 0.5) * in/out - 0.5``); exact identity at
  equal sizes, so a pad-only letterbox stays bit-exact.
* `letterbox` — scale-to-fit + zero-pad with the reference's ceil-leading
  symmetric split (`pytorch.py:163-166``half_pad = ceil(pad/2)``).
* `resize_target` — the FORWARD map for relative (N, 4) boxes or
  (N, 4, 2) polygons onto the letterboxed frame (`Resize._resize_target`,
  same offset/scale/clip sequence).
* `unletterbox_boxes` — the exact inverse given the letterbox metadata
  (what the engine uses: no square-target assumption).
* `remove_padding_boxes` — the reference's published square-target
  inverse (`_remove_padding`) for parity testing.
* `batch_inputs` / `normalize_batch` — fixed-size rebatch + per-channel
  (x/255 - mean)/std, the PreProcessor's other two jobs.

100 TB design note: all of this runs inside the detect stage's
Arrow-batched map over page rows — per-page numpy, no shuffle, no new
stage.
"""

from __future__ import annotations

import math

import numpy as np


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resample (align_corners=False). Exact identity
    when the size is unchanged."""
    in_h, in_w = img.shape[:2]
    if (in_h, in_w) == (out_h, out_w):
        return img.copy()
    ys = np.clip((np.arange(out_h) + 0.5) * in_h / out_h - 0.5, 0, in_h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * in_w / out_w - 0.5, 0, in_w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.rint(out), 0, np.iinfo(img.dtype).max).astype(img.dtype)
    return out.astype(img.dtype)


def letterbox(
    img: np.ndarray,
    size: tuple[int, int],
    preserve_aspect_ratio: bool = True,
    symmetric_pad: bool = True,
) -> tuple[np.ndarray, dict]:
    """Resize ``img`` to ``size`` = (H, W); with aspect preservation the
    content is scaled to fit and zero-padded (ink is bright on black
    pages, so zero IS the background). Returns (image, meta) where meta
    carries the content shape and pad offset for exact box remapping."""
    H, W = int(size[0]), int(size[1])
    h, w = img.shape[:2]
    if not preserve_aspect_ratio or H * w == W * h:
        return resize_bilinear(img, H, W), {"content_hw": (H, W), "offset_xy": (0, 0)}
    if h / w > H / W:
        tmp = (H, max(int(H / (h / w)), 1))
    else:
        tmp = (max(int(W * (h / w)), 1), W)
    scaled = resize_bilinear(img, *tmp)
    pad_r, pad_b = W - tmp[1], H - tmp[0]
    left = math.ceil(pad_r / 2) if symmetric_pad else 0
    top = math.ceil(pad_b / 2) if symmetric_pad else 0
    out = np.zeros((H, W) + img.shape[2:], dtype=img.dtype)
    out[top : top + tmp[0], left : left + tmp[1]] = scaled
    return out, {"content_hw": tmp, "offset_xy": (left, top)}


def resize_target(
    target: np.ndarray,
    raw_shape: tuple[int, int],
    final_shape: tuple[int, int],
    symmetric_pad: bool = False,
    offset: tuple[float, float] = (0.0, 0.0),
) -> np.ndarray:
    """Forward map of relative geometry onto the letterboxed frame
    (reference ``Resize._resize_target``): (N, 4) xyxy or (N, 4, 2)
    polygons; ``raw_shape``/``final_shape`` are (H, W) of the scaled
    content and the padded output, ``offset`` the relative pad offset."""
    target = np.asarray(target, dtype=np.float64).copy()
    sx = raw_shape[1] / final_shape[1]
    sy = raw_shape[0] / final_shape[0]
    if target.ndim == 2 and target.shape[1:] == (4,):
        if symmetric_pad:
            target[:, [0, 2]] = offset[0] + target[:, [0, 2]] * sx
            target[:, [1, 3]] = offset[1] + target[:, [1, 3]] * sy
        else:
            target[:, [0, 2]] *= sx
            target[:, [1, 3]] *= sy
    elif target.ndim == 3 and target.shape[1:] == (4, 2):
        if symmetric_pad:
            target[..., 0] = offset[0] + target[..., 0] * sx
            target[..., 1] = offset[1] + target[..., 1] * sy
        else:
            target[..., 0] *= sx
            target[..., 1] *= sy
    else:
        raise AssertionError("Boxes should be in the format (n_boxes, 4, 2) or (n_boxes, 4)")
    return np.clip(target, 0, 1)


def unletterbox_boxes(
    rel_boxes: np.ndarray, meta: dict, out_shape: tuple[int, int]
) -> np.ndarray:
    """EXACT inverse of the letterbox for relative (N, 4) boxes detected on
    the padded frame: subtract the pad offset and rescale by the content
    extent — no square-target assumption (the engine path)."""
    rel_boxes = np.asarray(rel_boxes, dtype=np.float64).copy()
    H, W = out_shape
    ch, cw = meta["content_hw"]
    left, top = meta["offset_xy"]
    rel_boxes[:, [0, 2]] = (rel_boxes[:, [0, 2]] * W - left) / cw
    rel_boxes[:, [1, 3]] = (rel_boxes[:, [1, 3]] * H - top) / ch
    return np.clip(rel_boxes, 0, 1)


def remove_padding_boxes(
    rel_boxes: np.ndarray,
    page_shape: tuple[int, int],
    symmetric_pad: bool = True,
) -> np.ndarray:
    """The reference's square-target unpad (`_remove_padding`,
    `doctr/models/detection/_utils/base.py:32-76`, straight-page case):
    assumes the detector ran on a SQUARE letterbox of a (h, w) page."""
    rel_boxes = np.asarray(rel_boxes, dtype=np.float64).copy()
    h, w = page_shape
    if h > w:
        if symmetric_pad:
            rel_boxes[:, [0, 2]] = (rel_boxes[:, [0, 2]] - 0.5) * h / w + 0.5
        else:
            rel_boxes[:, [0, 2]] *= h / w
    elif w > h:
        if symmetric_pad:
            rel_boxes[:, [1, 3]] = (rel_boxes[:, [1, 3]] - 0.5) * w / h + 0.5
        else:
            rel_boxes[:, [1, 3]] *= w / h
    return np.clip(rel_boxes, 0, 1)


def batch_inputs(samples: list, batch_size: int) -> list:
    """Gather samples into fixed-size batches (`PreProcessor.batch_inputs`,
    `preprocessor/pytorch.py:47-90`)."""
    n_batches = math.ceil(len(samples) / batch_size) if samples else 0
    return [
        np.stack(samples[i * batch_size : min((i + 1) * batch_size, len(samples))], axis=0)
        for i in range(n_batches)
    ]


def normalize_batch(
    batch: np.ndarray,
    mean: tuple[float, ...] = (0.5, 0.5, 0.5),
    std: tuple[float, ...] = (1.0, 1.0, 1.0),
) -> np.ndarray:
    """(x / 255 - mean) / std per channel (`PreProcessor.__init__`'s fused
    division + Normalize)."""
    x = batch.astype(np.float64) / 255.0
    mean_a = np.asarray(mean, dtype=np.float64)
    std_a = np.asarray(std, dtype=np.float64)
    if x.ndim >= 3 and x.shape[-1] == mean_a.shape[0]:
        return (x - mean_a) / std_a
    return (x - float(mean_a.mean())) / float(std_a.mean())
