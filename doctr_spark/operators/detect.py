"""Stage 2 — detection + crop explode: page rows -> word-crop rows.

Fuses the reference's detection forward/postprocess
(`doctr/models/detection/...`) with crop extraction
(`doctr/models/predictor/base.py:163-196`) in one `mapInPandas` stage so the
page bytes are read exactly once and never shuffled again. Output rows are
keyed ``(conv_id, turn_idx, page_idx, word_idx)`` — the keyed-join
replacement for the reference's positional flatten/re-split bookkeeping
(`predictor/base.py:217-233`).

Pages with zero detections emit one sentinel row (word_idx = -1, null crop)
so the builder stage still materializes the empty page without a second
scan of the decode output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.detection import detect_words, extract_crops
from ..kernels.imgcodec import decode_page, encode_page

CROPS_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, page_h int, page_w int, "
    "page_orient int, page_orient_conf double, "
    "word_idx int, xmin double, ymin double, xmax double, ymax double, "
    "score double, crop binary, aux string"
)
_COLS = [
    "conv_id", "turn_idx", "page_idx", "page_h", "page_w", "page_orient", "page_orient_conf",
    "word_idx", "xmin", "ymin", "xmax", "ymax", "score", "crop", "aux",
]  # fmt: skip

# word_idx sentinels: -1 = empty page (no words, no tables); -2 = per-page
# table-structure prediction carried in `aux` as JSON; -3 = per-page layout
# regions (label + relative box) carried in `aux` as JSON for the
# layout-aware reading-order builder


def make_page_processor(
    mask_region_labels: tuple[str, ...] | None,
    straighten_pages: bool = False,
    det_arch: str = "db_like",
    carry_layout: bool = False,
    det_input_size: tuple[int, int] | None = None,
    det_preserve_aspect_ratio: bool = True,
    det_symmetric_pad: bool = True,
):
    """Per-page detection kernel shared by the staged `detect_and_crop`
    stage and the fused single-stage pipeline (`operators.pipeline`):
    straighten -> layout regions -> masking -> detect -> table structure,
    with identical ordering and thresholds in both callers. Returns
    ``process_page(img) -> (img, orient, orient_conf, regions, tables,
    abs_boxes, rel_boxes, scores)`` where ``img`` is the (possibly
    straightened/masked) page the crops must be sliced from."""
    import numpy as np

    from ..kernels.detection import DET_PRESETS, mask_regions
    from ..kernels.preprocessor import letterbox, unletterbox_boxes
    from ..kernels.rgeometry import (
        estimate_skew_angle,
        is_resampled,
        unrotate_image_resampled,
        unrotate_image_shear,
    )

    bin_thresh, box_thresh = DET_PRESETS[det_arch]
    from ..kernels.layout import detect_layout_regions
    from ..kernels.orientation import estimate_page_orientation, straighten_page
    from ..kernels.tables import detect_table_structure

    def _detect(img: np.ndarray):
        """Detection with the optional PreProcessor letterbox: resize the
        page to the model input size (aspect preserved, symmetric pad),
        detect there, and map the relative boxes exactly back to the page
        (`preprocessor.unletterbox_boxes`) — crops are always taken from
        the ORIGINAL page pixels."""
        if det_input_size is None:
            return detect_words(img, bin_thresh=bin_thresh, box_thresh=box_thresh)
        lb, lb_meta = letterbox(
            img, det_input_size, det_preserve_aspect_ratio, det_symmetric_pad
        )
        _, rel_lb, scores = detect_words(lb, bin_thresh=bin_thresh, box_thresh=box_thresh)
        rel = unletterbox_boxes(rel_lb, lb_meta, det_input_size)
        h, w = img.shape[:2]
        abs_boxes = np.rint(rel * np.array([w, h, w, h], dtype=np.float64)).astype(np.int64)
        abs_boxes[:, 0] = np.clip(abs_boxes[:, 0], 0, w - 1)
        abs_boxes[:, 1] = np.clip(abs_boxes[:, 1], 0, h - 1)
        abs_boxes[:, 2] = np.clip(abs_boxes[:, 2], abs_boxes[:, 0] + 1, w)
        abs_boxes[:, 3] = np.clip(abs_boxes[:, 3], abs_boxes[:, 1] + 1, h)
        # recompute rel from the final abs pixels so the downstream builder
        # sees the same geometry contract as the direct-detection path
        rel = abs_boxes.astype(np.float64) / np.array([w, h, w, h], dtype=np.float64)
        return abs_boxes, rel, scores

    def process_page(img: np.ndarray):
        orient, orient_conf = 0, 1.0
        pre_detect = None
        if straighten_pages:
            # fractional skew first (projection profile is readable
            # at any right-angle orientation), then the 0/90/180/270
            # classifier on the deskewed page — mirrors the
            # reference straighten loop (predictor/pytorch.py:110-142)
            # with estimate_orientation (models/_utils.py:42-160).
            skew = estimate_skew_angle(img)
            if skew:
                # crisp synthetic ink inverts losslessly by shears;
                # scanner-resampled ink takes the interpolating
                # inverse (matching how it was rotated)
                unrot = (
                    unrotate_image_resampled if is_resampled(img) else unrotate_image_shear
                )
                img = unrot(img, skew)
            # the stage detects this page anyway: when the preset
            # matches the orientation scorer's default thresholds
            # (and no masking will alter the page), detect once and
            # share the pass with the k=0 candidate
            if (bin_thresh, box_thresh) == DET_PRESETS["db_like"] and not mask_region_labels:
                pre_detect = _detect(img)
                orient, orient_conf = estimate_page_orientation(
                    img, upright_boxes=pre_detect[0]
                )
            else:
                orient, orient_conf = estimate_page_orientation(img)
            if orient:
                img = straighten_page(img, orient)
                pre_detect = None
        regions = None
        if mask_region_labels or carry_layout:
            # one layout forward serves both consumers: region
            # masking (ignore_regions) and the reading-order builder
            regions = detect_layout_regions(img)
        if mask_region_labels:
            drop = np.asarray(
                [b for b, n in zip(regions["boxes"], regions["class_names"])
                 if n in mask_region_labels]
            ).reshape(-1, 4)  # fmt: skip
            img = mask_regions(img, drop)
        abs_boxes, rel_boxes, scores = (
            pre_detect if pre_detect is not None else _detect(img)
        )
        tables = detect_table_structure(img)
        return img, orient, orient_conf, regions, tables, abs_boxes, rel_boxes, scores

    return process_page


def _make_detector(
    mask_region_labels: tuple[str, ...] | None,
    straighten_pages: bool = False,
    det_arch: str = "db_like",
    carry_layout: bool = False,
    det_input_size: tuple[int, int] | None = None,
    det_preserve_aspect_ratio: bool = True,
    det_symmetric_pad: bool = True,
):
    import json

    process_page = make_page_processor(
        mask_region_labels, straighten_pages, det_arch, carry_layout,
        det_input_size, det_preserve_aspect_ratio, det_symmetric_pad,
    )

    def _detect_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, page_idx, page_h, page_w, blob in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["page_idx"], pdf["page_h"], pdf["page_w"], pdf["page"]
            ):
                img = decode_page(bytes(blob))
                img, orient, orient_conf, regions, tables, abs_boxes, rel_boxes, scores = (
                    process_page(img)
                )
                key = (
                    conv_id, int(turn_idx), int(page_idx),
                    int(img.shape[0]), int(img.shape[1]), orient, float(orient_conf),
                )  # fmt: skip
                if carry_layout:
                    rows.append(
                        key
                        + (-3, 0.0, 0.0, 0.0, 0.0, 0.0, None,
                           json.dumps({"boxes": regions["boxes"].tolist(),
                                       "class_names": regions["class_names"]}))
                    )  # fmt: skip
                if tables:
                    rows.append(key + (-2, 0.0, 0.0, 0.0, 0.0, 0.0, None, json.dumps(tables)))
                if abs_boxes.shape[0] == 0:
                    if not tables and not carry_layout:
                        rows.append(key + (-1, 0.0, 0.0, 0.0, 0.0, 0.0, None, None))
                    continue
                crops = extract_crops(img, abs_boxes)
                for w_idx, (rel, score, crop) in enumerate(zip(rel_boxes, scores, crops)):
                    rows.append(
                        key
                        + (w_idx, float(rel[0]), float(rel[1]), float(rel[2]), float(rel[3]),
                           float(score), encode_page(crop), None)
                    )  # fmt: skip
            yield pd.DataFrame(rows, columns=_COLS)

    return _detect_batches


def detect_and_crop(
    pages: DataFrame,
    mask_region_labels: tuple[str, ...] | None = None,
    straighten_pages: bool = False,
    det_arch: str = "db_like",
    carry_layout: bool = False,
    det_input_size: tuple[int, int] | None = None,
    det_preserve_aspect_ratio: bool = True,
    det_symmetric_pad: bool = True,
) -> DataFrame:
    """Detection + crop explode; ``mask_region_labels`` blanks matching
    layout regions before detection (the ignore_regions option);
    ``straighten_pages`` classifies + undoes right-angle page rotation
    before detection (reference straighten loop,
    `doctr/models/predictor/pytorch.py:110-142`); ``det_arch`` selects the
    architecture's binarization/objectness threshold preset
    (`kernels.detection.DET_PRESETS`); ``carry_layout`` runs the layout
    predictor and ships its (label, box) regions to the builder in a
    word_idx = -3 sentinel row — the Spark analogue of the reference
    feeding LayoutPredictor output into reading order
    (`doctr/models/predictor/base.py` + `reading_order/base.py:534-578`);
    ``det_input_size`` routes every page through the PreProcessor
    letterbox (aspect-preserving resize + symmetric pad,
    `kernels.preprocessor`) before detection, with the detected geometry
    mapped exactly back to page coordinates."""
    return pages.mapInPandas(
        _make_detector(
            mask_region_labels, straighten_pages, det_arch, carry_layout,
            det_input_size, det_preserve_aspect_ratio, det_symmetric_pad,
        ),
        schema=CROPS_SCHEMA,
    )
