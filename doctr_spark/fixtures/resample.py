"""Resampled (scanner-style) skewed-page fixture.

Unlike `fixtures.skew` (lossless three-shear rotation, bit-exact round
trip), this fixture rotates pages the way a real scan is rotated: BILINEAR
interpolation (`rotate_image_bilinear`, the cv2.warpAffine analogue of the
reference's `rotate_image`, `doctr/utils/geometry.py:333-460`). The page is
rendered at ``SCAN_SCALE``x the glyph resolution first — the 300-dpi-style
oversampling every real capture has — so after the pipeline's interpolating
deskew and the preprocessor's pool-down resize, sub-pixel displacement is a
fraction of a glyph cell and recognition stays reliable WITHOUT being
bit-exact. Correctness is therefore asserted through a TOLERANCE oracle
(word-count within tolerance + high token recall), not hash equality of the
raster round trip.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..kernels.rgeometry import rotate_image_bilinear
from .layout import layout_paragraphs
from .payloads import make_img_payload
from .transcripts import TRANSCRIPTS_SCHEMA, _rand_word

_EPOCH = dt.datetime(2024, 7, 1)
SCAN_SCALE = 4  # scan resolution as a multiple of the glyph (model-input) scale
PAGE_H1, PAGE_W1 = 128, 256  # page size at 1x (scanned size = 4x this)
RESAMPLE_ANGLES = np.arange(2.0, 14.01, 0.5)

RESAMPLE_GT_SCHEMA = "conv_id string, turn_idx int, gt_text string, n_pages int, n_words int"


def gen_resampled_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 13])
    conv_id = f"scan{conv_no:07d}"
    n_turns = int(rng.integers(2, 5))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        paragraphs = [
            [_rand_word(rng)[:8] or "x" for _ in range(int(rng.integers(3, 8)))]
            for _ in range(int(rng.integers(1, 3)))
        ]
        page = layout_paragraphs(paragraphs, page_h=PAGE_H1, page_w=PAGE_W1)[0]
        scanned = np.kron(page.canvas, np.ones((SCAN_SCALE, SCAN_SCALE), dtype=np.uint8))
        angle = float(rng.choice(RESAMPLE_ANGLES)) * (1 if rng.random() < 0.5 else -1)
        rotated = rotate_image_bilinear(scanned, angle)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"scan {make_img_payload(rotated)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "gt_text": page.gt_text,
                "n_pages": 1,
                "n_words": len(page.words),
            }
        )
    return rows, gts


def generate_resampled_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed resampled-fixture generation (same contract as
    `transcripts.generate_transcripts`)."""
    parallelism = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_convs, 1, min(parallelism, max(1, n_convs))).withColumnRenamed(
        "id", "conv_no"
    )

    def _gen(idx: int, cols: list[str]):
        def fn(batches):
            for pdf in batches:
                all_rows = []
                for conv_no in pdf["conv_no"].tolist():
                    all_rows.extend(gen_resampled_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "gt_text", "n_pages", "n_words"]),
        schema=RESAMPLE_GT_SCHEMA,
    )
    return tdf, gdf
