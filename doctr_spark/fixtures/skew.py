"""Skewed-page transcript fixture: every turn carries an img payload whose
page raster was rotated by a random fractional angle (Paeth three-shear, so
ground truth survives the pipeline's straighten pass bit-for-bit) — and,
for a third of the turns, ALSO rotated by a right angle before the shear,
so the fixture covers the composed skew∘rot90 case end to end.

Angles are drawn from the same 0.5-degree grid `estimate_skew_angle`
searches, in +/-[2, 14] degrees — real scanned-document skew territory
(the reference exercises this via its rotated/straighten test grid,
`tests/pytorch/test_models_zoo_pt.py:32-120`).

Composition order matters for exactness: the forward is
``shear(rot90(page, k), angle)`` and the pipeline inverts in exact reverse
order (unshear first — the two-axis profile score finds the fractional
angle even when lines run vertically — then the right-angle classifier),
so the round trip stays bit-for-bit.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..kernels.rgeometry import rotate_image_shear
from .layout import layout_paragraphs
from .payloads import make_img_payload
from .transcripts import GT_SCHEMA, TRANSCRIPTS_SCHEMA, _rand_paragraphs, _rand_word

_EPOCH = dt.datetime(2024, 3, 1)
SKEW_CHOICES = np.arange(2.0, 14.01, 0.5)


def gen_skewed_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 7])
    conv_id = f"skew{conv_no:07d}"
    n_turns = int(rng.integers(2, 6))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        paragraphs = _rand_paragraphs(rng, max_paras=3)
        page = layout_paragraphs(paragraphs)[0]
        angle = float(rng.choice(SKEW_CHOICES)) * (1 if rng.random() < 0.5 else -1)
        canvas = page.canvas
        if rng.random() < 1 / 3:  # composed case: right angle, then shear
            canvas = np.rot90(canvas, int(rng.integers(1, 4)))
        skewed = rotate_image_shear(canvas, angle)
        prose = " ".join(_rand_word(rng) for _ in range(int(rng.integers(2, 6))))
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"{prose} {make_img_payload(skewed)}",
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


def generate_skewed_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed skewed-fixture generation (same contract as
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
                    all_rows.extend(gen_skewed_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "gt_text", "n_pages", "n_words"]), schema=GT_SCHEMA
    )
    return tdf, gdf
