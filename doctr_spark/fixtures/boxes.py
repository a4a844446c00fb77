"""Localization-metrics fixture: pages with known word boxes and a
deterministic subset of FAINT words (ink below the DB binarization
threshold, detectable by FAST but not DB — same contrast trick as the
det_arch divergence test). The generator therefore knows, analytically,
what a DB-preset detector must produce per page: every full-ink word
matched at IoU 1.0, every faint word missed — recall = detectable/total,
precision = 1, meanIoU = 1 — which makes the Hungarian-matching metrics
suite (`operators.metrics.localization_per_page`,
reference `doctr/utils/metrics.py:222-313`) checkable end to end against
a staged expectation rather than against its own output.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..config import PAGE_H, PAGE_W
from ..kernels.glyphs import draw_word
from .payloads import make_img_payload
from .transcripts import TRANSCRIPTS_SCHEMA, _rand_word

_EPOCH = dt.datetime(2024, 9, 1)
FAINT_INK = 50  # prob 0.196: above the FAST bin_thresh (0.1), below DB (0.3)

BOX_GT_SCHEMA = (
    "conv_id string, turn_idx int, gt_boxes array<array<double>>, "
    "n_gt int, n_detectable int"
)


def gen_boxed_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 17])
    conv_id = f"box{conv_no:07d}"
    n_turns = int(rng.integers(2, 5))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        canvas = np.zeros((PAGE_H, PAGE_W), dtype=np.uint8)
        n_words = int(rng.integers(4, 10))
        n_faint = (conv_no + t) % 3  # 0..2 deterministic misses per page
        boxes, y = [], 24
        for i in range(n_words):
            word = _rand_word(rng)[:10] or "x"
            x0, y0, x1, y1 = draw_word(canvas, 24, y, word)
            if i < n_faint:
                patch = canvas[y0:y1, x0:x1]
                patch[patch > 0] = FAINT_INK
            boxes.append(
                [x0 / PAGE_W, y0 / PAGE_H, x1 / PAGE_W, y1 / PAGE_H]
            )
            y += 24
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"boxes {make_img_payload(canvas)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "gt_boxes": boxes,
                "n_gt": n_words,
                "n_detectable": n_words - n_faint,
            }
        )
    return rows, gts


def generate_boxed_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed boxed-fixture generation (same contract as
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
                    all_rows.extend(gen_boxed_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "gt_boxes", "n_gt", "n_detectable"]),
        schema=BOX_GT_SCHEMA,
    )
    return tdf, gdf
