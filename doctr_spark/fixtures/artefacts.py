"""Artefact-bearing page fixture: pages carrying bar codes, QR codes,
logos, photos (and a text line the detector must ignore), with
generation-time expected (label, box) rows as the oracle."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..config import PAGE_H, PAGE_W
from ..kernels.artefacts import ARTEFACT_LABELS, draw_artefact
from ..kernels.glyphs import draw_word
from .payloads import make_img_payload
from .transcripts import TRANSCRIPTS_SCHEMA, _rand_word

_EPOCH = dt.datetime(2024, 5, 1)
ARTEFACT_GT_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, label string, "
    "xmin int, ymin int, xmax int, ymax int"
)

_SLOTS = ((20, 30), (150, 30), (290, 30), (400, 30), (20, 130), (150, 130))


def _ink_bbox(canvas: np.ndarray, x0: int, y0: int, x1: int, y1: int) -> tuple[int, int, int, int]:
    region = canvas[y0:y1, x0:x1]
    ys, xs = np.nonzero(region)
    return (x0 + int(xs.min()), y0 + int(ys.min()), x0 + int(xs.max()) + 1, y0 + int(ys.max()) + 1)


def gen_artefact_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 11])
    conv_id = f"artf{conv_no:07d}"
    n_turns = int(rng.integers(1, 4))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        canvas = np.zeros((PAGE_H, PAGE_W), np.uint8)
        n_art = int(rng.integers(1, 5))
        slots = rng.permutation(len(_SLOTS))[:n_art]
        for s in slots:
            x0, y0 = _SLOTS[int(s)]
            kind = ARTEFACT_LABELS[int(rng.integers(0, len(ARTEFACT_LABELS)))]
            w = int(rng.integers(40, 80))
            h = int(rng.integers(36, 70))
            bx0, by0, bx1, by1 = draw_artefact(canvas, kind, x0, y0, w, h)
            tx0, ty0, tx1, ty1 = _ink_bbox(canvas, bx0, by0, bx1, by1)
            gts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "page_idx": 0,
                    "label": kind,
                    "xmin": tx0,
                    "ymin": ty0,
                    "xmax": tx1,
                    "ymax": ty1,
                }
            )
        # a text line the detector must NOT flag
        draw_word(canvas, 30, 220, _rand_word(rng)[:8] or "word")
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"attachment {make_img_payload(canvas)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
    return rows, gts


def generate_artefact_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    parallelism = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_convs, 1, min(parallelism, max(1, n_convs))).withColumnRenamed(
        "id", "conv_no"
    )

    def _gen(idx: int, cols: list[str]):
        def fn(batches):
            for pdf in batches:
                all_rows = []
                for conv_no in pdf["conv_no"].tolist():
                    all_rows.extend(gen_artefact_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "page_idx", "label", "xmin", "ymin", "xmax", "ymax"]),
        schema=ARTEFACT_GT_SCHEMA,
    )
    return tdf, gdf
