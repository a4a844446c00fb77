"""Layout-region fixture: pages composed of DRAWN region bands — page
header, title (centered narrow first band), section header (underlined),
body text, list items (left gutter bar), a ruled table, captions hugging
their float, a photo block, a footnote opening with a "[n]" marker, page
footer — with generation-time (label, box) expectations, so the
LW-DETR-stand-in layout predictor
(`kernels.layout.detect_layout_regions`; reference DocLayNet class surface
`doctr/models/layout/lw_detr/pytorch.py:36-51`) is oracle-checked against
drawn ground truth, the same staging pattern as the artefact fixture.
Covers all 11 DocLayNet classes (formula = a drawn fraction bar).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..config import PAGE_W, RULING_INK
from ..kernels.artefacts import draw_artefact
from ..kernels.glyphs import draw_word, word_width
from .payloads import make_img_payload
from .transcripts import TRANSCRIPTS_SCHEMA, _rand_word

_EPOCH = dt.datetime(2024, 11, 1)

REGION_GT_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, label string, "
    "xmin int, ymin int, xmax int, ymax int"
)

# taller page so every class fits; fixed vertical slots, every pair of
# neighbors separated by >= 2 blank rows (band split criterion) except the
# caption slots, which HUG their float (gap <= 6 px, the caption cue)
REGION_PAGE_H = 360
_SLOT_HEADER_Y = 10  # ends at 26 <= 0.12 * 360
_SLOT_TITLE_Y = 44  # centered, narrow
_SLOT_SECTION_Y = 70
_SLOT_TEXT_Y = 96
_SLOT_LIST_Y = 120
_SLOT_FORMULA_Y = 140  # fraction bar: ink above AND below one rule
_SLOT_TABLE = (184, 216)
_SLOT_CAPTION_T_Y = 220  # 4 px under the table -> caption
_SLOT_PICTURE_Y = 244  # band must be >= 32 rows tall for the picture check
_SLOT_CAPTION_P_Y = 280  # 4 px under the photo -> caption
_SLOT_FOOTNOTE_Y = 304  # y1 320 > 0.7 * 360, starts with "[n]"
_SLOT_FOOTER_Y = 328  # starts at >= 0.88 * 360


def _ink_bbox(canvas: np.ndarray, y_lo: int, y_hi: int) -> tuple[int, int, int, int]:
    band = canvas[y_lo:y_hi]
    ys, xs = np.nonzero(band)
    return (int(xs.min()), y_lo + int(ys.min()), int(xs.max()) + 1, y_lo + int(ys.max()) + 1)


def _words(rng: np.random.Generator, n_lo: int = 2, n_hi: int = 5) -> list[str]:
    return [_rand_word(rng)[:8] or "x" for _ in range(int(rng.integers(n_lo, n_hi)))]


def _draw_line(canvas: np.ndarray, x: int, y: int, words: list[str]) -> int:
    for w in words:
        draw_word(canvas, x, y, w)
        x += word_width(w) + 8
    return x


def gen_region_page(rng: np.random.Generator) -> tuple[np.ndarray, list[tuple[str, tuple]]]:
    """One page; returns (canvas, [(label, bbox), ...] in top-down order)."""
    canvas = np.zeros((REGION_PAGE_H, PAGE_W), dtype=np.uint8)
    regions: list[tuple[str, tuple]] = []

    def add(label: str, y_lo: int, y_hi: int) -> None:
        regions.append((label, _ink_bbox(canvas, y_lo, y_hi)))

    _draw_line(canvas, 24, _SLOT_HEADER_Y, _words(rng, 2, 4))
    add("page_header", _SLOT_HEADER_Y, _SLOT_HEADER_Y + 16)

    if rng.random() < 0.7:
        # title: centered, narrow (starts past 0.2w, spans < 0.5w)
        _draw_line(canvas, 160, _SLOT_TITLE_Y, _words(rng, 1, 3))
        add("title", _SLOT_TITLE_Y, _SLOT_TITLE_Y + 16)

    # section header: text with an underline touching its baseline
    end_x = _draw_line(canvas, 24, _SLOT_SECTION_Y, _words(rng, 1, 3))
    canvas[_SLOT_SECTION_Y + 16 : _SLOT_SECTION_Y + 18, 24 : end_x - 8] = RULING_INK
    add("section_header", _SLOT_SECTION_Y, _SLOT_SECTION_Y + 18)

    if rng.random() < 0.8:
        _draw_line(canvas, 24, _SLOT_TEXT_Y, _words(rng, 3, 6))
        add("text", _SLOT_TEXT_Y, _SLOT_TEXT_Y + 16)

    if rng.random() < 0.8:
        # list item: left gutter bar + text
        canvas[_SLOT_LIST_Y : _SLOT_LIST_Y + 16, 20:22] = RULING_INK
        _draw_line(canvas, 30, _SLOT_LIST_Y, _words(rng, 2, 5))
        add("list_item", _SLOT_LIST_Y, _SLOT_LIST_Y + 16)

    if rng.random() < 0.7:
        # formula: numerator word, fraction bar, denominator word — one
        # contiguous band (no 2-blank-row split) with ink above and below
        # the single rule
        fy = _SLOT_FORMULA_Y
        num = _rand_word(rng)[:5] or "a"
        den = _rand_word(rng)[:5] or "b"
        bar_w = max(word_width(num), word_width(den)) + 8
        draw_word(canvas, 204, fy, num)
        canvas[fy + 16 : fy + 19, 200 : 200 + bar_w] = RULING_INK
        draw_word(canvas, 204, fy + 19, den)
        add("formula", fy, fy + 35)

    if rng.random() < 0.7:
        ty0, ty1 = _SLOT_TABLE
        tx0, tx1 = 24, 24 + int(rng.integers(200, 400))
        canvas[ty0 : ty0 + 2, tx0:tx1] = RULING_INK  # top rule
        canvas[ty1 - 2 : ty1, tx0:tx1] = RULING_INK  # bottom rule
        canvas[ty0:ty1, tx0 : tx0 + 2] = RULING_INK  # borders
        canvas[ty0:ty1, tx1 - 2 : tx1] = RULING_INK
        draw_word(canvas, tx0 + 12, ty0 + 12, _rand_word(rng)[:6] or "c")
        add("table", ty0, ty1)
        if rng.random() < 0.7:  # caption hugging the table (4 px gap)
            _draw_line(canvas, 40, _SLOT_CAPTION_T_Y, _words(rng, 2, 4))
            add("caption", _SLOT_CAPTION_T_Y, _SLOT_CAPTION_T_Y + 16)

    if rng.random() < 0.7:
        draw_artefact(canvas, "photo", 40, _SLOT_PICTURE_Y, int(rng.integers(60, 120)), 32)
        add("picture", _SLOT_PICTURE_Y, _SLOT_PICTURE_Y + 32)
        if rng.random() < 0.7:  # caption hugging the photo (4 px gap)
            _draw_line(canvas, 40, _SLOT_CAPTION_P_Y, _words(rng, 2, 4))
            add("caption", _SLOT_CAPTION_P_Y, _SLOT_CAPTION_P_Y + 16)

    if rng.random() < 0.7:
        # footnote: bracketed digit marker, then the note text
        marker = f"[{int(rng.integers(1, 10))}]"
        end_x = _draw_line(canvas, 24, _SLOT_FOOTNOTE_Y, [marker])
        _draw_line(canvas, end_x, _SLOT_FOOTNOTE_Y, _words(rng, 2, 4))
        add("footnote", _SLOT_FOOTNOTE_Y, _SLOT_FOOTNOTE_Y + 16)

    _draw_line(canvas, 24, _SLOT_FOOTER_Y, _words(rng, 2, 4))
    add("page_footer", _SLOT_FOOTER_Y, _SLOT_FOOTER_Y + 16)
    return canvas, regions


def gen_region_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 19])
    conv_id = f"regn{conv_no:07d}"
    n_turns = int(rng.integers(1, 4))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        canvas, regions = gen_region_page(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"regions {make_img_payload(canvas)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        for label, (x0, y0, x1, y1) in regions:
            gts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "page_idx": 0,
                    "label": label,
                    "xmin": x0,
                    "ymin": y0,
                    "xmax": x1,
                    "ymax": y1,
                }
            )
    return rows, gts


def generate_region_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed region-fixture generation (same contract as
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
                    all_rows.extend(gen_region_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "page_idx", "label", "xmin", "ymin", "xmax", "ymax"]),
        schema=REGION_GT_SCHEMA,
    )
    return tdf, gdf
