"""Right-to-left (Hebrew + Arabic) transcript fixture.

Pages whose text lines are laid out RIGHT-TO-LEFT: the logical first word
of each line is drawn at the right margin and successive words extend
leftward — the visual mirror of the Latin fixtures. Lines mix scripts:
Hebrew rows, Arabic rows (bidi class AL, the reference's other
first-class RTL script, `datasets/vocabs.py:480-489`), and pure
digit/Latin runs drawn left-to-right (an RTL document quoting numbers or
code), exercising the reference's per-line auto direction: under
``text_direction="auto"`` each line takes its OWN base direction from its
text (`doctr/io/exporters.py:219-250`, `reading_order/base.py:83-120`),
so Hebrew/Arabic lines re-order right-to-left while embedded Latin lines
keep their natural order.

The ground truth is the LOGICAL word order per line, computed at
generation time; recognition runs with the ``rtl`` working vocab (both
consonant cores + both digit sets; reference per-language vocab
selection, `datasets/vocabs.py:228,468,480`).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..config import GLYPH_H, LINE_LEADING, MARGIN, PAGE_H, PAGE_W, WORD_GAP
from ..kernels.glyphs import draw_word, word_width
from ..kernels.vocab import ARABIC_LETTERS, DIGITS, HEBREW_CONSONANTS, VOCABS
from .payloads import make_img_payload
from .transcripts import GT_SCHEMA, TRANSCRIPTS_SCHEMA

_EPOCH = dt.datetime(2025, 3, 1)
_ROW_PITCH = GLYPH_H + LINE_LEADING
_VOCAB = VOCABS["rtl"]
# tatweel is a justification filler, not a letter — keep it out of words
_ARABIC_CORE = ARABIC_LETTERS.replace("ـ", "")


def _hebrew_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 9))
    return "".join(HEBREW_CONSONANTS[i] for i in rng.integers(0, len(HEBREW_CONSONANTS), n))


def _arabic_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 9))
    return "".join(_ARABIC_CORE[i] for i in rng.integers(0, len(_ARABIC_CORE), n))


def _digit_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 7))
    return "".join(DIGITS[i] for i in rng.integers(0, len(DIGITS), n))


def gen_rtl_page(rng: np.random.Generator) -> tuple[np.ndarray, str, int]:
    """One page; returns (canvas, logical-order ground truth, word count)."""
    canvas = np.zeros((PAGE_H, PAGE_W), dtype=np.uint8)
    n_rows = int(rng.integers(4, 8))
    lines: list[list[str]] = []
    y = MARGIN
    for _ in range(n_rows):
        latin_line = rng.random() < 0.25
        # pack first, draw only after the row passes the >=2-word check:
        # drawing inside the packing loop would leave stray ink excluded
        # from the GT when a degenerate row is retried at the same y
        placements: list[tuple[int, str]] = []
        if latin_line:
            # embedded LTR run: natural left-to-right placement
            x = MARGIN
            while True:
                w = _digit_word(rng)
                if x + word_width(w) > PAGE_W - MARGIN or len(placements) >= 6:
                    break
                placements.append((x, w))
                x += word_width(w) + WORD_GAP
        else:
            # RTL: logical first word at the right margin, extending left;
            # Hebrew and Arabic rows interleave (both strong-RTL scripts)
            gen = _arabic_word if rng.random() < 0.4 else _hebrew_word
            x = PAGE_W - MARGIN
            while True:
                w = gen(rng)
                if x - word_width(w) < MARGIN or len(placements) >= 8:
                    break
                x -= word_width(w)
                placements.append((x, w))
                x -= WORD_GAP
        if len(placements) < 2:  # degenerate row: retry deterministic-ish
            continue
        for x, w in placements:
            draw_word(canvas, x, y, w, _VOCAB)
        words = [w for _, w in placements]
        lines.append(words)
        y += _ROW_PITCH
        if y + GLYPH_H > PAGE_H - MARGIN:
            break
    gt = "\n".join(" ".join(line) for line in lines)
    return canvas, gt, sum(len(line) for line in lines)


def gen_rtl_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 29])
    conv_id = f"rtl{conv_no:07d}"
    n_turns = int(rng.integers(1, 4))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        canvas, gt_text, n_words = gen_rtl_page(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"rtl {make_img_payload(canvas)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {"conv_id": conv_id, "turn_idx": t, "gt_text": gt_text, "n_pages": 1, "n_words": n_words}
        )
    return rows, gts


def generate_rtl_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed generation (same contract as
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
                    all_rows.extend(gen_rtl_conversation(int(conv_no), seed)[idx])
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
