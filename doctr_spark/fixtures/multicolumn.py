"""Multi-column reading-order fixture.

Pages generalizing the reference's reading-order docstring oracle
(`/root/reference/doctr/models/reading_order/base.py:394-402` — a title
spanning two columns reads [title, left column, right column]): each page
carries a page header, a centered title bridging TWO text columns, five
two-column body rows, a bullet list inside the left column (one WRAPPED
two-line bullet — its gutter bar ties the lines into one detector region
— followed by a second, separate bullet), a solid photo float with a
caption hugging its bottom edge, a "[n]"-marked footnote, and a page
footer. The wrapped bullet vs second bullet drives the reference's
list-item grouping (`group_reading_items`): plain segment-merging would
fuse both bullets (labels equal, gaps tiny); region-aware grouping keeps
each bullet its own item.

The naive y-sorted builder interleaves the column rows (L1 R1 L2 R2 ...);
the ground truth staged here is the LAYOUT-AWARE reading order the
`keep_reading_order=True` pipeline must reproduce end to end —
topological column traversal (title, L1..L5, R1..R5), role ranking
(header first, footnote + footer last), caption splicing, and
label-driven paragraph segmentation — with every region label coming from
the in-pipeline layout predictor (`kernels.layout.detect_layout_regions`),
not from fixture metadata.

Geometry invariants (all asserted against the engine constants):
* title: x0 > 0.2w, width < 0.5w (detector title cue) AND >= 0.2
  x-overlap with both columns normalized by the shorter interval, so the
  topological sort ranks it before each column;
* column gap (32 px) exceeds the builder's max sub-line break distance
  (PARAGRAPH_BREAK * w ~= 18 px), so each visual row splits into a left
  and a right line;
* inter-row leading (8 px) stays under 0.8 x line height (12.8 px), so a
  column's rows merge into ONE paragraph segment, while every
  band-to-band gap (16+ px) exceeds it;
* caption sits 4 px (<= 6) under the photo -> detector labels it caption.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..config import GLYPH_H, LINE_LEADING, PAGE_W, RULING_INK, WORD_GAP
from ..kernels.artefacts import draw_artefact
from ..kernels.glyphs import draw_word, word_width
from .payloads import make_img_payload
from .transcripts import GT_SCHEMA, TRANSCRIPTS_SCHEMA

#: GT schema extended with the per-block role list (comma-joined, parallel
#: to the "\n\n"-separated blocks of ``gt_text``).
MC_GT_SCHEMA = GT_SCHEMA + ", gt_roles string"

_EPOCH = dt.datetime(2025, 2, 1)
_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"

MC_PAGE_H = 360
_ROW_PITCH = GLYPH_H + LINE_LEADING  # 24

_Y_HEADER = 8  # band ends 24 <= 0.12 * 360 -> page_header
_Y_TITLE = 40  # centered, past 0.2w, narrower than 0.5w -> title
_Y_COLS = 72  # five two-column rows pitched _ROW_PITCH apart
_N_ROWS = 5
# bullet list in the left column: a wrapped bullet (two lines 1 px apart
# so the gutter bar keeps them one ink band -> one list region) then a
# separate bullet region two blank rows below
_Y_LIST_A = (192, 209)
_Y_LIST_B = 227
_LIST_BAR_X = 20
_LIST_TEXT_X = 30
_Y_PHOTO = 248  # solid 40px-tall block -> picture (float, no text)
_PHOTO_H = 40
_Y_CAPTION = _Y_PHOTO + _PHOTO_H + 4  # 4 px <= 6 -> caption
_Y_FOOTNOTE = 312  # > 0.7h, < 0.88h, starts with "[n]" -> footnote
_Y_FOOTER = 344  # >= 0.88 * 360 -> page_footer

_COL_GAP = 32
_COL_W = (PAGE_W - 2 * 16 - _COL_GAP) // 2  # 224
_COL_X = (16, 16 + _COL_W + _COL_GAP)  # 16, 272
_TITLE_X = 200
_TITLE_WORD_LEN = 14  # two 14-char words -> 120 px wide, ends at 320


def _word(rng: np.random.Generator, lo: int = 2, hi: int = 8) -> str:
    n = int(rng.integers(lo, hi + 1))
    return "".join(_CHARS[i] for i in rng.integers(0, len(_CHARS), n))


def _draw_run(canvas: np.ndarray, x: int, y: int, words: list[str]) -> int:
    for w in words:
        draw_word(canvas, x, y, w)
        x += word_width(w) + WORD_GAP
    return x


def _pack_run(rng: np.random.Generator, x: int, limit: int) -> list[str]:
    """Random words packed left-to-right until the next one would overflow."""
    words: list[str] = []
    while True:
        w = _word(rng)
        if x + word_width(w) > limit:
            if len(words) >= 2:
                return words
            continue  # a run must hold at least two words
        words.append(w)
        x += word_width(w) + WORD_GAP


#: GT block roles that the ``include_furniture=False`` render drops
#: (mirrors `kernels.exporters._FURNITURE_ROLES` at layout-label level).
FURNITURE_BLOCK_ROLES = ("page_header", "footnote", "page_footer")


def gen_multicolumn_page(
    rng: np.random.Generator,
) -> tuple[np.ndarray, str, int, list[str]]:
    """One page; returns (canvas, reading-order ground truth, word count,
    per-block roles). The roles list parallels ``gt.split("\\n\\n")`` so GT
    consumers can filter blocks by role instead of by position (e.g. the
    bare-render oracle drops `FURNITURE_BLOCK_ROLES` wherever they sit)."""
    canvas = np.zeros((MC_PAGE_H, PAGE_W), dtype=np.uint8)

    header = [_word(rng) for _ in range(int(rng.integers(2, 4)))]
    _draw_run(canvas, 24, _Y_HEADER, header)

    title = [_word(rng, _TITLE_WORD_LEN, _TITLE_WORD_LEN) for _ in range(2)]
    assert _TITLE_X > 0.2 * PAGE_W
    t_w = sum(word_width(w) for w in title) + WORD_GAP * (len(title) - 1)
    assert t_w < 0.5 * PAGE_W
    # >=0.2 x-overlap with the right column (starts at _COL_X[1]), so the
    # title precedes BOTH columns in the reads-before DAG
    assert (_TITLE_X + t_w - _COL_X[1]) / t_w > 0.25
    _draw_run(canvas, _TITLE_X, _Y_TITLE, title)

    cols: tuple[list[list[str]], list[list[str]]] = ([], [])
    for r in range(_N_ROWS):
        y = _Y_COLS + r * _ROW_PITCH
        for ci in (0, 1):
            run = _pack_run(rng, _COL_X[ci], _COL_X[ci] + _COL_W)
            _draw_run(canvas, _COL_X[ci], y, run)
            cols[ci].append(run)

    # wrapped bullet: two lines, bar from the first line's top to just
    # past the second line's bottom; then the standalone second bullet
    bullets: list[list[str]] = []
    for ys, bar in (( _Y_LIST_A, (_Y_LIST_A[0], _Y_LIST_A[1] + GLYPH_H)), ((_Y_LIST_B,), (_Y_LIST_B, _Y_LIST_B + GLYPH_H))):
        canvas[bar[0] : bar[1], _LIST_BAR_X : _LIST_BAR_X + 2] = RULING_INK
        for y in ys:
            run = _pack_run(rng, _LIST_TEXT_X, _COL_X[0] + _COL_W)
            _draw_run(canvas, _LIST_TEXT_X, y, run)
            bullets.append(run)

    draw_artefact(canvas, "photo", 40, _Y_PHOTO, int(rng.integers(80, 160)), _PHOTO_H)
    caption = [_word(rng) for _ in range(int(rng.integers(2, 4)))]
    _draw_run(canvas, 40, _Y_CAPTION, caption)

    footnote = [f"[{int(rng.integers(1, 10))}]"] + [_word(rng) for _ in range(int(rng.integers(2, 4)))]
    _draw_run(canvas, 24, _Y_FOOTNOTE, footnote)

    footer = [_word(rng) for _ in range(int(rng.integers(2, 4)))]
    _draw_run(canvas, 24, _Y_FOOTER, footer)

    # reading order: the column walk follows the LEFT column down into
    # the bullets (they sit in its column region) before jumping to the
    # right column; the wrapped bullet is one item, the second its own
    blocks = [
        ("page_header", " ".join(header)),
        ("title", " ".join(title)),
        ("column", "\n".join(" ".join(run) for run in cols[0])),
        ("list_item", "\n".join(" ".join(run) for run in bullets[:2])),
        ("list_item", " ".join(bullets[2])),
        ("column", "\n".join(" ".join(run) for run in cols[1])),
        ("caption", " ".join(caption)),
        ("footnote", " ".join(footnote)),
        ("page_footer", " ".join(footer)),
    ]
    n_words = (
        len(header) + len(title) + len(caption) + len(footnote) + len(footer)
        + sum(len(run) for ci in (0, 1) for run in cols[ci])
        + sum(len(b) for b in bullets)
    )
    return canvas, "\n\n".join(t for _, t in blocks), n_words, [r for r, _ in blocks]


def gen_multicolumn_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 23])
    conv_id = f"mcol{conv_no:07d}"
    n_turns = int(rng.integers(1, 4))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        canvas, gt_text, n_words, roles = gen_multicolumn_page(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"multicolumn {make_img_payload(canvas)}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "gt_text": gt_text,
                "n_pages": 1,
                "n_words": n_words,
                "gt_roles": ",".join(roles),
            }
        )
    return rows, gts


def bare_gt_text(gt_text_col: str = "gt_text", gt_roles_col: str = "gt_roles"):
    """Spark expression: ``gt_text`` with the `FURNITURE_BLOCK_ROLES` blocks
    removed, driven by the parallel per-block role list — position-
    independent, so fixture-layout changes cannot silently shift the
    bare-render oracle."""
    from pyspark.sql import functions as F  # noqa: N812

    kept = F.filter(
        F.zip_with(
            F.split(gt_text_col, "\n\n"),
            F.split(gt_roles_col, ","),
            lambda b, r: F.struct(b.alias("b"), r.alias("r")),
        ),
        lambda s: ~s["r"].isin(*FURNITURE_BLOCK_ROLES),
    )
    return F.array_join(F.transform(kept, lambda s: s["b"]), "\n\n")


def generate_multicolumn_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
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
                    all_rows.extend(gen_multicolumn_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "gt_text", "n_pages", "n_words", "gt_roles"]),
        schema=MC_GT_SCHEMA,
    )
    return tdf, gdf
