"""Deterministic multi-turn transcript generator (the F1 fixture).

Produces the exact `input_hint` schema
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus a ground-truth side table
``(conv_id, turn_idx, gt_text, n_pages, n_words)`` computed at generation
time from the layout engine — NOT by running the pipeline — so the
end-to-end equality check is a genuine oracle.

Generation is itself distributed (one task per conversation shard via
``mapInPandas``), seeded per conversation, so any scale factor renders the
same data regardless of partitioning. 1% of conversations are generated
~50x longer than the median to exercise skew handling.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..kernels.builder import render_document
from ..kernels.features import media_meta_row
from ..kernels.vocab import ASCII_LOWER, ASCII_UPPER, DIGITS
from .layout import layout_paragraphs
from .payloads import make_html_payload, make_img_payload, make_pdf_payload

_EPOCH = dt.datetime(2024, 1, 1)
_WORD_CHARS = ASCII_LOWER + DIGITS
_FANCY_CHARS = ASCII_LOWER + ASCII_UPPER + DIGITS + ".,:;!?"
_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "browser", "python", "calculator")
ROTATED_WORD_FRAC = 0.15  # img/pdf payloads: words drawn upside-down


def _rotate_some_words(pages, rng: np.random.Generator, frac: float = ROTATED_WORD_FRAC) -> None:
    """Rotate a fraction of word patches 180 deg in place (exercises the
    crop-orientation classifier + rectification path). Only applied to
    img/pdf payloads whose pixels are baked into the payload bytes — html
    payloads are re-rendered upright by the decoder."""
    for p in pages:
        for _, (x0, y0, x1, y1) in p.words:
            if rng.random() < frac:
                p.canvas[y0:y1, x0:x1] = np.rot90(p.canvas[y0:y1, x0:x1], 2)


def _rand_word(rng: np.random.Generator) -> str:
    r = rng.random()
    if r < 0.02:  # aspect ratio > 8 -> exercises split_crops/merge_strings
        n = int(rng.integers(33, 50))
    else:
        n = int(rng.integers(1, 13))
    chars = _FANCY_CHARS if rng.random() < 0.05 else _WORD_CHARS
    idx = rng.integers(0, len(chars), n)
    return "".join(chars[i] for i in idx)


def _rand_paragraphs(rng: np.random.Generator, max_paras: int = 4) -> list[list[str]]:
    n_paras = int(rng.integers(1, max_paras + 1))
    return [[_rand_word(rng) for _ in range(int(rng.integers(5, 31)))] for _ in range(n_paras)]


def gen_conversation(
    conv_no: int,
    seed: int = 42,
    payload_fraction: float = 0.4,
    skew_fraction: float = 0.01,
    skew_mult: int = 50,
) -> tuple[list[dict], list[dict], list[dict]]:
    """Generate one conversation; returns (turn rows, ground-truth rows,
    media-metadata expectation rows).

    The media rows are computed from the layout-engine canvases at
    generation time — BEFORE payload packing — so they are a genuine oracle
    for the decode -> metadata pipeline (`operators.multimodal`)."""
    rng = np.random.default_rng([seed, conv_no])
    conv_id = f"conv{conv_no:07d}"
    n_turns = int(rng.integers(3, 11))
    if rng.random() < skew_fraction:
        n_turns *= skew_mult
    start = _EPOCH + dt.timedelta(hours=conv_no % 100_000)

    rows, gts, media = [], [], []

    def _media_rows(t: int, canvases) -> None:
        for page_idx, canvas in enumerate(canvases):
            h, w, n_bytes, ink_ratio, fjson = media_meta_row(canvas)
            media.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "page_idx": page_idx,
                    "media_kind": "page",
                    "height": h,
                    "width": w,
                    "n_bytes": n_bytes,
                    "ink_ratio": ink_ratio,
                    "feature_json": fjson,
                }
            )

    for t in range(n_turns):
        role = _ROLES[t % 3]
        tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
        prose = " ".join(_rand_word(rng) for _ in range(int(rng.integers(3, 9))))
        gt_text, n_pages, n_words = None, 0, 0
        if rng.random() < payload_fraction:
            kind = rng.random()
            if kind < 0.01:  # blank page: the zero-detection path
                pages = layout_paragraphs([])
                payload = make_img_payload(pages[0].canvas)
            elif kind < 0.45:
                paragraphs = _rand_paragraphs(rng)
                # cycle the real-web clutter grades: comments +
                # class/id furniture, entity-encoded text (&#NN;/&nbsp;)
                payload = make_html_payload(paragraphs, clutter=int(rng.integers(0, 3)))
                pages = layout_paragraphs(paragraphs)  # decode replays this
            elif kind < 0.65:
                paragraphs = _rand_paragraphs(rng, max_paras=2)
                pages = layout_paragraphs(paragraphs)[:1]
                _rotate_some_words(pages, rng)
                # a third of img payloads arrive as real PNG streams
                codec = "png" if rng.random() < 1 / 3 else "zlib"
                payload = make_img_payload(pages[0].canvas, codec=codec)
            elif kind < 0.82:
                paragraphs = _rand_paragraphs(rng)
                pages = layout_paragraphs(paragraphs)
                _rotate_some_words(pages, rng)
                payload = make_pdf_payload([p.canvas for p in pages])
            else:  # ruled table page (table-structure + word->cell joins)
                from .tables import render_table_page

                n_r = int(rng.integers(2, 5))
                n_c = int(rng.integers(2, 4))
                cells = [
                    [
                        ["".join(_WORD_CHARS[k] for k in rng.integers(0, len(_WORD_CHARS), int(rng.integers(1, 6))))
                         for _ in range(int(rng.integers(1, 3)))]
                        for _ in range(n_c)
                    ]
                    for _ in range(n_r)
                ]  # fmt: skip
                tp = render_table_page(cells)
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "role": role,
                        "text": f"{prose} {make_img_payload(tp.canvas)}",
                        "tool": tool,
                        "ts": start + dt.timedelta(minutes=t),
                    }
                )
                gts.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "gt_text": tp.gt_tsv,
                        "n_pages": 1,
                        "n_words": tp.n_words,
                    }
                )
                _media_rows(t, [tp.canvas])
                continue
            gt_text = render_document([p.gt_text for p in pages])
            n_pages = len(pages)
            n_words = sum(len(p.words) for p in pages)
            _media_rows(t, [p.canvas for p in pages])
            text = f"{prose} {payload} {_rand_word(rng)}"
        else:
            text = prose
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        if gt_text is not None:
            gts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "gt_text": gt_text,
                    "n_pages": n_pages,
                    "n_words": n_words,
                }
            )
    return rows, gts, media


TRANSCRIPTS_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
GT_SCHEMA = "conv_id string, turn_idx int, gt_text string, n_pages int, n_words int"
MEDIA_GT_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, media_kind string, "
    "height int, width int, n_bytes long, ink_ratio double, feature_json string"
)


def generate_transcripts(
    spark,
    n_convs: int,
    seed: int = 42,
    with_gt: bool = False,
    with_media: bool = False,
    parallelism: int | None = None,
):
    """Distributed generation: returns transcripts_df (plus the gt_df and/or
    media expectation df if asked, in that order)."""
    parallelism = parallelism or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_convs, 1, min(parallelism, max(1, n_convs))).withColumnRenamed("id", "conv_no")

    _COLS = {
        "rows": ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        "gt": ["conv_id", "turn_idx", "gt_text", "n_pages", "n_words"],
        "media": [
            "conv_id", "turn_idx", "page_idx", "media_kind",
            "height", "width", "n_bytes", "ink_ratio", "feature_json",
        ],  # fmt: skip
    }
    _IDX = {"rows": 0, "gt": 1, "media": 2}

    def _gen(kind: str):
        cols, idx = _COLS[kind], _IDX[kind]

        def fn(batches):
            for pdf in batches:
                all_rows = []
                for conv_no in pdf["conv_no"].tolist():
                    all_rows.extend(gen_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    out = [base.mapInPandas(_gen("rows"), schema=TRANSCRIPTS_SCHEMA)]
    if with_gt:
        out.append(base.mapInPandas(_gen("gt"), schema=GT_SCHEMA))
    if with_media:
        out.append(base.mapInPandas(_gen("media"), schema=MEDIA_GT_SCHEMA))
    return out[0] if len(out) == 1 else tuple(out)


def n_convs_for_sf(sf: float) -> int:
    """Scale-factor mapping used by entry()/bench: ~300 conversations per
    0.01 sf (~2k turns, ~800 payload-bearing)."""
    return max(8, int(round(sf * 30_000)))
