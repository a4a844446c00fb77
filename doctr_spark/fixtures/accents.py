"""Accented-text transcript fixture: the non-ASCII corpus slice.

Every turn's payload text mixes plain ASCII words with Latin-1 accented
words (the `french` vocab block, reference `doctr/datasets/vocabs.py:30`),
over both payload kinds — html (text survives as Unicode in the transcript
string) and img (accents round-trip through the glyph code space). The
ground truth carries BOTH the accented text and its generation-time NFD
ASCII fold (`kernels.vocab.translate` per word), so the query can prove the
Spark-side fold expression and the per-char NFD kernel agree end to end.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..kernels.builder import render_document
from ..kernels.vocab import ASCII_LOWER, LATIN1_ACCENTS, translate
from .layout import layout_paragraphs
from .payloads import make_html_payload, make_img_payload
from .transcripts import TRANSCRIPTS_SCHEMA

_EPOCH = dt.datetime(2024, 5, 1)
_ACCENT_CHARS = ASCII_LOWER + LATIN1_ACCENTS

ACCENT_GT_SCHEMA = (
    "conv_id string, turn_idx int, gt_text string, gt_ascii string, n_pages int, n_words int"
)


def _accent_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 10))
    idx = rng.integers(0, len(_ACCENT_CHARS), n)
    return "".join(_ACCENT_CHARS[i] for i in idx)


def _fold_text(gt_text: str) -> str:
    """Whitespace-preserving ASCII fold: the NFD kernel per word."""
    return "\n".join(
        " ".join(translate(w, "latin") for w in line.split(" ")) for line in gt_text.split("\n")
    )


def gen_accent_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 11])
    conv_id = f"acc{conv_no:07d}"
    n_turns = int(rng.integers(2, 6))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        paragraphs = [
            [_accent_word(rng) for _ in range(int(rng.integers(4, 12)))]
            for _ in range(int(rng.integers(1, 4)))
        ]
        pages = layout_paragraphs(paragraphs)
        if rng.random() < 0.5:
            payload = make_html_payload(paragraphs)
        else:
            pages = pages[:1]
            payload = make_img_payload(pages[0].canvas)
        gt_text = render_document([p.gt_text for p in pages])
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": f"note {payload}",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "gt_text": gt_text,
                "gt_ascii": _fold_text(gt_text),
                "n_pages": len(pages),
                "n_words": sum(len(p.words) for p in pages),
            }
        )
    return rows, gts


def generate_accented_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed accented-fixture generation (same contract as
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
                    all_rows.extend(gen_accent_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(all_rows, columns=cols)

        return fn

    tdf = base.mapInPandas(
        _gen(0, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]), schema=TRANSCRIPTS_SCHEMA
    )
    if not with_gt:
        return tdf
    gdf = base.mapInPandas(
        _gen(1, ["conv_id", "turn_idx", "gt_text", "gt_ascii", "n_pages", "n_words"]),
        schema=ACCENT_GT_SCHEMA,
    )
    return tdf, gdf
