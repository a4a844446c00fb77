"""The deterministic glyph "font" — this engine's stand-in for real text ink.

Since the container has no text-rendering or NN stack, words are drawn in a
machine-readable barcode font: each character occupies a GLYPH_W-wide cell
whose first column is a full-height marker bar and whose second column
encodes the character's vocab index as CODE_BITS row-bits; the bottom row of
the word is a solid baseline connecting all cells. Consequences:

* a word is a single 8-connected ink component whose bounding box is exactly
  the word box -> the connected-components detection postprocess genuinely
  recovers detection ground truth,
* a crop of the word can be decoded column-by-column -> the recognition
  stand-in emits real (T, C+1) logits that a faithful CTC best-path decoder
  (reference `doctr/models/recognition/crnn/pytorch.py:56-93`) collapses to
  the original string.

Mirrors the role of `synthesize_text_img` in the reference test fixtures
(`/root/reference/doctr/datasets/generator/base.py:19-60`,
`tests/conftest.py:26-42`).
"""

from __future__ import annotations

import numpy as np

from ..config import CODE_BITS, GLYPH_H, GLYPH_W, INK, LOGIT_HI
from .vocab import DEFAULT_VOCAB, blank_index, encode_string

_BIT_WEIGHTS = (1 << np.arange(CODE_BITS)).astype(np.int32)


def word_width(text: str) -> int:
    return len(text) * GLYPH_W


def draw_word(canvas: np.ndarray, x0: int, y0: int, text: str) -> tuple[int, int, int, int]:
    """Draw ``text`` with its top-left cell at (x0, y0); returns the abs box
    (xmin, ymin, xmax, ymax), exclusive max, which is also the ink bbox."""
    w = word_width(text)
    if y0 + GLYPH_H > canvas.shape[0] or x0 + w > canvas.shape[1]:
        raise ValueError("word does not fit on canvas")
    codes = encode_string(text)
    for i, code in enumerate(codes):
        cx = x0 + i * GLYPH_W
        canvas[y0 : y0 + GLYPH_H, cx] = INK  # marker bar
        bits = (code & _BIT_WEIGHTS) > 0
        canvas[y0 : y0 + CODE_BITS, cx + 1][bits] = INK  # code bits
    canvas[y0 + GLYPH_H - 1, x0 : x0 + w] = INK  # baseline ties cells together
    return (x0, y0, x0 + w, y0 + GLYPH_H)


def read_codes(crop: np.ndarray) -> np.ndarray:
    """Decode the character codes visible in a (GLYPH_H, w) crop.

    Cells whose marker bar is incomplete (typically the ragged edges of an
    overlap-split window) are skipped — the reference handles the same
    uncertainty by cropping the first/last character before merging
    (`doctr/models/recognition/utils.py:33-35`).
    """
    h, w = crop.shape
    if h != GLYPH_H:
        raise ValueError(f"recognition crop must be {GLYPH_H} px tall, got {h}")
    n = w // GLYPH_W
    if n == 0:
        return np.empty(0, dtype=np.int32)
    cells = crop[:, : n * GLYPH_W].reshape(h, n, GLYPH_W)
    # marker bar complete in every row -> valid cell
    valid = (cells[:, :, 0] > 0).all(axis=0)
    bits = cells[:CODE_BITS, :, 1] > 0  # (CODE_BITS, n)
    codes = (bits.astype(np.int32) * _BIT_WEIGHTS[:, None]).sum(axis=0)
    return codes[valid]


def forward_logits_attention(crop: np.ndarray, vocab: str = DEFAULT_VOCAB) -> np.ndarray:
    """Attention-head forward (ViTSTR-style): one frame per character plus
    a terminating <eos> frame — no blanks, no repeats to collapse."""
    codes = read_codes(crop)
    codes = codes[codes < len(vocab)]  # non-glyph ink (photos, noise) can
    # encode out-of-vocab bit patterns; such cells are unreadable, not text
    c_plus_1 = len(vocab) + 1
    logits = np.zeros((len(codes) + 1, c_plus_1), dtype=np.float32)
    for i, code in enumerate(codes):
        logits[i, code] = LOGIT_HI
    logits[len(codes), blank_index(vocab)] = LOGIT_HI  # <eos>
    return logits


def forward_logits(crop: np.ndarray, vocab: str = DEFAULT_VOCAB) -> np.ndarray:
    """The recognition "model forward": crop -> (T, C+1) float32 logits.

    Emits two frames per decoded character followed by a blank frame, so the
    downstream CTC best-path collapse (repeat-merge + blank-strip) is
    exercised for real, including repeated characters.
    """
    codes = read_codes(crop)
    codes = codes[codes < len(vocab)]  # drop unreadable (out-of-vocab) cells
    c_plus_1 = len(vocab) + 1
    t = 3 * len(codes)
    logits = np.zeros((t, c_plus_1), dtype=np.float32)
    blank = blank_index(vocab)
    for i, code in enumerate(codes):
        logits[3 * i, code] = LOGIT_HI
        logits[3 * i + 1, code] = LOGIT_HI
        logits[3 * i + 2, blank] = LOGIT_HI
    return logits
