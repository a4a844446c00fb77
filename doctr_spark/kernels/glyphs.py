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

import functools

import numpy as np

from ..config import CODE_BITS, GLYPH_H, GLYPH_W, INK, LOGIT_HI
from .vocab import DEFAULT_VOCAB, blank_index, encode_string

_BIT_WEIGHTS = (1 << np.arange(CODE_BITS)).astype(np.int32)


def word_width(text: str) -> int:
    return len(text) * GLYPH_W


@functools.lru_cache(maxsize=65536)
def _word_raster(text: str, vocab: str = DEFAULT_VOCAB) -> np.ndarray:
    """Cached (GLYPH_H, word_width) raster of a word: per-cell marker bar +
    code bits + the full-width baseline row. Corpus vocabularies repeat
    heavily, so rendering becomes one cached-array blit per word."""
    codes = encode_string(text, vocab)
    word = np.zeros((GLYPH_H, len(codes) * GLYPH_W), dtype=np.uint8)
    for i, code in enumerate(codes):
        cx = i * GLYPH_W
        word[:, cx] = INK  # marker bar
        bits = (code & _BIT_WEIGHTS) > 0
        word[:CODE_BITS, cx + 1][bits] = INK  # code bits
    word[GLYPH_H - 1, :] = INK  # baseline ties cells together
    word.setflags(write=False)
    return word


def draw_word(
    canvas: np.ndarray, x0: int, y0: int, text: str, vocab: str = DEFAULT_VOCAB
) -> tuple[int, int, int, int]:
    """Draw ``text`` with its top-left cell at (x0, y0); returns the abs box
    (xmin, ymin, xmax, ymax), exclusive max, which is also the ink bbox.

    The blit is max-combined so existing ink (table rulings crossing the
    region's blank columns) survives exactly as the per-pixel set did."""
    w = word_width(text)
    if y0 + GLYPH_H > canvas.shape[0] or x0 + w > canvas.shape[1]:
        raise ValueError("word does not fit on canvas")
    region = canvas[y0 : y0 + GLYPH_H, x0 : x0 + w]
    np.maximum(region, _word_raster(text, vocab), out=region)
    return (x0, y0, x0 + w, y0 + GLYPH_H)


# Robust-decode thresholds (resampled ink), as FRACTIONS of the crop's ink
# amplitude so faint-but-crisp words (low-contrast ink the FAST preset
# detects) decode exactly like full-ink ones: a bilinear-rotated marker
# pixel keeps >= half its weight while any sub-pixel displacement stays
# under 0.5 px, so WEAK accepts quarter-weight halo rows to keep the bar
# connected, while MID reads code bits at just under half weight. On crisp
# ink ({0, amp}) both reduce to the exact > 0 test.
_WEAK_FRAC = 0.3
_MID_FRAC = 0.49
_WEAK_INK = 64  # absolute variant for full-ink (INK=204) contexts


def synthesize_page(page: dict, vocab: str = DEFAULT_VOCAB) -> np.ndarray:
    """Render a page EXPORT dict back to a canvas — the inverse operator
    (reference ``synthesize_page``, `doctr/utils/reconstitution.py:128-279`,
    draws every word's value at its geometry on a blank page; here in the
    deterministic glyph font, which makes synthesis a true inverse of
    extraction: re-extracting the synthesized page reproduces the words at
    their geometry). Table cell values are re-drawn at their cell anchors;
    non-text artefacts (photos, barcodes) are not part of the export and
    are not reconstituted, exactly like the reference."""
    h, w = (int(v) for v in page["dimensions"])
    canvas = np.zeros((h, w), dtype=np.uint8)

    def _place(value: str, x0: int, y0: int) -> None:
        x0 = max(0, min(x0, w - word_width(value)))
        y0 = max(0, min(y0, h - GLYPH_H))
        draw_word(canvas, x0, y0, value, vocab)

    for block in page.get("blocks", []):
        for line in block["lines"]:
            for word in line["words"]:
                g = word["geometry"]
                _place(word["value"], int(round(g[0] * w)), int(round(g[1] * h)))
    from ..config import WORD_GAP

    for table in page.get("tables", []):
        for cell in table.get("cells", []):
            g = cell.get("geometry")
            if g is None or not cell.get("value"):
                continue
            x = int(round(g[0] * w))
            y = int(round(g[1] * h))
            for tok in str(cell["value"]).split():
                _place(tok, x, y)
                x += word_width(tok) + WORD_GAP
    return canvas


def read_codes(crop: np.ndarray) -> np.ndarray:
    """Decode the character codes visible in a (GLYPH_H, w) crop.

    Cells whose marker bar is incomplete (typically the ragged edges of an
    overlap-split window) are skipped — the reference handles the same
    uncertainty by cropping the first/last character before merging
    (`doctr/models/recognition/utils.py:33-35`).

    Resampled (interpolation-rotated) ink lands each cell up to ~1 px off
    the nominal glyph grid, with the displacement drifting across a long
    word. Each cell therefore searches a +/-1 px (dy, dx) neighborhood for
    the alignment maximizing marker-bar continuity — the stand-in analogue
    of a conv feature extractor's translation tolerance. The centered
    offset wins ties, so crisp input decodes bit-identically to the exact
    path.
    """
    h, w = crop.shape
    if h != GLYPH_H:
        raise ValueError(f"recognition crop must be {GLYPH_H} px tall, got {h}")
    n = w // GLYPH_W
    if n == 0:
        return np.empty(0, dtype=np.int32)
    amp = int(crop.max())
    if amp == 0:
        return np.empty(0, dtype=np.int32)
    weak = max(1.0, _WEAK_FRAC * amp)
    mid = max(1.0, _MID_FRAC * amp)
    base = crop[:, : n * GLYPH_W].reshape(h, n, GLYPH_W)
    marker_rows0 = (base[:, :, 0] >= weak).sum(axis=0).astype(np.int32)
    if (marker_rows0 == h).all():
        # crisp aligned crop (the overwhelmingly common case): identical to
        # the exact single-pass decode, no offset search
        bits = base[:CODE_BITS, :, 1] >= mid
        return (bits.astype(np.int32) * _BIT_WEIGHTS[:, None]).sum(axis=0)
    padded = np.zeros((h + 2, n * GLYPH_W + 2), dtype=crop.dtype)
    padded[1:-1, 1:-1] = crop[:, : n * GLYPH_W]
    best_rows = np.full(n, -1, dtype=np.int32)
    best_bits = np.zeros((CODE_BITS, n), dtype=bool)
    for dy in (0, -1, 1):
        for dx in (0, -1, 1):
            win = padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + n * GLYPH_W]
            cells = win.reshape(h, n, GLYPH_W)
            marker_rows = (cells[:, :, 0] >= weak).sum(axis=0).astype(np.int32)
            bits = cells[:CODE_BITS, :, 1] >= mid
            better = marker_rows > best_rows  # strict: (0,0) wins ties
            best_bits[:, better] = bits[:, better]
            best_rows = np.maximum(best_rows, marker_rows)
    valid = best_rows == h
    codes = (best_bits.astype(np.int32) * _BIT_WEIGHTS[:, None]).sum(axis=0)
    return codes[valid]


def read_codes_batch(batch: np.ndarray, widths: list[int]) -> list[np.ndarray]:
    """Vectorized `read_codes` over a zero-padded (B, GLYPH_H, W_max) batch.

    The crisp-aligned fast path (every real cell's marker bar complete)
    computes for the whole batch in a handful of array ops instead of ~16
    small numpy calls per crop; crops that need the +/-1 px offset search
    (resampled ink — rare) fall back to the exact per-crop path. Output is
    bit-identical to calling `read_codes(crop)` per unpadded crop."""
    b, h, w_max = batch.shape
    if h != GLYPH_H:
        raise ValueError(f"recognition batch must be {GLYPH_H} px tall, got {h}")
    n_max = w_max // GLYPH_W
    if b == 0 or n_max == 0:
        return [np.empty(0, dtype=np.int32) for _ in range(b)]
    ns = np.asarray([w // GLYPH_W for w in widths], dtype=np.int64)
    base = np.ascontiguousarray(batch[:, :, : n_max * GLYPH_W]).reshape(b, h, n_max, GLYPH_W)
    amp = batch.max(axis=(1, 2)).astype(np.float64)
    weak = np.maximum(1.0, _WEAK_FRAC * amp)
    mid = np.maximum(1.0, _MID_FRAC * amp)
    marker_rows = (base[:, :, :, 0] >= weak[:, None, None]).sum(axis=1)
    real = np.arange(n_max)[None, :] < ns[:, None]
    crisp = ((marker_rows == h) | ~real).all(axis=1)
    codes_all = (
        (base[:, :CODE_BITS, :, 1] >= mid[:, None, None]).astype(np.int32)
        * _BIT_WEIGHTS[None, :, None]
    ).sum(axis=1)
    out: list[np.ndarray] = []
    for i in range(b):
        if ns[i] == 0 or amp[i] == 0:
            out.append(np.empty(0, dtype=np.int32))
        elif crisp[i]:
            out.append(codes_all[i, : ns[i]])
        else:
            out.append(read_codes(batch[i, :, : widths[i]]))
    return out


_CROP_SCALES = (1, 2, 4)  # accepted scan resolutions (multiples of glyph scale)


def normalize_crop_height(crop: np.ndarray) -> np.ndarray | None:
    """Snap a near-line-height crop to exactly GLYPH_H rows — the stand-in
    for the reference PreProcessor's resize-to-model-input
    (`doctr/models/preprocessor/pytorch.py`).

    Two real-world effects are absorbed here: (a) a detection box around
    resampled ink overshoots the glyph rows by a halo pixel or two — the
    densest GLYPH_H-row window recovers the line; (b) a page scanned at a
    HIGHER resolution than the model input (2x / 4x the glyph scale, the
    usual 300-dpi case) is mean-pooled down, which is also what makes
    interpolation-rotated ink decodable: sub-pixel displacement at scan
    scale shrinks by the pooling factor. Crops near no supported scale
    (photos, artefacts, noise) return None = unreadable."""
    h = crop.shape[0]
    if h == GLYPH_H:
        return crop
    for s in _CROP_SCALES:
        target = s * GLYPH_H
        if target - 2 <= h <= target + 2 * s + 2:
            if h > target:
                ink = (crop >= _WEAK_INK).sum(axis=1)
                sums = np.convolve(ink, np.ones(target, dtype=np.int64), mode="valid")
                top = int(sums.argmax())
                snapped = crop[top : top + target]
            elif h < target:
                snapped = np.zeros((target, crop.shape[1]), dtype=crop.dtype)
                snapped[:h] = crop
            else:
                snapped = crop
            if s == 1:
                return snapped
            w2 = snapped.shape[1] // s * s
            if w2 == 0:
                return None
            pooled = snapped[:, :w2].reshape(GLYPH_H, s, w2 // s, s).mean(axis=(1, 3))
            pooled = np.rint(pooled).astype(crop.dtype)
            # text-likeness gate: the 2x/4x pooling windows overlap the
            # heights of striped non-text detections (bar/QR artefacts, logo
            # rings, photo halftone), whose pooled pixels can coincidentally
            # form valid-looking glyph cells and emit garbage characters.
            # Two cues, both of which real scanned text satisfies and
            # periodic/stochastic non-text ink does not: (a) at least half
            # the cells carry a complete marker bar, (b) the glyph cells'
            # structurally-blank columns stay blank (a barcode's stripes
            # fill them; a bilinear halo stays under the weak threshold).
            n_cells = pooled.shape[1] // GLYPH_W
            if n_cells == 0 or read_codes(pooled).shape[0] < max(1, -(-n_cells // 2)):
                return None
            blank_cols = pooled[:, : n_cells * GLYPH_W].reshape(GLYPH_H, n_cells, GLYPH_W)[:, :, 2:]
            if (blank_cols >= max(1.0, _WEAK_FRAC * float(pooled.max()))).mean() > 0.2:
                return None
            return pooled
    return None


def forward_logits_attention(
    crop: np.ndarray, vocab: str = DEFAULT_VOCAB, codes: np.ndarray | None = None
) -> np.ndarray:
    """Attention-head forward (ViTSTR-style): one frame per character plus
    a terminating <eos> frame — no blanks, no repeats to collapse."""
    if codes is None:
        codes = read_codes(crop)
    codes = codes[codes < len(vocab)]  # non-glyph ink (photos, noise) can
    # encode out-of-vocab bit patterns; such cells are unreadable, not text
    c_plus_1 = len(vocab) + 1
    logits = np.zeros((len(codes) + 1, c_plus_1), dtype=np.float32)
    for i, code in enumerate(codes):
        logits[i, code] = LOGIT_HI
    logits[len(codes), blank_index(vocab)] = LOGIT_HI  # <eos>
    return logits


def forward_logits(
    crop: np.ndarray, vocab: str = DEFAULT_VOCAB, codes: np.ndarray | None = None
) -> np.ndarray:
    """The recognition "model forward": crop -> (T, C+1) float32 logits.

    Emits two frames per decoded character followed by a blank frame, so the
    downstream CTC best-path collapse (repeat-merge + blank-strip) is
    exercised for real, including repeated characters.
    """
    if codes is None:
        codes = read_codes(crop)
    codes = codes[codes < len(vocab)]  # drop unreadable (out-of-vocab) cells
    c_plus_1 = len(vocab) + 1
    n = len(codes)
    logits = np.zeros((3 * n, c_plus_1), dtype=np.float32)
    if n:
        i3 = 3 * np.arange(n)
        logits[i3, codes] = LOGIT_HI
        logits[i3 + 1, codes] = LOGIT_HI
        logits[i3 + 2, blank_index(vocab)] = LOGIT_HI
    return logits
