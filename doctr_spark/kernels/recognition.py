"""Recognition: crop -> (text, confidence), with wide-crop split/merge.

* CTC best-path decode reimplements
  `doctr/models/recognition/crnn/pytorch.py:56-93`: per-frame softmax, word
  confidence = min over frames of the max class probability, best path =
  framewise argmax collapsed by run-length then blank-stripped.
* Wide-crop handling reimplements
  `doctr/models/recognition/predictor/_utils.py:16-136` (split_crops /
  remap_preds) and `doctr/models/recognition/utils.py:12-110`
  (merge_strings / merge_multi_strings, Hamming-distance overlap alignment)
  — pure python here, rapidfuzz is not available.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import GLYPH_H, MAX_ASPECT_RATIO, SPLIT_OVERLAP_RATIO, TARGET_ASPECT_RATIO
from .glyphs import forward_logits
from .vocab import DEFAULT_VOCAB, decode_sequence


def whitelist_mask(vocab: str, whitelist: str) -> np.ndarray:
    """(C+1,) additive logit mask: -inf on characters outside the whitelist
    (blank always allowed). Reimplements the reference's "mask" whitelist
    mode, which forbids logits via a forward hook on the final projection
    (`doctr/models/utils/pytorch.py:230-355`, add_whitelist)."""
    allowed = set(whitelist)
    mask = np.zeros(len(vocab) + 1, dtype=np.float32)
    for i, c in enumerate(vocab):
        if c not in allowed:
            mask[i] = -np.inf
    # nudge blank so a frame whose true character was masked collapses to
    # blank instead of an arbitrary surviving class (ties in the fake flat
    # logits would otherwise hallucinate vocab[0])
    mask[-1] = 1e-3
    return mask


def nearest_whitelist_map(vocab: str, whitelist: str) -> dict[int, int]:
    """Forbidden-index -> allowed-index reassignment for the "nearest"
    whitelist mode (reference `_anyascii_nearest_map` + `_keep_and_reassign`,
    `doctr/models/utils/pytorch.py:288-355`): each forbidden character maps
    to the allowed character sharing its transliteration fold. anyascii is
    absent in this container, so the fold is the NFD diacritic strip plus
    the case fold — what anyascii produces on the Latin-1 range this
    engine's vocab covers (é -> e, É -> E/e, A -> a). Forbidden characters
    with no folded match stay unmapped and fall back to plain masking,
    like the reference."""
    import unicodedata

    allowed = set(whitelist)
    pos = {c: i for i, c in enumerate(vocab)}
    mapping: dict[int, int] = {}
    for i, c in enumerate(vocab):
        if c in allowed:
            continue
        base = unicodedata.normalize("NFD", c).encode("ascii", "ignore").decode("ascii") or c
        for cand in (base, base.lower(), base.upper(), c.lower(), c.upper()):
            if cand != c and cand in allowed and cand in pos:
                mapping[i] = pos[cand]
                break
    return mapping


def apply_whitelist(
    logits: np.ndarray, vocab: str, whitelist: str, mode: str = "mask"
) -> np.ndarray:
    """Constrain (T, C+1) logits to a character subset. "mask" forbids the
    complement outright; "nearest" first folds each forbidden character's
    logit onto its nearest allowed character, then masks."""
    if mode not in ("mask", "nearest"):
        raise ValueError(f"whitelist mode must be 'mask' or 'nearest', got {mode!r}")
    out = logits
    if mode == "nearest":
        out = logits.copy()
        for src, dst in nearest_whitelist_map(vocab, whitelist).items():
            out[:, dst] = np.maximum(out[:, dst], out[:, src])
    return out + whitelist_mask(vocab, whitelist)


def ctc_best_path(
    logits: np.ndarray,
    vocab: str = DEFAULT_VOCAB,
    whitelist: str | None = None,
    whitelist_mode: str = "mask",
) -> tuple[str, float]:
    """(T, C+1) logits -> (word, confidence); blank index = len(vocab).

    ``whitelist`` constrains decoding to a character subset (masked or
    nearest-reassigned logits, per ``whitelist_mode``).
    """
    if logits.shape[0] == 0:
        return "", 0.0
    if whitelist is not None:
        logits = apply_whitelist(logits, vocab, whitelist, whitelist_mode)
    # stable softmax -> per-frame max prob; sequence confidence = min of those
    shifted = logits - logits.max(axis=1, keepdims=True)
    ex = np.exp(shifted)
    ex[~np.isfinite(ex)] = 0.0
    probs = ex / np.clip(ex.sum(axis=1, keepdims=True), 1e-30, None)
    confidence = float(probs.max(axis=1).min())

    path = logits.argmax(axis=1)
    blank = len(vocab)
    # run-length collapse, then drop blanks
    keep = np.ones(path.shape[0], dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    collapsed = path[keep]
    chars = collapsed[collapsed != blank]
    return decode_sequence(chars, vocab), confidence


def ctc_best_path_batch(
    logits_list: list[np.ndarray],
    vocab: str = DEFAULT_VOCAB,
    whitelist: str | None = None,
    whitelist_mode: str = "mask",
) -> list[tuple[str, float]]:
    """`ctc_best_path` over many windows at once: all logits concatenate
    into one matrix for a single softmax/argmax pass, the per-window
    confidence is a segment-min (`minimum.reduceat`), and the run-length
    collapse respects segment starts. Bit-identical to the per-window
    decode (whitelist handling is row-independent, so it batches too)."""
    out: list[tuple[str, float] | None] = [None] * len(logits_list)
    idxs = [i for i, lg in enumerate(logits_list) if lg.shape[0]]
    for i, lg in enumerate(logits_list):
        if lg.shape[0] == 0:
            out[i] = ("", 0.0)
    if not idxs:
        return out  # type: ignore[return-value]
    big = np.concatenate([logits_list[i] for i in idxs], axis=0)
    if whitelist is not None:
        big = apply_whitelist(big, vocab, whitelist, whitelist_mode)
    path = big.argmax(axis=1)
    if whitelist is None:
        # the per-frame max softmax prob is exp(0)/sumexp = 1/sumexp, so the
        # full (T, C+1) probability matrix never needs materializing.
        # Bit-identical to (exp(shifted) / clip(sum)).max(axis=1):
        # correctly-rounded division is monotone in the numerator and the
        # max numerator is exactly exp(0.0) = 1.0, so elementwise-divide-
        # then-max lands on the same fl(1.0 / s). (Finite logits can't
        # produce NaN in exp.) The shift/exp run in place on the owned
        # concat buffer — `path` is already taken above, and the row max
        # is the gather big[t, path[t]], so this costs no extra
        # (T, C+1) allocations or passes.
        m = big[np.arange(big.shape[0]), path]
        np.subtract(big, m[:, None], out=big)
        np.exp(big, out=big)
        pmax = 1.0 / np.clip(big.sum(axis=1), 1e-30, None)
    else:
        shifted = big - big.max(axis=1, keepdims=True)
        ex = np.exp(shifted)
        # masked rows can be all -inf: inf - inf = nan inside exp
        ex[~np.isfinite(ex)] = 0.0
        pmax = (ex / np.clip(ex.sum(axis=1, keepdims=True), 1e-30, None)).max(axis=1)
    lens = np.asarray([logits_list[i].shape[0] for i in idxs])
    offs = np.concatenate(([0], np.cumsum(lens)))
    confs = np.minimum.reduceat(pmax, offs[:-1])
    keep = np.ones(path.shape[0], dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    keep[offs[:-1]] = True  # a segment start never merges into its neighbor
    blank = len(vocab)
    # vectorized collapse + decode: the emitted characters of ALL windows
    # (run starts that are not blank) translate through one utf-32 gather,
    # then each window's word is a substring slice — same output as the
    # per-window collapsed[collapsed != blank] decode, without a ~50 us
    # python loop body per window
    sel = np.flatnonzero(keep & (path != blank))
    vtab = np.frombuffer(vocab.encode("utf-32-le"), dtype=np.uint32)
    joined = vtab[path[sel]].tobytes().decode("utf-32-le") if sel.size else ""
    char_offs = np.searchsorted(sel, offs)
    for j, i in enumerate(idxs):
        out[i] = (joined[char_offs[j] : char_offs[j + 1]], float(confs[j]))
    return out  # type: ignore[return-value]


def attention_decode(logits: np.ndarray, vocab: str = DEFAULT_VOCAB) -> tuple[str, float]:
    """ViTSTR-style attention decode (reference
    `doctr/models/recognition/vitstr/pytorch.py:164-189`): per-step argmax,
    word cut at the first <eos> class (index len(vocab)), confidence = mean
    of the per-step max probabilities over the emitted characters.

    The alternative recognizer head: same (T, C+1) logits contract as the
    CTC path, no repeat-collapse (attention models emit one step per char).
    """
    if logits.shape[0] == 0:
        return "", 0.0
    shifted = logits - logits.max(axis=1, keepdims=True)
    ex = np.exp(shifted)
    probs = (ex / ex.sum(axis=1, keepdims=True)).max(axis=1)
    eos = len(vocab)
    idxs = logits.argmax(axis=1)
    chars = []
    for i in idxs:
        if int(i) == eos:
            break
        chars.append(int(i))
    word = decode_sequence(chars, vocab)
    conf = float(np.clip(probs[: len(word)], 0, 1).mean()) if word else 0.0
    return word, conf


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def merge_strings(a: str, b: str, overlap_ratio: float) -> str:
    """Best-overlap merge of two split-crop predictions.

    Same decision procedure as the reference
    (`doctr/models/recognition/utils.py:12-69`): crop one uncertain edge char
    from each side, score every candidate overlap length by Hamming
    distance, prefer a unique zero-distance alignment, tie-break multiple
    zeros (repeated characters) toward the overlap length the split geometry
    predicts, and otherwise minimize distance + deviation from the expected
    overlap.
    """
    if min(len(a), len(b)) <= 1:
        return a + b
    a_crop, b_crop = a[:-1], b[1:]
    max_overlap = min(len(a_crop), len(b_crop))
    scores = [_hamming(a_crop[-i:], b_crop[:i]) for i in range(1, max_overlap + 1)]
    expected = round(len(b) * overlap_ratio) - 3

    zeros = [i for i, s in enumerate(scores) if s == 0]
    if len(zeros) == 1:
        best = zeros[0]
    elif zeros:
        best = min(zeros, key=lambda i: abs(i - expected))
    elif expected < -1:
        return a + b
    elif expected < 0:
        return a_crop + b_crop
    else:
        combined = [s + abs(i - expected) for i, s in enumerate(scores)]
        best = combined.index(min(combined))
    return a_crop + b_crop[best + 1 :]


def merge_multi_strings(parts: list[str], overlap_ratio: float, last_overlap_ratio: float) -> str:
    """Left fold of merge_strings (`recognition/utils.py:72-110`)."""
    if not parts:
        return ""
    out = parts[0]
    for i in range(1, len(parts)):
        ratio = last_overlap_ratio if i == len(parts) - 1 else overlap_ratio
        out = merge_strings(out, parts[i], ratio)
    return out


def split_wide_crop(
    crop: np.ndarray,
    max_ratio: float = MAX_ASPECT_RATIO,
    target_ratio: float = TARGET_ASPECT_RATIO,
    overlap_ratio: float = SPLIT_OVERLAP_RATIO,
) -> tuple[list[np.ndarray], float]:
    """Split a crop wider than max_ratio*h into overlapping windows.

    Returns (windows, last_overlap_ratio). Window width = ceil(h *
    target_ratio), stride = width - floor(width * overlap_ratio), final
    window right-aligned — the same geometry as the reference
    `_split_horizontally` (`recognition/predictor/_utils.py:73-110`).
    """
    h, w = crop.shape[:2]
    if w / h <= max_ratio:
        return [crop], 0.0
    split_width = max(1, math.ceil(h * target_ratio))
    overlap_width = max(0, math.floor(split_width * overlap_ratio))
    if w <= split_width:
        return [crop], 0.0
    step = split_width - overlap_width
    starts = list(range(0, w - split_width + 1, step))
    if starts[-1] + split_width < w:
        starts.append(w - split_width)
    windows = [crop[:, s : s + split_width] for s in starts]
    last_overlap = 0.0
    if len(starts) > 1:
        last_overlap = (starts[-2] + split_width) - starts[-1]
    return windows, (last_overlap / split_width if split_width else 0.0)


RECO_BATCH = 128  # fixed model-forward batch (reference PreProcessor batch_size)


def forward_logits_batch(
    windows: list[np.ndarray], vocab: str = DEFAULT_VOCAB, arch: str = "ctc"
) -> list[np.ndarray]:
    """Fixed-size batched model forward: windows are stacked into padded
    (B, GLYPH_H, W_max) uint8 tensors of at most RECO_BATCH rows — the
    exact call boundary where a real CRNN/ViTSTR consumes one batch
    (reference `PreProcessor` fixed batching,
    `doctr/models/preprocessor/pytorch.py`, and the predictor's internal
    rebatch, `recognition/predictor/pytorch.py:58-66`). Swapping in a real
    NN replaces only the per-tensor body below with one batched forward.

    Zero right-padding is decode-safe for the stand-in: a glyph cell needs
    a full-height marker bar, so padding never fabricates characters — the
    stand-in decodes each row of the padded tensor at full width.
    """
    from .glyphs import forward_logits_attention, read_codes_batch

    fwd = forward_logits_attention if arch == "attention" else forward_logits
    out: list[np.ndarray] = []
    for start in range(0, len(windows), RECO_BATCH):
        chunk = windows[start : start + RECO_BATCH]
        w_max = max(w.shape[1] for w in chunk)
        widths = [w.shape[1] for w in chunk]
        batch = np.zeros((len(chunk), GLYPH_H, w_max), dtype=np.uint8)
        for i, w in enumerate(chunk):
            batch[i, :, : w.shape[1]] = w
        codes = read_codes_batch(batch, widths)
        out.extend(fwd(batch[i], vocab, codes=codes[i]) for i in range(len(chunk)))
    return out


def _ctc_decode_packed(
    codes_list: list[np.ndarray], vocab: str = DEFAULT_VOCAB
) -> list[tuple[str, float]]:
    """CTC best-path decode over the PACKED batched forward: instead of
    materializing one small (3n, C+1) logits array per window and
    re-concatenating thousands of them, the whole batch's logits build
    directly as ONE (sum 3n, C+1) matrix — three scattered fancy-index
    writes place exactly the frames `forward_logits` would emit (two hot
    frames + one blank frame per character), so the matrix is
    element-identical to ``concatenate([forward_logits(w) for w in ...])``
    and the decode below is the same softmax/argmax/collapse as
    :func:`ctc_best_path_batch` (no whitelist on this path)."""
    from ..config import LOGIT_HI
    from .vocab import blank_index

    nc = len(vocab)
    filtered = [c[c < nc] for c in codes_list]
    ns = np.asarray([c.shape[0] for c in filtered], dtype=np.int64)
    keep_idx = np.flatnonzero(ns > 0)
    out: list[tuple[str, float]] = [("", 0.0)] * len(codes_list)
    if keep_idx.size == 0:
        return out
    ns_k = ns[keep_idx]
    lens = 3 * ns_k
    offs = np.concatenate(([0], np.cumsum(lens)))
    all_codes = np.concatenate([filtered[i] for i in keep_idx])
    # frame row of character j in window w: offs[w] + 3*j
    within = np.arange(all_codes.shape[0]) - np.repeat(
        np.concatenate(([0], np.cumsum(ns_k)))[:-1], ns_k
    )
    rows0 = np.repeat(offs[:-1], ns_k) + 3 * within
    big = np.zeros((int(offs[-1]), nc + 1), dtype=np.float32)
    big[rows0, all_codes] = LOGIT_HI
    big[rows0 + 1, all_codes] = LOGIT_HI
    big[rows0 + 2, blank_index(vocab)] = LOGIT_HI
    path = big.argmax(axis=1)
    m = big[np.arange(big.shape[0]), path]
    np.subtract(big, m[:, None], out=big)
    np.exp(big, out=big)
    pmax = 1.0 / np.clip(big.sum(axis=1), 1e-30, None)
    confs = np.minimum.reduceat(pmax, offs[:-1])
    keep = np.ones(path.shape[0], dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    keep[offs[:-1]] = True
    sel = np.flatnonzero(keep & (path != nc))
    vtab = np.frombuffer(vocab.encode("utf-32-le"), dtype=np.uint32)
    joined = vtab[path[sel]].tobytes().decode("utf-32-le") if sel.size else ""
    char_offs = np.searchsorted(sel, offs)
    for j, i in enumerate(keep_idx):
        out[i] = (joined[char_offs[j] : char_offs[j + 1]], float(confs[j]))
    return out


def recognize_crops_batched(
    crops: list[np.ndarray],
    vocab: str = DEFAULT_VOCAB,
    whitelist: str | None = None,
    arch: str = "ctc",
    whitelist_mode: str = "mask",
) -> list[tuple[str, float]]:
    """Recognize many crops with ONE window-flattening + fixed-batch forward
    pass: every crop is split (wide-crop windows), all windows across all
    crops are forwarded in RECO_BATCH-sized padded tensors, and predictions
    are regrouped and merged per crop. Output is bit-identical to
    `recognize_crop` per crop; only the model-call batching differs."""
    from .glyphs import normalize_crop_height, read_codes_batch

    all_windows: list[np.ndarray] = []
    spans: list[tuple[int, int, float]] = []  # (start, n_windows, last_overlap)
    for crop in crops:
        crop = normalize_crop_height(crop)
        if crop is None:
            # a detection that isn't text-line shaped (embedded photo,
            # artefact, noise blob) is unreadable, not an error: the
            # reference resizes every crop to the model input, where such
            # regions decode to garbage the builder's empty/low-conf
            # filters drop — the stand-in goes straight to empty
            spans.append((len(all_windows), 0, 0.0))
            continue
        windows, last_overlap = split_wide_crop(crop)
        spans.append((len(all_windows), len(windows), last_overlap))
        all_windows.extend(windows)
    if arch == "attention":
        logits = forward_logits_batch(all_windows, vocab, arch)
        preds = [attention_decode(lg, vocab) for lg in logits]
    elif whitelist is not None:
        logits = forward_logits_batch(all_windows, vocab, arch)
        preds = ctc_best_path_batch(logits, vocab, whitelist, whitelist_mode)
    else:
        # hot path: read every window's character codes through the same
        # RECO_BATCH padded tensors, then decode via the packed matrix
        # (identical logits, one allocation instead of one per window)
        from ..config import GLYPH_H

        codes_list: list[np.ndarray] = []
        for start in range(0, len(all_windows), RECO_BATCH):
            chunk = all_windows[start : start + RECO_BATCH]
            w_max = max(w.shape[1] for w in chunk)
            widths = [w.shape[1] for w in chunk]
            batch = np.zeros((len(chunk), GLYPH_H, w_max), dtype=np.uint8)
            for i, w in enumerate(chunk):
                batch[i, :, : w.shape[1]] = w
            codes_list.extend(read_codes_batch(batch, widths))
        preds = _ctc_decode_packed(codes_list, vocab)
    out: list[tuple[str, float]] = []
    for start, n, last_overlap in spans:
        if n == 0:
            out.append(("", 0.0))
            continue
        window_preds = preds[start : start + n]
        if n == 1:
            out.append(window_preds[0])
            continue
        texts = [t for t, _ in window_preds]
        confs = [c for _, c in window_preds]
        out.append((merge_multi_strings(texts, SPLIT_OVERLAP_RATIO, last_overlap), float(sum(confs) / len(confs))))
    return out


def recognize_crop(
    crop: np.ndarray,
    vocab: str = DEFAULT_VOCAB,
    whitelist: str | None = None,
    arch: str = "ctc",
    whitelist_mode: str = "mask",
) -> tuple[str, float]:
    """Full recognition of one word crop: optional split -> forward ->
    decode -> merge. Mirrors `RecognitionPredictor.forward`
    (`doctr/models/recognition/predictor/pytorch.py:44-85`). ``arch``
    selects the decode head: "ctc" (CRNN best-path) or "attention"
    (ViTSTR <eos>-cut). Crops that are not text-line shaped (wrong height:
    photos, artefacts, noise) read as empty — see recognize_crops_batched."""
    from .glyphs import normalize_crop_height

    crop = normalize_crop_height(crop)
    if crop is None:
        return "", 0.0
    windows, last_overlap = split_wide_crop(crop)
    if arch == "attention":
        from .glyphs import forward_logits_attention

        preds = [attention_decode(forward_logits_attention(w, vocab), vocab) for w in windows]
    else:
        preds = [
            ctc_best_path(forward_logits(w, vocab), vocab, whitelist, whitelist_mode)
            for w in windows
        ]
    if len(preds) == 1:
        return preds[0]
    texts = [t for t, _ in preds]
    confs = [c for _, c in preds]
    merged = merge_multi_strings(texts, SPLIT_OVERLAP_RATIO, last_overlap)
    return merged, float(sum(confs) / len(confs))
