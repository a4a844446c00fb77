"""Real-PDF fixture: conversations whose payloads are genuine ``%PDF-``
byte streams written by the from-scratch codec (`kernels.pdf.write_pdf`),
alternating raw and FlateDecode content streams. The ground truth is the
generator's own word layout — extraction must parse the PDF, rasterize
the text operators, and read every word back exactly."""

from __future__ import annotations

import base64
import datetime as dt

import numpy as np
import pandas as pd

from ..config import GLYPH_H, LINE_LEADING, MARGIN, PAGE_H, PAGE_W, WORD_GAP
from ..kernels.glyphs import word_width
from ..kernels.pdf import apply_incremental_update, encrypt_pdf, write_pdf
from .transcripts import GT_SCHEMA, TRANSCRIPTS_SCHEMA

_EPOCH = dt.datetime(2025, 4, 1)
_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"
_ROW_PITCH = GLYPH_H + LINE_LEADING


def _word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 9))
    return "".join(_CHARS[i] for i in rng.integers(0, len(_CHARS), n))


def gen_pdf_page(
    rng: np.random.Generator, scale: int = 1
) -> tuple[list[tuple[int, int, str]], str, int]:
    """One page of packed word rows; returns (placements, gt_text, n_words).
    ``scale`` lays the page out at that glyph scale (font size 12*scale)."""
    placements: list[tuple[int, int, str]] = []
    lines: list[list[str]] = []
    y = MARGIN
    for _ in range(int(rng.integers(3, 7))):
        words: list[str] = []
        x = MARGIN
        while True:
            w = _word(rng)
            if x + word_width(w) * scale > PAGE_W - MARGIN or len(words) >= 7:
                break
            placements.append((x, y, w))
            words.append(w)
            x += (word_width(w) + WORD_GAP) * scale
        if len(words) >= 2:
            lines.append(words)
        else:
            placements = placements[: len(placements) - len(words)]
            continue
        y += _ROW_PITCH * scale
        if y + GLYPH_H * scale > PAGE_H - MARGIN:
            break
    gt = "\n".join(" ".join(ws) for ws in lines)
    return placements, gt, sum(len(ws) for ws in lines)


def _render_canvas(placements: list[tuple[int, int, str]]) -> np.ndarray:
    """Glyph-render a page's word layout — the pixels a scanner would see."""
    from ..kernels.glyphs import draw_word

    canvas = np.zeros((PAGE_H, PAGE_W), dtype=np.uint8)
    for x, y, wd in placements:
        draw_word(canvas, x, y, wd)
    return canvas


def gen_pdf_conversation(conv_no: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng([seed, conv_no, 37])
    conv_id = f"pdf{conv_no:07d}"
    n_turns = int(rng.integers(1, 4))
    start = _EPOCH + dt.timedelta(hours=conv_no)
    rows, gts = [], []
    for t in range(n_turns):
        n_pages = int(rng.integers(1, 3))
        # cycle the writer variants so every parser path runs end to end:
        # raw / FlateDecode, per-word Tm vs kerned [..] TJ arrays,
        # ASCIIHexDecode, PDF 1.5 object+xref streams, Tf 24 (glyph
        # scale 2 through the crop normalizer), SCANNED pages (§8.9
        # image XObjects carrying the rendered pixels under an invisible
        # 3 Tr OCR text layer — extraction must read the IMAGE),
        # ROTATED scans (stored sideways, /Rotate displays upright),
        # CCITT Group 4 fax scans (the dominant real-scanner filter),
        # baseline-JPEG (/DCTDecode) scans, INLINE-image (§8.9.7) scans,
        # form-XObject-wrapped (§8.10) text layers, PROGRESSIVE-JPEG
        # (SOF2, Annex G) scans, and ENCRYPTED files (§7.6 standard
        # security handler: RC4-128 text, AES-128 scans, AES-256
        # /V 5 /R 6 — empty user password, the mass-produced
        # "protected" layouts), CTM-ROTATED scans (raster stored
        # sideways, the placement matrix rotates it upright — the
        # no-/Rotate scanner layout), JBIG2 (/JBIG2Decode, T.88)
        # scans alternating arithmetic and MMR generic regions, and the
        # three SUBSET-FONT encodings (§9.6-9.10): Type0/Identity-H
        # two-byte CIDs through a ToUnicode CMap (the Chrome/LibreOffice
        # layout), /Encoding /Differences glyph-name remaps (the
        # word-processor layout), and a bare-ToUnicode simple font (the
        # LaTeX subset layout) — in all three the string bytes are
        # remapped codes, so only the encoding layer recovers the text —
        # JPEG 2000 (/JPXDecode, T.800 lossless 5/3) scans, the
        # archival-scanner layout, MIXED-font pages (/F1 unencoded +
        # /F2 Identity-H alternating word by word — the every-real-PDF
        # construct: the reader must re-resolve the decoder at each Tf),
        # TYPE3 glyph-procedure fonts (the DjVu-converter OCR-layer
        # layout: Differences names + required /Widths + CharProcs), and
        # INCREMENTALLY-UPDATED files (§7.5.6 — the original body holds
        # decoy text; appended same-numbered objects + /Prev xref replace
        # it, so extraction must honor later-definition-wins)
        mode = (conv_no + t) % 25
        scan = mode in (6, 7, 8, 9, 10, 12, 14, 16, 17, 21)
        scale = 2 if mode == 5 else 1
        rotate = (90, 180, 270)[conv_no % 3] if mode == 7 else 0
        page_words, gt_pages, n_words = [], [], 0
        for _ in range(n_pages):
            placements, gt, n = gen_pdf_page(rng, scale)
            page_words.append(placements)
            gt_pages.append(gt)
            n_words += n
        blob = write_pdf(
            # mode 24: the ORIGINAL body carries decoy text; the real
            # placements arrive via the appended update section below
            [[(MARGIN, MARGIN, "draft"), (MARGIN + 40, MARGIN, "obsolete")]] * n_pages
            if mode == 24
            else page_words,
            (PAGE_H, PAGE_W),
            compress=mode in (1, 4, 5, 11),
            use_tj=mode in (2, 4),
            ascii_hex=mode == 3,
            pdf15=mode == 4,
            font_size=12 * scale,
            images={
                i: [
                    (
                        # modes 8/17: bilevel ink mask -> G4 / JBIG2 stream
                        _render_canvas(pw) > 127
                        if mode in (8, 17)
                        else _render_canvas(pw),
                        0,
                        0,
                    )
                ]
                for i, pw in enumerate(page_words)
            }
            if scan
            else None,
            render_mode=3 if scan else 0,
            rotate=rotate,
            ccitt_g4=mode == 8,
            jbig2=mode == 17,
            jbig2_mmr=conv_no % 2 == 1,
            jpeg_quality=95 if mode in (9, 12) else None,
            jpeg_progressive=mode == 12,
            jpx=mode == 21,
            # alternate lossless 5/3 and lossy-but-transparent 9/7 scans
            jpx_irreversible=conv_no % 2 == 1,
            ctm_rotate=(90, 180, 270)[conv_no % 3] if mode == 16 else 0,
            inline_images=mode == 10,
            form_wrap=mode == 11,
            font_kind={
                18: "type0", 19: "differences", 20: "tounicode", 22: "mixed",
                23: "type3",
            }.get(mode, "type1"),
            # declared metrics ride along on the kerned-TJ mode (simple
            # /Widths drive the §9.4.4 advance) and the Type0 mode (/W)
            declare_widths=mode in (2, 18),
        )
        if mode == 24:
            blob = apply_incremental_update(blob, page_words, (PAGE_H, PAGE_W))
        elif mode == 13:
            blob = encrypt_pdf(blob, "rc4-128")
        elif mode == 14:
            blob = encrypt_pdf(blob, "aes-128")
        elif mode == 15:
            blob = encrypt_pdf(blob, "aes-256", owner_pw=b"owner")
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ("user", "assistant", "tool")[t % 3],
                "text": "pdf attachment <doc:pdf>"
                + base64.b64encode(blob).decode("ascii")
                + "</doc:pdf>",
                "tool": None,
                "ts": start + dt.timedelta(minutes=t),
            }
        )
        gts.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "gt_text": "\n\n\n\n".join(gt_pages),
                "n_pages": n_pages,
                "n_words": n_words,
            }
        )
    return rows, gts


def generate_pdf_transcripts(spark, n_convs: int, seed: int = 42, with_gt: bool = False):
    """Distributed generation (same contract as
    `transcripts.generate_transcripts`)."""
    parallelism = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_convs, 1, min(parallelism, max(1, n_convs))).withColumnRenamed(
        "id", "conv_no"
    )

    def _gen(idx: int, cols: list[str]):
        def fn(batches):
            for pdf in batches:
                rows = []
                for conv_no in pdf["conv_no"].tolist():
                    rows.extend(gen_pdf_conversation(int(conv_no), seed)[idx])
                yield pd.DataFrame(rows, columns=cols)

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
