"""Minimal from-scratch PDF text codec.

The reference rasterizes PDFs with pypdfium2 (`doctr/io/pdf.py:16-43`),
which this container lacks. Like the MAT v5 codec (`kernels/matv5.py`),
this module implements the subset of the PUBLIC PDF 1.4 specification the
engine needs, from scratch against the spec (ISO 32000 / the Adobe PDF
Reference): indirect objects + xref, page tree, MediaBox, content streams
(raw or /FlateDecode — zlib is stdlib), and the text-showing operators
``BT/ET``, ``Tm`` (text matrix; translation part), ``Td`` (relative text
displacement) and ``(…) Tj`` with the ``\\( \\) \\\\`` escapes. Everything
else is either ignored (graphics state the rasterizer does not need) or
rejected LOUDLY (unknown stream filters, encrypted files), preserving the
disclosed-gate contract for PDFs beyond the subset.

Rasterization draws each extracted word in the deterministic glyph font,
so a parsed page flows through the standard detection → recognition
pipeline bit-exactly. Coordinates: PDF space is y-up from the bottom-left;
the writer stores a word whose TOP sits at ``y_top`` as
``pdf_y = page_h - y_top - GLYPH_H`` and the parser inverts it.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from ..config import GLYPH_H

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_TM_TD_TJ_RE = re.compile(
    rb"(?:(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+Tm)"
    rb"|(?:(-?[\d.]+)\s+(-?[\d.]+)\s+Td)"
    rb"|(?:\(((?:[^()\\]|\\.)*)\)\s*Tj)"
    rb"|(BT)|(ET)"
)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unesc(b: bytes) -> str:
    return (
        b.replace(rb"\(", b"(")
        .replace(rb"\)", b")")
        .replace(rb"\\", b"\\")
        .decode("latin-1")
    )


def write_pdf(
    pages: list[list[tuple[int, int, str]]],
    page_hw: tuple[int, int],
    compress: bool = False,
) -> bytes:
    """Write a real PDF: one content stream per page, each word as
    ``1 0 0 1 x y Tm (word) Tj`` inside a BT/ET block; ``pages`` holds
    per-page ``(x, y_top, word)`` placements in top-down pixel space."""
    h, w = page_hw
    objs: list[bytes] = []  # object bodies, 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids, content_ids = [], []
    for words in pages:
        ops = [b"BT /F1 12 Tf"]
        for x, y_top, word in words:
            pdf_y = h - int(y_top) - GLYPH_H
            ops.append(f"1 0 0 1 {int(x)} {pdf_y} Tm ({_esc(word)}) Tj".encode("latin-1"))
        ops.append(b"ET")
        raw = b"\n".join(ops)
        if compress:
            data = zlib.compress(raw)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = raw
            head = b"<< /Length %d >>" % len(data)
        content_ids.append(add(head + b"\nstream\n" + data + b"\nendstream"))
    pages_id = len(objs) + len(pages) + 1  # forward ref: pages node comes after
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
                b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
                % (pages_id, w, h, cid, font)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    return bytes(out)


def parse_pdf(data: bytes) -> list[dict]:
    """Parse a PDF into per-page ``{"size": (h, w), "words": [(x, y_top,
    text)]}``. Raises NotImplementedError for constructs outside the
    supported subset (non-Flate filters, encryption)."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF stream")
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDFs are outside the from-scratch codec subset")
    # Sequential object scan honoring /Length: stream payloads are BINARY
    # and may contain "endobj"/"endstream"/newline bytes, so the stream
    # extent must come from the declared length, never from delimiter
    # search inside the payload (PDF 32000 §7.3.8).
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    head_re = re.compile(rb"(\d+)\s+0\s+obj")
    pos = 0
    while True:
        m = head_re.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        sm = _STREAM_RE.search(data, m.end())
        em = data.find(b"endobj", m.end())
        if sm is not None and (em == -1 or sm.start() < em):
            head = data[m.end() : sm.start()]
            # (?!\d) anchors the full number — without it '/Length 10 0 R'
            # backtracks to match '1' and the indirect-length construct is
            # silently parsed as a 1-byte stream instead of rejecting loudly
            lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+0\s+R)", head)
            if not lm:
                raise NotImplementedError(
                    "stream without a literal /Length is outside the codec subset"
                )
            ln = int(lm.group(1))
            stream = data[sm.end() : sm.end() + ln]
            objs[num] = (head, stream)
            end = data.find(b"endobj", sm.end() + ln)
            if end == -1:
                raise ValueError("truncated PDF: stream object without endobj")
            pos = end + len(b"endobj")
        else:
            if em == -1:
                raise ValueError("truncated PDF: object without endobj")
            objs[num] = (data[m.end() : em], None)
            pos = em + len(b"endobj")

    def _dict_of(num: int) -> bytes:
        return objs[num][0]

    root_m = re.search(rb"/Root\s+(\d+)\s+0\s+R", data)
    if not root_m:
        raise NotImplementedError("PDF without a /Root trailer entry")
    pages_m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", _dict_of(int(root_m.group(1))))
    kids_src = _dict_of(int(pages_m.group(1)))
    kids_m = re.search(rb"/Kids\s*\[(.*?)\]", kids_src, re.DOTALL)
    out = []
    for ref in _REF_RE.finditer(kids_m.group(1)):
        page_num = int(ref.group(1))
        head, _ = objs[page_num]
        mb = re.search(
            rb"/MediaBox\s*\[\s*(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s*\]", head
        )
        x0, y0, x1, y1 = (float(v) for v in mb.groups())
        w, h = int(round(x1 - x0)), int(round(y1 - y0))
        contents = []
        cm = re.search(rb"/Contents\s+(?:\[(.*?)\]|(\d+)\s+0\s+R)", head, re.DOTALL)
        refs = (
            [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
            if cm.group(1)
            else [int(cm.group(2))]
        )
        for cnum in refs:
            chead, stream = objs[cnum]
            if stream is None:
                continue
            if re.search(rb"/Filter\s*\[", chead):
                raise NotImplementedError(
                    "array-valued /Filter (filter chains) is outside the "
                    "from-scratch codec subset (reference uses pypdfium2)"
                )
            fm = re.search(rb"/Filter\s*/?(\w+)", chead)
            if fm:
                if fm.group(1) == b"FlateDecode":
                    stream = zlib.decompress(stream)
                else:
                    raise NotImplementedError(
                        f"PDF stream filter /{fm.group(1).decode()} is outside the "
                        "from-scratch codec subset (reference uses pypdfium2)"
                    )
            contents.append(stream)
        words: list[tuple[float, float, str]] = []
        x = y = 0.0
        for m in _TM_TD_TJ_RE.finditer(b"\n".join(contents)):
            if m.group(1) is not None:  # Tm: take the translation part
                x, y = float(m.group(5)), float(m.group(6))
            elif m.group(7) is not None:  # Td: relative displacement
                x, y = x + float(m.group(7)), y + float(m.group(8))
            elif m.group(9) is not None:  # Tj
                words.append((x, h - y - GLYPH_H, _unesc(m.group(9))))
            elif m.group(10) is not None:  # BT resets the text matrix
                x = y = 0.0
        out.append({"size": (h, w), "words": words})
    return out


def rasterize_pdf(data: bytes, vocab: str | None = None) -> list[np.ndarray]:
    """Parse + draw every page in the deterministic glyph font -> uint8
    canvases ready for the standard detection path."""
    from .glyphs import draw_word, word_width
    from .vocab import DEFAULT_VOCAB

    pages = []
    for page in parse_pdf(data):
        h, w = page["size"]
        canvas = np.zeros((h, w), dtype=np.uint8)
        for x, y_top, text in page["words"]:
            if not text:
                continue
            xi = max(0, min(int(round(x)), w - word_width(text)))
            yi = max(0, min(int(round(y_top)), h - GLYPH_H))
            draw_word(canvas, xi, yi, text, vocab or DEFAULT_VOCAB)
        pages.append(canvas)
    return pages
