"""PDF font-encoding layer (ISO 32000-1 §9.6-9.10): the machinery that
maps STRING BYTES in a content stream to Unicode text.

Real-world generators almost never emit the latin-1-ish identity the
simple fixture font uses: word processors subset their fonts and remap
byte codes (``/Encoding << /Differences [...] >>`` over a base encoding,
§9.6.6), LaTeX/Ghostscript emit subset simple fonts whose only decode
path is the ``/ToUnicode`` CMap (§9.10.3), and Chrome/LibreOffice emit
composite ``/Type0`` fonts with ``/Encoding /Identity-H`` where every
glyph is a TWO-byte CID resolved through the ToUnicode CMap (§9.7.6).
This module holds the shared tables and codecs for all of those:

- a WinAnsiEncoding table (Annex D.2 — latin-1 except the 0x80-0x9F
  block, which carries the Windows-1252 typographic set),
- an Adobe Glyph List subset covering the engine vocab (letters map to
  their own names, ``zero``-``nine``, the ASCII punctuation names, the
  French accent set),
- a ToUnicode CMap parser (``bfchar``/``bfrange``, both the increment
  and array destination forms) and the matching writer-side generator.

Reference behavior: docTR delegates all of this to pypdfium2
(`doctr/io/pdf.py:16-43`); here it is from-scratch public-spec code so
the extraction engine's loud no-dependency gate narrows further.
"""

from __future__ import annotations

import re

# -- Annex D.2: WinAnsiEncoding. Identical to latin-1 outside
# 0x80-0x9F; that block carries the Windows-1252 typographic characters
# (undefined codes 0x81/0x8D/0x8F/0x90/0x9D are absent).
WINANSI_HIGH: dict[int, str] = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def winansi_table() -> list[str]:
    """Code -> character for all 256 WinAnsi codes."""
    table = [chr(c) for c in range(256)]
    for c in range(0x80, 0xA0):
        table[c] = WINANSI_HIGH.get(c, "�")
    return table


# -- Adobe Glyph List subset: every character in the engine vocab plus
# space. Letters and digits are programmatic; the rest is the published
# AGL name for that codepoint.
_AGL_PUNCT = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
}
_AGL_ACCENTS = {
    "agrave": "à", "acircumflex": "â", "eacute": "é",
    "egrave": "è", "ecircumflex": "ê", "edieresis": "ë",
    "icircumflex": "î", "idieresis": "ï",
    "ocircumflex": "ô", "ugrave": "ù", "ucircumflex": "û",
    "udieresis": "ü", "ccedilla": "ç",
    "Agrave": "À", "Acircumflex": "Â", "Eacute": "É",
    "Egrave": "È", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Icircumflex": "Î", "Idieresis": "Ï",
    "Ocircumflex": "Ô", "Ugrave": "Ù", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Ccedilla": "Ç",
}
_AGL_DIGITS = {
    n: str(i)
    for i, n in enumerate(
        ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]
    )
}
AGL: dict[str, str] = {
    **{c: c for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"},
    **_AGL_DIGITS,
    **_AGL_PUNCT,
    **_AGL_ACCENTS,
}
_AGL_INV = {v: k for k, v in AGL.items()}


def glyph_name(ch: str) -> str:
    """AGL name for a vocab character (writer side of /Differences)."""
    try:
        return _AGL_INV[ch]
    except KeyError:
        raise NotImplementedError(
            f"character {ch!r} has no glyph name in the AGL subset"
        ) from None


# -- ToUnicode CMap (§9.10.3) -------------------------------------------

_HEX = rb"<([0-9A-Fa-f]+)>"
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_PAIR_RE = re.compile(_HEX + rb"\s*" + _HEX)
_RANGE_RE = re.compile(_HEX + rb"\s*" + _HEX + rb"\s*(?:" + _HEX + rb"|\[(.*?)\])", re.DOTALL)
_DST_RE = re.compile(_HEX)


def _u16(hx: bytes) -> str:
    """UTF-16BE hex destination -> text (may be multiple code units:
    ligature/multi-char destinations are legal per §9.10.3)."""
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be")


def parse_tounicode(data: bytes) -> dict[int, str]:
    """Decode a ToUnicode CMap stream into code -> text. Handles
    ``bfchar`` pairs and both ``bfrange`` destination forms (increment
    from a single start value, or an explicit array)."""
    out: dict[int, str] = {}
    for sec in _BFCHAR_RE.finditer(data):
        for src, dst in _PAIR_RE.findall(sec.group(1)):
            out[int(src, 16)] = _u16(dst)
    for sec in _BFRANGE_RE.finditer(data):
        for lo_h, hi_h, dst_h, arr in _RANGE_RE.findall(sec.group(1)):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            if arr:
                dsts = _DST_RE.findall(arr)
                if len(dsts) != hi - lo + 1:
                    raise ValueError("bfrange array length does not match the code range")
                for i, d in enumerate(dsts):
                    out[lo + i] = _u16(d)
            else:
                base = _u16(dst_h)
                # increment form: the LAST code unit increments (§9.10.3)
                for i in range(hi - lo + 1):
                    out[lo + i] = base[:-1] + chr(ord(base[-1]) + i)
    return out


def build_tounicode_cmap(code2char: dict[int, str], two_byte: bool) -> bytes:
    """Writer side: a complete, spec-shaped ToUnicode CMap stream for the
    given code -> character table. Consecutive (code, codepoint) runs
    compress into ``bfrange`` increment entries; isolated codes become
    ``bfchar`` pairs — both parser paths get exercised by any real
    charset."""
    width = 4 if two_byte else 2
    space_hi = 0xFFFF if two_byte else 0xFF

    def h(code: int) -> bytes:
        return b"<%0*X>" % (width, code)

    codes = sorted(code2char)
    runs: list[tuple[int, int]] = []  # (start_idx, length) over `codes`
    i = 0
    while i < len(codes):
        j = i
        while (
            j + 1 < len(codes)
            and codes[j + 1] == codes[j] + 1
            and len(code2char[codes[j]]) == 1
            and len(code2char[codes[j + 1]]) == 1
            and ord(code2char[codes[j + 1]]) == ord(code2char[codes[j]]) + 1
            # an increment run must not carry the last code unit past 0xFFFF
            and (codes[j + 1] & 0xFF) != 0  # spec: ranges stay within one high byte
        ):
            j += 1
        runs.append((i, j - i + 1))
        i = j + 1

    bfranges, bfchars = [], []
    for start, n in runs:
        lo = codes[start]
        if n > 1:
            dst = code2char[lo].encode("utf-16-be").hex().upper().encode()
            bfranges.append(h(lo) + b" " + h(lo + n - 1) + b" <" + dst + b">")
        else:
            dst = code2char[lo].encode("utf-16-be").hex().upper().encode()
            bfchars.append(h(lo) + b" <" + dst + b">")

    def _sections(entries: list[bytes], kind: bytes) -> bytes:
        # CMap spec: at most 100 entries per begin/end section
        out = b""
        for k in range(0, len(entries), 100):
            chunk = entries[k : k + 100]
            out += (
                b"%d begin%s\n" % (len(chunk), kind)
                + b"\n".join(chunk)
                + b"\nend%s\n" % kind
            )
        return out

    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"/CIDSystemInfo << /Registry (AAAA) /Ordering (UCS) /Supplement 0 >> def\n"
        b"/CMapName /AAAA+UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n" + h(0) + b" " + h(space_hi) + b"\nendcodespacerange\n"
        + _sections(bfranges, b"bfrange")
        + _sections(bfchars, b"bfchar")
        + b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )


def assign_codes(charset: set[str], two_byte: bool) -> dict[str, int]:
    """Deterministic non-identity code assignment for subset-font
    fixtures: 1-byte kinds start at 0x21 (printable, but shifted off the
    characters' own codes), 2-byte CIDs start past 0x0100 so any
    byte-width bug in the decoder surfaces immediately."""
    base = 0x0103 if two_byte else 0x21
    return {ch: base + i for i, ch in enumerate(sorted(charset))}
