"""From-scratch CCITT Group 3/4 fax codec (ITU-T T.4 / T.6).

``/CCITTFaxDecode`` is the dominant stream filter in real scanned PDFs —
virtually every bilevel fax/scanner pipeline emits Group 4 (T.6 MMR).
The reference rasterizes these via pypdfium2 (`doctr/io/pdf.py:16-43`);
this container has no imaging stack, so — like the JPEG, PNG, LZW and
MAT v5 codecs — the needed subset of the PUBLIC spec is implemented
from scratch:

* DECODER: Group 4 / MMR (``/K < 0``: pass, vertical V0..V±3 and
  horizontal modes against the reference line, T.4 §4.2 run-length
  Huffman tables incl. the shared extended makeup codes to 2560, EOFB
  detection) and Group 3 one-dimensional MH (``/K = 0``: per-row
  white/black run alternation with optional leading EOLs).
  ``/Columns``, ``/Rows``, ``/BlackIs1`` and ``/EncodedByteAlign``
  honored with the PDF defaults (1728, unbounded, false, false).
* ENCODER: Group 4 with the same mode-selection rule every fax chip
  uses (pass when b2 < a1, vertical when |a1-b1| <= 3, else
  horizontal), closing EOFB — so write→parse round trips are exact and
  the PDF writer can emit the real-scanner layout.
* ``/K > 0`` (mixed two-dimensional Group 3) and uncompressed-mode
  extension codes reject LOUDLY — the disclosed-gate contract.

Pixel convention: arrays are boolean INK masks (True = black). The PDF
layer maps them onto /DeviceGray samples per /BlackIs1 (default false:
0 bit = black, T.6 §2).

At 100 TB these decodes run inside Arrow-batched ``mapInPandas``
workers; the per-row transition loop is the known pure-Python constant
a libtiff binding would replace behind the same signatures.
"""

from __future__ import annotations

import numpy as np

# T.4 terminating codes, run 0..63: (code string) per color
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100", "110101",
    "101010", "101011", "0100111", "0001100", "0001000", "0010111", "0000011",
    "0000100", "0101000", "0101011", "0010011", "0100100", "0011000", "00000010",
    "00000011", "00011010", "00011011", "00010010", "00010011", "00010100",
    "00010101", "00010110", "00010111", "00101000", "00101001", "00101010",
    "00101011", "00101100", "00101101", "00000100", "00000101", "00001010",
    "00001011", "01010010", "01010011", "01010100", "01010101", "00100100",
    "00100101", "01011000", "01011001", "01011010", "01011011", "01001010",
    "01001011", "00110010", "00110011", "00110100",
]  # fmt: skip
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100", "00000111",
    "000011000", "0000010111", "0000011000", "0000001000", "00001100111",
    "00001101000", "00001101100", "00000110111", "00000101000", "00000010111",
    "00000011000", "000011001010", "000011001011", "000011001100", "000011001101",
    "000001101000", "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110", "000011010111",
    "000001101100", "000001101101", "000011011010", "000011011011", "000001010100",
    "000001010101", "000001010110", "000001010111", "000001100100", "000001100101",
    "000001010010", "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001", "000000101011",
    "000000101100", "000001011010", "000001100110", "000001100111",
]  # fmt: skip
# makeup codes, runs 64, 128, ... (multiples of 64)
_WHITE_MAKEUP = [
    "11011", "10010", "010111", "0110111", "00110110", "00110111", "01100100",
    "01100101", "01101000", "01100111", "011001100", "011001101", "011010010",
    "011010011", "011010100", "011010101", "011010110", "011010111", "011011000",
    "011011001", "011011010", "011011011", "010011000", "010011001", "010011010",
    "011000", "010011011",
]  # fmt: skip  # 64..1728
_BLACK_MAKEUP = [
    "0000001111", "000011001000", "000011001001", "000001011011", "000000110011",
    "000000110100", "000000110101", "0000001101100", "0000001101101",
    "0000001001010", "0000001001011", "0000001001100", "0000001001101",
    "0000001110010", "0000001110011", "0000001110100", "0000001110101",
    "0000001110110", "0000001110111", "0000001010010", "0000001010011",
    "0000001010100", "0000001010101", "0000001011010", "0000001011011",
    "0000001100100", "0000001100101",
]  # fmt: skip  # 64..1728
# extended makeup codes 1792..2560, shared by both colors (T.4 Table 4)
_EXT_MAKEUP = [
    "00000001000", "00000001100", "00000001101", "000000010010", "000000010011",
    "000000010100", "000000010101", "000000010110", "000000010111", "000000011100",
    "000000011101", "000000011110", "000000011111",
]  # fmt: skip

_EOL = "000000000001"


def _run_table(color: int) -> dict[str, int]:
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    table = {c: r for r, c in enumerate(term)}
    table.update({c: 64 * (i + 1) for i, c in enumerate(makeup)})
    table.update({c: 1792 + 64 * i for i, c in enumerate(_EXT_MAKEUP)})
    return table


_RUN_DECODE = (_run_table(0), _run_table(1))
_RUN_ENCODE = (
    {r: c for c, r in _RUN_DECODE[0].items()},
    {r: c for c, r in _RUN_DECODE[1].items()},
)


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def eof(self) -> bool:
        return self.pos >= 8 * len(self.data)

    def bit(self) -> int:
        if self.eof():
            raise ValueError("CCITT stream truncated")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def peek(self, n: int) -> str:
        save = self.pos
        out = []
        try:
            for _ in range(n):
                out.append(str(self.bit()))
        except ValueError:
            pass
        self.pos = save
        return "".join(out)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _Bits, color: int) -> int:
    """Total run length: zero or more makeup codes then a terminating
    code (<64), per T.4 §4.1/4.2."""
    table = _RUN_DECODE[color]
    total = 0
    while True:
        code = ""
        for _ in range(14):
            code += str(bits.bit())
            if code in table:
                break
        else:
            raise ValueError("invalid CCITT run-length code")
        run = table[code]
        total += run
        if run < 64:
            return total


def _b1_index(ref: list[int], a0: int, color: int) -> int:
    """Index in ``ref`` of b1: first changing element > a0 whose
    transition is to the color OPPOSITE the coding color (even indices
    are white->black transitions)."""
    i = 0
    while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
        i += 1
    return i


def _row_from_transitions(trans: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=bool)
    for j in range(0, len(trans) - 1, 2):
        row[trans[j] : trans[j + 1]] = True  # black run
    return row


def _decode_g4_row(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    cur: list[int] = []
    a0, color = -1, 0
    while a0 < columns:
        i = _b1_index(ref, a0, color)
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        # longest-first mode codes: V0=1, VR1=011, VL1=010, H=001,
        # P=0001, VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        if bits.bit():
            a1 = b1  # V0
        elif bits.bit():
            a1 = b1 + 1 if bits.bit() else b1 - 1  # VR1 / VL1
        elif bits.bit():  # 001 horizontal
            base = max(a0, 0)
            r1 = _read_run(bits, color)
            r2 = _read_run(bits, color ^ 1)
            a1, a2 = base + r1, base + r1 + r2
            cur += [min(a1, columns), min(a2, columns)]
            a0 = a2
            continue
        elif bits.bit():  # 0001 pass
            a0 = b2
            continue
        elif bits.bit():
            a1 = b1 + 2 if bits.bit() else b1 - 2  # VR2 / VL2
        elif bits.bit():
            a1 = b1 + 3 if bits.bit() else b1 - 3  # VR3 / VL3
        else:
            # 0000000... : EOL prefix (EOFB) or the uncompressed-mode
            # extension — only EOFB is in-subset, handled by the caller
            raise NotImplementedError(
                "CCITT extension/uncompressed mode codes are outside the codec subset"
            )
        cur.append(min(a1, columns))
        a0, color = a1, color ^ 1
    return cur


def decode_ccitt(
    data: bytes,
    columns: int = 1728,
    rows: int | None = None,
    k: int = -1,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode a CCITT fax stream to a boolean INK mask (True = black).

    ``k`` follows the PDF /K convention: negative = Group 4 (T.6),
    zero = Group 3 one-dimensional (T.4 MH); positive (mixed 2-D G3)
    rejects loudly. Decoding stops after ``rows`` rows, at EOFB, or at
    end of data.
    """
    if k > 0:
        raise NotImplementedError(
            "CCITT /K > 0 (mixed two-dimensional Group 3) is outside the codec subset"
        )
    bits = _Bits(data)
    out: list[np.ndarray] = []
    ref = [columns, columns]  # imaginary all-white reference line
    while rows is None or len(out) < rows:
        if byte_align:
            bits.byte_align()
        # EOLs: in G4 the first one IS the EOFB terminator; in G3-1D a
        # single EOL prefixes a line and 2+ consecutive mean RTC
        n_eol = 0
        while bits.peek(12) == _EOL:
            bits.pos += 12
            n_eol += 1
            if k < 0 or n_eol >= 2:
                return _stack(out, columns)
        rest = bits.peek(12)
        if not rest or (len(rest) < 12 and set(rest) <= {"0"}):
            break  # end of data (possibly zero-padding to the last byte)
        if k < 0:
            cur = _decode_g4_row(bits, ref, columns)
            out.append(_row_from_transitions(cur + [columns], columns))
            ref = cur + [columns, columns]
        else:  # K = 0: MH — alternating white/black runs to exactly columns
            trans: list[int] = []
            pos, color = 0, 0
            while pos < columns:
                run = _read_run(bits, color)
                pos += run
                trans.append(min(pos, columns))
                color ^= 1
            out.append(_row_from_transitions(trans, columns))
    return _stack(out, columns)


def _stack(out: list[np.ndarray], columns: int) -> np.ndarray:
    if not out:
        return np.zeros((0, columns), dtype=bool)
    return np.stack(out)


class _BitW:
    def __init__(self) -> None:
        self.buf: list[str] = []

    def put(self, code: str) -> None:
        self.buf.append(code)

    def tobytes(self) -> bytes:
        s = "".join(self.buf)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _put_run(bw: _BitW, run: int, color: int) -> None:
    """Optional makeup code(s) + one terminating code (T.4 §4.1): runs
    past 2623 repeat the 2560 makeup (decoders accumulate makeups until
    a terminating code arrives)."""
    enc = _RUN_ENCODE[color]
    while run > 2623:
        bw.put(enc[2560])
        run -= 2560
    if run >= 64:
        bw.put(enc[run & ~63])
        run &= 63
    bw.put(enc[run])


def encode_g4(img: np.ndarray, byte_align: bool = False) -> bytes:
    """Encode a boolean ink mask (True = black) as Group 4 (T.6) with a
    closing EOFB."""
    img = np.asarray(img, dtype=bool)
    if img.ndim != 2:
        raise ValueError("encode_g4 takes a 2-D boolean ink mask")
    columns = img.shape[1]
    bw = _BitW()
    ref = [columns, columns]
    for r in range(img.shape[0]):
        if byte_align:
            s = sum(len(c) for c in bw.buf)
            if s % 8:
                bw.put("0" * (8 - s % 8))
        row = img[r]
        cur = list(np.flatnonzero(np.diff(np.concatenate(([False], row)).astype(np.int8))))
        # np.diff of 0/1 as int8: +1 at white->black, -1 at black->white;
        # flatnonzero keeps both — positions ARE the changing elements
        cur = [int(c) for c in cur]
        trans = cur + [columns, columns]
        a0, color, ti = -1, 0, 0
        while a0 < columns:
            a1 = trans[ti] if ti < len(trans) else columns
            i = _b1_index(ref, a0, color)
            b1 = ref[i] if i < len(ref) else columns
            b2 = ref[i + 1] if i + 1 < len(ref) else columns
            if b2 < a1:
                bw.put("0001")  # pass
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                bw.put({0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010", 3: "0000011", -3: "0000010"}[d])
                a0, color, ti = a1, color ^ 1, ti + 1
            else:
                a2 = trans[ti + 1] if ti + 1 < len(trans) else columns
                bw.put("001")
                base = max(a0, 0)
                _put_run(bw, a1 - base, color)
                _put_run(bw, a2 - a1, color ^ 1)
                a0, ti = a2, ti + 2
        ref = cur + [columns, columns]
    bw.put(_EOL + _EOL)  # EOFB
    return bw.tobytes()
