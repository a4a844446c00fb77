"""Minimal from-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The reference decodes JPEG via PIL/opencv inside its dataset loaders and
``DocumentFile.from_images`` (`doctr/io/image/base.py:16-54`); this
container has neither, so — like the PDF, PNG, MAT v5 and HDF5 codecs —
the needed subset of the PUBLIC spec is implemented from scratch:

* ENCODER: baseline sequential DCT (SOF0), 8-bit, grayscale (one
  component) or YCbCr from RGB input with 4:4:4 or 4:2:0 chroma
  subsampling, Annex K quantization tables scaled by the libjpeg
  quality formula, Annex K Huffman tables, JFIF APP0, byte stuffing,
  optional restart intervals (DRI/RSTn).
* DECODER: baseline sequential SOF0, one or three components, any
  sampling grid with max factor 2 (4:4:4, 4:2:2, 4:2:0), DRI/RSTn,
  multiple DQT/DHT segments. The engine's pipeline is grayscale, so
  the decoder reconstructs the LUMA channel only (chroma blocks are
  entropy-decoded to stay in sync, then discarded) — the exact signal
  detection/recognition consume.
* PROGRESSIVE (SOF2) decode per T.81 Annex G: spectral selection +
  successive approximation, DC/AC first and refinement passes, EOBRUN,
  restart markers, any Al/Ah script — coefficients accumulate in a
  per-component store and reconstruct at EOI. The encoder can emit a
  progressive stream too (``progressive=True``, 4:4:4/gray, classic
  successive-approximation scan script) so round trips exercise every
  Annex G decode path against the baseline pipeline bit-for-bit.
* Arithmetic coding (SOF9+), lossless, hierarchical and 12-bit
  precision reject LOUDLY — the disclosed-gate contract; the swap-in
  seam for a full library remains `operators.multimodal.decode_media` /
  the PDF ``DCTDecode`` branch.

At 100 TB these decodes run inside Arrow-batched ``mapInPandas`` workers
(one image per row, no driver involvement); the per-image pure-Python
entropy loop is the known constant and exactly what a libjpeg binding
would replace behind the same function signatures.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# zigzag scan order (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)  # fmt: skip

# Annex K.1 quantization tables
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)  # fmt: skip
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)  # fmt: skip

# Annex K.3 "typical" Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)  # fmt: skip
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)  # fmt: skip

# orthonormal 8-point DCT-II basis — T.81 A.3.3's FDCT/IDCT are exactly
# the orthonormal transform, so C @ block @ C.T is the spec transform
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> table scale factor."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns the new DC
    predictor."""
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q.flat[ZIGZAG]
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    bw.put(code, length)
    if cat:
        bw.put(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.put(code, length)
        bw.put(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad a component plane to 8x8 multiples (edge replicate, A.2.1) and
    return (rows, cols, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _dht_segment(tc_th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(v) for v in table.flat[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode a 2-D uint8 grayscale image (or an (H, W, 3) RGB image via
    the JFIF YCbCr transform) as a baseline sequential JPEG — or, with
    ``progressive=True``, as a progressive (SOF2) stream using the
    classic successive-approximation scan script (4:4:4/gray only)."""
    img = np.asarray(img)
    color = img.ndim == 3
    if color:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(p, 0, 255).astype(np.uint8) for p in (y, cb, cr))
    else:
        y = img.astype(np.uint8)
    h, w = y.shape
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    dc_l, ac_l = _build_codes(*DC_LUMA), _build_codes(*AC_LUMA)
    dc_c, ac_c = _build_codes(*DC_CHROMA), _build_codes(*AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, ql)
    if color:
        out += _dqt_segment(1, qc)
    if subsampling == "4:4:4" or not color:
        hs = vs = 1
    elif subsampling == "4:2:0":
        hs = vs = 2
    else:
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    ncomp = 3 if color else 1
    if progressive and (restart_interval or (color and hs != 1)):
        raise ValueError("progressive encoding is 4:4:4/gray, no restart intervals")
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, (hs << 4) | vs, 0])
    if color:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(">H", len(sof) + 2) + sof
    if progressive:
        planes_q = [(y, ql)] + ([(cb, qc), (cr, qc)] if color else [])
        _encode_progressive(planes_q, out)
        out += b"\xff\xd9"
        return bytes(out)
    out += _dht_segment(0x00, DC_LUMA) + _dht_segment(0x10, AC_LUMA)
    if color:
        out += _dht_segment(0x01, DC_CHROMA) + _dht_segment(0x11, AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp, 1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    if not color:
        blocks = _blocks_of(y)
        pred = 0
        n = 0
        for br in range(blocks.shape[0]):
            for bc in range(blocks.shape[1]):
                if restart_interval and n and n % restart_interval == 0:
                    bw.flush()
                    out += bw.out
                    out += bytes([0xFF, 0xD0 + ((n // restart_interval - 1) % 8)])
                    bw = _BitWriter()
                    pred = 0
                pred = _encode_block(bw, blocks[br, bc], ql, dc_l, ac_l, pred)
                n += 1
    else:
        if hs == 1:
            planes = [(y, ql, dc_l, ac_l), (cb, qc, dc_c, ac_c), (cr, qc, dc_c, ac_c)]
            blks = [_blocks_of(p) for p, *_ in planes]
            preds = [0, 0, 0]
            for br in range(blks[0].shape[0]):
                for bc in range(blks[0].shape[1]):
                    for ci, (_, q, dct, act) in enumerate(planes):
                        preds[ci] = _encode_block(bw, blks[ci][br, bc], q, dct, act, preds[ci])
        else:  # 4:2:0 — 2x2 box-average chroma, MCU = Y00 Y01 Y10 Y11 Cb Cr
            ph, pw = -h % 2, -w % 2
            ye = np.pad(y, ((0, ph), (0, pw)), mode="edge")
            cbe = np.pad(cb, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
            cre = np.pad(cr, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
            cbs = cbe.reshape(-1, 2, cbe.shape[1] // 2, 2).mean(axis=(1, 3))
            crs = cre.reshape(-1, 2, cre.shape[1] // 2, 2).mean(axis=(1, 3))
            yb, cbb, crb = _blocks_of(ye), _blocks_of(cbs), _blocks_of(crs)
            # pad Y to an even number of blocks so MCUs tile fully
            yr = np.pad(
                yb,
                ((0, yb.shape[0] % 2), (0, yb.shape[1] % 2), (0, 0), (0, 0)),
                mode="edge",
            )
            preds = [0, 0, 0]
            for mr in range(cbb.shape[0]):
                for mc in range(cbb.shape[1]):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            preds[0] = _encode_block(
                                bw, yr[2 * mr + dy, 2 * mc + dx], ql, dc_l, ac_l, preds[0]
                            )
                    preds[1] = _encode_block(bw, cbb[mr, mc], qc, dc_c, ac_c, preds[1])
                    preds[2] = _encode_block(bw, crb[mr, mc], qc, dc_c, ac_c, preds[2])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker and records it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy segment truncated at marker")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                self.acc = (self.acc << 8) | 0  # pad after marker per F.2.2.5
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Discard pad bits, consume the pending marker, return its code."""
        self.n = 0
        if self.marker is None:
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] in (0x00,):
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        else:
            self.pos += 2
        m, self.marker = self.marker, None
        return m


def _build_decode_tree(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, quant: np.ndarray, pred: int):
    zz = np.zeros(64, dtype=np.int64)
    cat = _read_symbol(br, dc_tab)
    pred = pred + _extend(br.bits(cat), cat)
    zz[0] = pred
    i = 1
    while i < 64:
        rs = _read_symbol(br, ac_tab)
        run, cat = rs >> 4, rs & 0xF
        if cat == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[i] = _extend(br.bits(cat), cat)
        i += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * quant.flat[ZIGZAG]
    block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
    return block, pred


# ------------------------------------------------------- progressive (G)
# flat Huffman tables for the progressive ENCODER: 255 AC symbols get an
# 8-bit code and the last a 9-bit one (BITS bytes cap at 255 and the
# all-ones code of each length is reserved, C.2), so EOBn run codes
# 0x10..0xE0 — absent from the Annex K baseline tables — are codable
# without per-scan table optimization. Compression is worse than
# libjpeg's optimized tables; the bitstream is equally valid.
_FLAT_AC = ([0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0], list(range(256)))
_FLAT_DC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))


def _pt(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift, sign kept."""
    return v >> al if v >= 0 else -((-v) >> al)


class _ProgEncoder:
    """One component-band scan emitter with EOBRUN + buffered correction
    bits, mirroring T.81 G.1.2.2-G.1.2.3 (the IJG structure)."""

    def __init__(self, bw: _BitWriter, ac_codes: dict) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # buffered correction bits

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.ac[nbits << 4]
            self.bw.put(code, length)
            if nbits:
                self.bw.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.bw.put(b, 1)
        self.pending = []

    def ac_first_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            t = _pt(int(zz[k]), al)
            if t == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                code, length = self.ac[0xF0]
                self.bw.put(code, length)
                r -= 16
            cat, bits = _magnitude(t)
            code, length = self.ac[(r << 4) | cat]
            self.bw.put(code, length)
            self.bw.put(bits, cat)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        absv = [abs(_pt(int(zz[k]), al)) for k in range(ss, se + 1)]
        eob = 0  # band index just past the last NEWLY-nonzero coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        r = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # emit required ZRLs BEFORE branching on history vs new — a
            # history coefficient met while r > 15 must see its correction
            # bit land after the ZRL covering its span (jcphuff.c order)
            while r > 15 and i < eob:
                self.flush_eobrun()
                code, length = self.ac[0xF0]
                self.bw.put(code, length)
                r -= 16
                for b in br:
                    self.bw.put(b, 1)
                br = []
            if t > 1:  # history coefficient: correction bit
                br.append(t & 1)
                continue
            # newly nonzero (t == 1)
            self.flush_eobrun()
            code, length = self.ac[(r << 4) | 1]
            self.bw.put(code, length)
            self.bw.put(1 if zz[ss + i] > 0 else 0, 1)
            for b in br:
                self.bw.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending += br
            if self.eobrun == 0x7FFF or len(self.pending) > 900:
                self.flush_eobrun()


def _encode_progressive(
    planes: list[tuple[np.ndarray, np.ndarray]], out: bytearray
) -> None:
    """Append the scan script + entropy data for progressive components
    ``[(plane, quant), ...]`` (already subsampled): DC first (Al=1),
    per-component AC 1..5 then 6..63 at Al=2, AC refine passes Al=1 and
    Al=0, DC refine — the classic successive-approximation script, so a
    round trip exercises every Annex G decode path."""
    dc_codes = _build_codes(*_FLAT_DC)
    ac_codes = _build_codes(*_FLAT_AC)
    out += _dht_segment(0x00, _FLAT_DC) + _dht_segment(0x10, _FLAT_AC)
    ncomp = len(planes)
    coefs = []
    for plane, quant in planes:
        blocks = _blocks_of(plane)
        bh, bw_ = blocks.shape[:2]
        zz = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                c = _C @ (blocks[by, bx].astype(np.float64) - 128.0) @ _C.T
                zz[by, bx] = np.round(c / quant).astype(np.int64).flat[ZIGZAG]
        coefs.append(zz)

    def sos(comps: list[int], ss: int, se: int, ah: int, al: int) -> None:
        seg = bytes([len(comps)])
        for ci in comps:
            seg += bytes([ci + 1, 0x00])  # table 0 for both classes
        seg += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg)

    # scan 1: DC first, Al=1, all components (interleaved when ncomp > 1)
    sos(list(range(ncomp)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    if ncomp == 1:
        zz = coefs[0]
        for by in range(zz.shape[0]):
            for bx in range(zz.shape[1]):
                dc = int(zz[by, bx, 0]) >> 1
                cat, bits = _magnitude(dc - preds[0])
                code, length = dc_codes[cat]
                bw.put(code, length)
                if cat:
                    bw.put(bits, cat)
                preds[0] = dc
    else:
        # all components share the MCU grid here (4:4:4 progressive)
        for by in range(coefs[0].shape[0]):
            for bx in range(coefs[0].shape[1]):
                for ci in range(ncomp):
                    dc = int(coefs[ci][by, bx, 0]) >> 1
                    cat, bits = _magnitude(dc - preds[ci])
                    code, length = dc_codes[cat]
                    bw.put(code, length)
                    if cat:
                        bw.put(bits, cat)
                    preds[ci] = dc
    bw.flush()
    out += bw.out

    # per-component AC scans: first passes at Al=2, refines at 1 then 0
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            sos([ci], ss, se, 0, 2)
            bw = _BitWriter()
            enc = _ProgEncoder(bw, ac_codes)
            zz = coefs[ci]
            for by in range(zz.shape[0]):
                for bx in range(zz.shape[1]):
                    enc.ac_first_block(zz[by, bx], ss, se, 2)
            enc.flush_eobrun()
            bw.flush()
            out += bw.out
    for al in (1, 0):
        for ci in range(ncomp):
            sos([ci], 1, 63, al + 1, al)
            bw = _BitWriter()
            enc = _ProgEncoder(bw, ac_codes)
            zz = coefs[ci]
            for by in range(zz.shape[0]):
                for bx in range(zz.shape[1]):
                    enc.ac_refine_block(zz[by, bx], 1, 63, al)
            enc.flush_eobrun()
            bw.flush()
            out += bw.out
    # final scan: DC refine to Al=0 (raw bits, no Huffman)
    sos(list(range(ncomp)), 0, 0, 1, 0)
    bw = _BitWriter()
    if ncomp == 1:
        zz = coefs[0]
        for by in range(zz.shape[0]):
            for bx in range(zz.shape[1]):
                bw.put(int(zz[by, bx, 0]) & 1, 1)
    else:
        for by in range(coefs[0].shape[0]):
            for bx in range(coefs[0].shape[1]):
                for ci in range(ncomp):
                    bw.put(int(coefs[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out


def _prog_scan_decode(
    data: bytes,
    pos: int,
    seg: bytes,
    frame: tuple,
    huff: dict,
    coefs: dict,
    restart: int,
) -> int:
    """Decode ONE progressive scan's entropy data into the coefficient
    store (T.81 G.2); returns the stream position of the next marker."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    ns = seg[0]
    scan = []
    for ci in range(ns):
        cs, tt = seg[1 + 2 * ci : 3 + 2 * ci]
        scan.append((cs, tt >> 4, tt & 0xF))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
    br = _BitReader(data, pos)
    eobrun = 0
    preds = {cid: 0 for cid, _, _ in scan}

    def maybe_restart(n_units: int) -> None:
        nonlocal br, eobrun
        if restart and n_units and n_units % restart == 0:
            m = br.align_to_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("expected RSTn marker in progressive scan")
            br = _BitReader(data, br.pos)
            eobrun = 0
            for cid in preds:
                preds[cid] = 0

    if ss == 0:  # DC scan (interleaved over the MCU grid)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n)
                for cid, td, _ta in scan:
                    comp = next(c for c in comps if c[0] == cid)
                    ch, cv = comp[1], comp[2]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coefs[cid][my * cv + by, mx * ch + bx]
                            if ah == 0:
                                cat = _read_symbol(br, huff[(0, td)])
                                preds[cid] += _extend(br.bits(cat), cat)
                                blk[0] = preds[cid] << al
                            elif br.bit():
                                blk[0] |= 1 << al
                n += 1
        return br.pos
    # AC scan: exactly one component, its own block grid (G.2.2)
    if ns != 1:
        raise ValueError("progressive AC scan with multiple components")
    cid, _td, ta = scan[0]
    comp = next(c for c in comps if c[0] == cid)
    ch, cv = comp[1], comp[2]
    # non-interleaved block grid: ceil(ceil(f * c / max) / 8) (G.2.2)
    nbx = ((fw * ch + hmax - 1) // hmax + 7) // 8
    nby = ((fh * cv + vmax - 1) // vmax + 7) // 8
    ac_tab = huff[(1, ta)]
    p1, m1 = 1 << al, -1 << al
    n = 0
    for by in range(nby):
        for bx in range(nbx):
            maybe_restart(n)
            n += 1
            blk = coefs[cid][by, bx]
            if ah == 0:  # AC first pass (G.2.2.2)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("progressive AC run past band end")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
                continue
            # AC refinement pass (G.2.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _read_symbol(br, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    sval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size != 1")
                        sval = p1 if br.bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if br.bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if sval and k <= se:
                        blk[k] = sval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if blk[k] != 0 and br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1
    return br.pos


def _prog_reconstruct(frame: tuple, coefs: dict, quant: dict) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficient store
    and return the LUMA plane cropped to frame size (G.2 final step)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    cid, ch, cv, tq = comps[0]
    zz = coefs[cid]
    nby, nbx = zz.shape[:2]
    q = quant[tq].flat[ZIGZAG].astype(np.float64)
    plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
    coef = np.zeros(64, dtype=np.float64)
    for by in range(nby):
        for bx in range(nbx):
            coef[ZIGZAG] = zz[by, bx] * q
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _C.T @ coef.reshape(8, 8) @ _C + 128.0
            )
    ph = -(-fh * cv // vmax)  # luma component dims per A.1.1
    pw = -(-fw * ch // hmax)
    return np.clip(plane[:ph, :pw] + 0.5, 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline OR progressive JPEG to its 2-D uint8 LUMA plane
    (the grayscale signal the pipeline consumes; chroma is
    entropy-decoded and discarded — fully, to keep the bitstream in
    sync). Raises NotImplementedError for arithmetic/lossless/
    hierarchical modes."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    progressive = False
    coefs: dict[int, np.ndarray] = {}
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and frame is not None:
                return _prog_reconstruct(frame, coefs, quant)
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8)
                quant[tq] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nval = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nval])
                huff[(tc, th)] = _build_decode_tree(bits, vals)
                o += 17 + nval
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("JPEG precision != 8")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax > 2 or vmax > 2:
                    raise NotImplementedError("JPEG sampling factors > 2")
                mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
                coefs = {
                    cid: np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
                    for cid, ch, cv, _tq in comps
                }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/lossless/hierarchical) is "
                "outside the from-scratch codec subset"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if progressive:
                pos = _prog_scan_decode(data, pos, seg, frame, huff, coefs, restart)
                continue
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci : 3 + 2 * ci]
                scan.append((cs, tt >> 4, tt & 0xF))
            fh, fw, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("JPEG sampling factors > 2")
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            luma_id = comps[0][0]
            # per-component plane in MCU-padded block space (luma only kept)
            c0 = comps[0]
            ly = np.zeros((mcuy * c0[2] * 8, mcux * c0[1] * 8), dtype=np.float64)
            preds = {c[0]: 0 for c in comps}
            br = _BitReader(data, pos)
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and n_mcu and n_mcu % restart == 0:
                        m = br.align_to_marker()
                        if not 0xD0 <= m <= 0xD7:
                            raise ValueError("expected RSTn marker")
                        br = _BitReader(data, br.pos)
                        preds = {c[0]: 0 for c in comps}
                    for cid, ch, cv, tq in comps:
                        sc = next((s for s in scan if s[0] == cid), None)
                        if sc is None:
                            raise NotImplementedError("multi-scan JPEG")
                        _, td, ta = sc
                        for by in range(cv):
                            for bx in range(ch):
                                block, preds[cid] = _decode_block(
                                    br, huff[(0, td)], huff[(1, ta)], quant[tq], preds[cid]
                                )
                                if cid == luma_id:
                                    y0 = (my * cv + by) * 8
                                    x0 = (mx * ch + bx) * 8
                                    ly[y0 : y0 + 8, x0 : x0 + 8] = block
                    n_mcu += 1
            return np.clip(ly[:fh, :fw] + 0.5, 0, 255).astype(np.uint8)
        else:  # APPn/COM and friends: skip
            continue
    raise ValueError("JPEG stream ended without a scan")
