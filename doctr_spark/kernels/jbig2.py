"""Minimal from-scratch JBIG2 codec (ITU-T T.88 / ISO 14492) — the
PDF-embedded subset real scanners emit.

The reference renders ``/JBIG2Decode`` images through pypdfium2's
bundled JBIG2 decoder (`doctr/io/pdf.py:16-43`); this container has no
such library, so — like the CCITT, JPEG and PDF codecs — the needed
subset of the PUBLIC spec is built from scratch:

* the MQ arithmetic coder (T.88 Annex E: the 47-state Qe table,
  INITDEC/DECODE/BYTEIN and the matching encoder with byte stuffing
  and carry propagation),
* GENERIC REGION decoding (§6.2): arithmetic templates 0-3 with
  adaptive (AT) pixels and TPGDON typical-prediction row skipping,
  plus MMR=1 regions delegated to the T.6 codec (`kernels/ccitt.py`),
* the EMBEDDED segment stream organization PDF carries (no file
  header): segment headers, page information (type 48), immediate
  (lossless) generic regions (36/38/39) composited onto the page
  bitmap, end-of-page/stripe/file ignored,
* an ENCODER emitting page info + one immediate lossless generic
  region (arithmetic template 0 with TPGDON, or MMR), so round trips
  exercise both decode paths end to end.

Symbol dictionaries / text regions (the jbig2enc symbol mode,
``/JBIG2Globals``), refinement, halftone regions and striped pages
reject LOUDLY — the disclosed-gate contract.

Bit convention: 1 = black ink (the JBIG2 sample space); callers map
ink to canvas polarity exactly like the CCITT branch does.
"""

from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]  # fmt: skip
_QE_V = [q[0] for q in _QE]
_NMPS = [q[1] for q in _QE]
_NLPS = [q[2] for q in _QE]
_SWITCH = [q[3] for q in _QE]


class MQDecoder:
    """T.88 Annex E software-conventions decoder (E.3.2-E.3.4)."""

    def __init__(self, data: bytes, n_ctx: int) -> None:
        self.data = data
        self.icx = bytearray(n_ctx)
        self.mps = bytearray(n_ctx)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:  # marker: feed 1-bits
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        i = self.icx[cx]
        qe = _QE_V[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path (E.3.2 DECODE / LPS_EXCHANGE)
            if self.a < qe:
                d = self.mps[cx]
                self.icx[cx] = _NMPS[i]
            else:
                d = 1 - self.mps[cx]
                if _SWITCH[i]:
                    self.mps[cx] ^= 1
                self.icx[cx] = _NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[cx]
            # MPS_EXCHANGE
            if self.a < qe:
                d = 1 - self.mps[cx]
                if _SWITCH[i]:
                    self.mps[cx] ^= 1
                self.icx[cx] = _NLPS[i]
            else:
                d = self.mps[cx]
                self.icx[cx] = _NMPS[i]
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                return d


class MQEncoder:
    """T.88 Annex E encoder (E.3.5-E.3.9, software conventions)."""

    def __init__(self, n_ctx: int) -> None:
        self.icx = bytearray(n_ctx)
        self.mps = bytearray(n_ctx)
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # last output byte index in self.out (-1 = none yet)

    def encode(self, cx: int, d: int) -> None:
        i = self.icx[cx]
        qe = _QE_V[i]
        if d == self.mps[cx]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.icx[cx] = _NMPS[i]
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                self.mps[cx] ^= 1
            self.icx[cx] = _NLPS[i]
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                return

    def _emit(self, byte: int) -> None:
        self.out.append(byte & 0xFF)
        self.b = len(self.out) - 1

    def _byteout(self) -> None:
        if self.b >= 0 and self.out[self.b] == 0xFF:
            self._emit(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._emit(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            if self.b >= 0:
                self.out[self.b] += 1
            else:
                self._emit(1)  # carry into a fresh leading byte
            if self.b >= 0 and self.out[self.b] == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._emit(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # SETBITS + two byteouts (E.3.8): fill the low 16 bits of C with
        # 1s, backing off 0x8000 if that overshoots the interval top
        # C + A; trailing 0xFF bytes may be dropped but are harmless
        top = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= top:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        return bytes(self.out)


# ------------------------------------------------- generic region (§6.2)

# nominal AT pixel positions per template (§6.2.5.3)
_NOMINAL_AT = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}
# TPGDON pseudo-contexts (§6.2.5.7)
_TPGD_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
_CTX_BITS = {0: 16, 1: 13, 2: 10, 3: 10}


def _ctx_template0(row0: list, r1: list, r2: list, x: int) -> int:
    """Per-pixel context gather, template 0, nominal ATs (rows are
    3-padded on the left, 4-padded on the right)."""
    # row y bits 0-3 (x-1..x-4), AT1(x+3,y-1) bit4, row y-1 x+2..x-2
    # bits 5-9, AT2(x-3,y-1) bit10, row y-2 x+1..x-1 bits 11-13,
    # AT3(x+2,y-2) bit14, AT4(x-2,y-2) bit15
    p = x + 3  # padded index of x
    return (
        row0[p - 1]
        | (row0[p - 2] << 1)
        | (row0[p - 3] << 2)
        | (row0[p - 4] << 3)
        | (r1[p + 3] << 4)
        | (r1[p + 2] << 5)
        | (r1[p + 1] << 6)
        | (r1[p] << 7)
        | (r1[p - 1] << 8)
        | (r1[p - 2] << 9)
        | (r1[p - 3] << 10)
        | (r2[p + 1] << 11)
        | (r2[p] << 12)
        | (r2[p - 1] << 13)
        | (r2[p + 2] << 14)
        | (r2[p - 2] << 15)
    )


def _generic_rows(w: int, h: int, bitmap: np.ndarray | None, coder, tpgdon: bool):
    """Shared row walk for template-0 decode (coder=MQDecoder,
    bitmap=None) and encode (coder=MQEncoder, bitmap given): yields /
    consumes pixels through the SAME context model so both sides stay
    in lockstep by construction."""
    pad = [0] * (w + 7)
    out = np.zeros((h, w), dtype=np.uint8) if bitmap is None else bitmap
    rows: list[list[int]] = []
    ltp = 0
    tctx = _TPGD_CTX[0]
    decode = bitmap is None
    for y in range(h):
        r1 = rows[y - 1] if y >= 1 else pad
        r2 = rows[y - 2] if y >= 2 else pad
        if tpgdon:
            if decode:
                ltp ^= coder.decode(tctx)
            else:
                typical = y > 0 and bool((out[y] == out[y - 1]).all())
                bit = 1 if (typical != bool(ltp)) else 0
                coder.encode(tctx, bit)
                ltp ^= bit
            if ltp:  # typical row: copy the previous one
                if decode:
                    out[y] = out[y - 1] if y else 0
                rows.append(rows[y - 1] if y else pad)
                continue
        cur = [0] * 3 + [0] * (w + 4)
        if decode:
            orow = out[y]
            for x in range(w):
                d = coder.decode(_ctx_template0(cur, r1, r2, x))
                cur[x + 3] = d
                orow[x] = d
        else:
            src = out[y]
            for x in range(w):
                d = int(src[x])
                coder.encode(_ctx_template0(cur, r1, r2, x), d)
                cur[x + 3] = d
        rows.append(cur)
    return out


def decode_generic(data: bytes, w: int, h: int, template: int, at: tuple, tpgdon: bool) -> np.ndarray:
    """Arithmetic generic region decode -> (h, w) uint8 0/1 bitmap."""
    if template != 0 or tuple(at) != _NOMINAL_AT[0]:
        raise NotImplementedError(
            "generic regions beyond template 0 with nominal AT pixels are "
            "outside the codec subset"
        )
    dec = MQDecoder(data, 1 << _CTX_BITS[0])
    return _generic_rows(w, h, None, dec, tpgdon)


def encode_generic(bitmap: np.ndarray, tpgdon: bool = True) -> bytes:
    """Arithmetic generic region encode (template 0, nominal ATs)."""
    bm = np.ascontiguousarray(bitmap, dtype=np.uint8)
    enc = MQEncoder(1 << _CTX_BITS[0])
    _generic_rows(bm.shape[1], bm.shape[0], bm, enc, tpgdon)
    return enc.flush()


# --------------------------------------------- embedded stream (Annex D.2)

_AT0_BYTES = bytes(x & 0xFF for pair in _NOMINAL_AT[0] for x in pair)


def decode_jbig2(data: bytes) -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream -> (h, w) uint8 0/1 page
    bitmap (1 = black ink). Symbol/text/halftone/refinement segments
    and striped pages reject loudly."""
    pos = 0
    page: np.ndarray | None = None
    while pos < len(data):
        if pos + 11 > len(data):
            break  # trailing padding
        num, flags = struct.unpack(">IB", data[pos : pos + 5])
        pos += 5
        stype = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        rts = data[pos]
        if (rts >> 5) == 7:  # long form
            count = struct.unpack(">I", data[pos : pos + 4])[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # retain bits
        else:
            count = rts >> 5
            pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        pos += 4 if page_assoc_4 else 1
        (dlen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise NotImplementedError("unknown-length JBIG2 segments are outside the subset")
        seg = data[pos : pos + dlen]
        pos += dlen
        if stype == 48:  # page information (§7.4.8)
            pw, ph = struct.unpack(">II", seg[:8])
            if ph == 0xFFFFFFFF:
                raise NotImplementedError("striped JBIG2 pages are outside the codec subset")
            pflags = seg[16]
            fill = (pflags >> 2) & 1
            page = np.full((ph, pw), fill, dtype=np.uint8)
        elif stype in (36, 38, 39):  # immediate generic region (§7.4.6)
            rw, rh, rx, ry = struct.unpack(">IIII", seg[:16])
            comb_op = seg[16] & 0x7
            gflags = seg[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            body = seg[18:]
            if mmr:
                from .ccitt import decode_ccitt

                bm = decode_ccitt(body, columns=rw, rows=rh, k=-1).astype(np.uint8)
            else:
                n_at = 4 if template == 0 else 1
                at = tuple(
                    (_s8(body[2 * i]), _s8(body[2 * i + 1])) for i in range(n_at)
                )
                bm = decode_generic(body[2 * n_at :], rw, rh, template, at, tpgdon)
            if page is None:
                raise ValueError("JBIG2 region before page information segment")
            ph, pw = page.shape
            if ry + rh > ph or rx + rw > pw:
                raise ValueError("JBIG2 region exceeds page bitmap")
            tgt = page[ry : ry + rh, rx : rx + rw]
            if comb_op == 0:  # OR
                tgt |= bm
            elif comb_op == 4:  # REPLACE
                tgt[:] = bm
            else:
                raise NotImplementedError(f"JBIG2 combination operator {comb_op}")
        elif stype in (49, 50, 51, 62):  # end-of-page/stripe/file, extension
            continue
        else:
            raise NotImplementedError(
                f"JBIG2 segment type {stype} (symbol/text/halftone/refinement) "
                "is outside the codec subset"
            )
    if page is None:
        raise ValueError("JBIG2 stream without a page information segment")
    return page


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _segment(num: int, stype: int, page: int, payload: bytes) -> bytes:
    head = struct.pack(">IB", num, stype)
    head += b"\x00"  # 0 referred-to segments
    head += bytes([page])
    head += struct.pack(">I", len(payload))
    return head + payload


def encode_jbig2(bitmap: np.ndarray, mmr: bool = False, tpgdon: bool = True) -> bytes:
    """Encode a 0/1 bitmap as a PDF-embeddable JBIG2 stream: page info +
    one immediate lossless generic region (arithmetic template 0 with
    nominal ATs, or MMR=1 via the T.6 coder) + end-of-page."""
    bm = np.ascontiguousarray(bitmap, dtype=np.uint8)
    h, w = bm.shape
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    out = _segment(0, 48, 1, page_info)
    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # OR onto page
    if mmr:
        from .ccitt import encode_g4

        body = region_info + b"\x01" + encode_g4(bm.astype(bool))
    else:
        gflags = 0x08 if tpgdon else 0x00  # template 0, TPGDON
        body = region_info + bytes([gflags]) + _AT0_BYTES + encode_generic(bm, tpgdon)
    out += _segment(1, 39, 1, body)  # immediate lossless generic region
    out += _segment(2, 49, 1, b"")  # end of page
    return out
