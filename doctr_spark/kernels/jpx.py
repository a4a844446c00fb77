"""From-scratch JPEG 2000 codec (ITU-T T.800 / ISO/IEC 15444-1) — the
subset PDF ``/JPXDecode`` (ISO 32000-1 §7.4.9) needs for grayscale
scanned pages, built entirely from the public spec:

- reversible 5/3 integer wavelet (Annex F lifting, symmetric extension),
- EBCOT Tier-1 code-block coding (Annex D: significance-propagation /
  magnitude-refinement / cleanup passes, run-length mode, 19 MQ
  contexts) over the SAME T.88 MQ arithmetic coder the JBIG2 codec
  already implements (T.800 Annex C is the identical Qe table),
- Tier-2 packet headers (Annex B: inclusion + zero-bitplane tag trees,
  pass counts, Lblock length coding, 0xFF bit-stuffing),
- codestream markers (SOC/SIZ/COD/QCD/SOT/SOD/EOC) and the minimal JP2
  container (signature/ftyp/jp2h/jp2c boxes).

Subset: one tile, one (grayscale) or three (RGB, no MCT) 8-bit unsigned
components without subsampling, single
layer, LRCP progression, 64x64 code blocks, whole-subband precincts,
0-3 decomposition levels; BOTH transforms — reversible 5/3 (lossless, no
quantization) and irreversible CDF 9/7 (F.4.8 float lifting, E.1 scalar-
expounded dequantization) — are implemented. Everything outside rejects
loudly with NotImplementedError.

Reference behavior: docTR receives JPX pages pre-rasterized by pypdfium2
(`doctr/io/pdf.py:16-43`); this codec removes that dependency for the
scanned-page construct the pipeline consumes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jbig2 import MQDecoder, MQEncoder

_CBLK = 64  # code-block side (xcb = ycb = 6)
_GUARD = 2  # guard bits signalled in Sqcd

# -- Annex D context assignment -----------------------------------------
# 19 MQ contexts: 0-8 zero coding, 9-13 sign coding, 14-16 magnitude
# refinement, 17 run-length, 18 uniform.
_N_CTX = 19
_RL_CTX = 17
_UNI_CTX = 18


def _zc_tables() -> list[list[int]]:
    """Table D.1 zero-coding contexts, flattened to idx = h*15 + v*5 + d
    (h, v in 0..2, d in 0..4). Orientation 0 = LL/LH, 1 = HL (h/v
    swapped at lookup), 2 = HH."""
    t0 = [0] * 45
    t2 = [0] * 45
    for h in range(3):
        for v in range(3):
            for d in range(5):
                i = h * 15 + v * 5 + d
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                else:
                    if v == 2:
                        c = 4
                    elif v == 1:
                        c = 3
                    else:
                        c = 2 if d >= 2 else (1 if d == 1 else 0)
                t0[i] = c
                hv = h + v
                if d >= 3:
                    c2 = 8
                elif d == 2:
                    c2 = 7 if hv >= 1 else 6
                elif d == 1:
                    c2 = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c2 = 2 if hv >= 2 else (1 if hv == 1 else 0)
                t2[i] = c2
    return [t0, t2]


_ZC0, _ZC2 = _zc_tables()

# Table D.2 sign coding: index (H+1)*3 + (V+1) -> (context, xor bit)
_SC = [
    (13, 1), (12, 1), (11, 1),  # H=-1: V=-1,0,1
    (10, 1), (9, 0), (10, 0),   # H= 0
    (11, 0), (12, 0), (13, 0),  # H=+1
]


def _init_ctx(coder) -> None:
    """D.2 initial index states: all 0 except ZC ctx 0 -> 4, RL -> 3,
    UNIFORM -> 46."""
    coder.icx[0] = 4
    coder.icx[_RL_CTX] = 3
    coder.icx[_UNI_CTX] = 46


# -- Annex F: irreversible 9/7 lifting (F.4.8) ----------------------------
# CDF 9/7 lifting constants and the scaling factor K
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _fwd_1d_97(x: np.ndarray, axis: int) -> tuple[np.ndarray, np.ndarray]:
    x = np.moveaxis(x, axis, -1).astype(np.float64)
    n = x.shape[-1]
    if n == 1:
        return np.moveaxis(x.copy(), -1, axis), np.moveaxis(x[..., :0].copy(), -1, axis)
    e = x[..., 0::2].copy()
    o = x[..., 1::2].copy()
    ne, no = e.shape[-1], o.shape[-1]
    i = np.arange(no)
    j = np.arange(ne)
    el, er = i, np.minimum(i + 1, ne - 1)
    ol, orr = np.maximum(j - 1, 0), np.minimum(j, no - 1)
    o += _A97 * (e[..., el] + e[..., er])
    e += _B97 * (o[..., ol] + o[..., orr])
    o += _G97 * (e[..., el] + e[..., er])
    e += _D97 * (o[..., ol] + o[..., orr])
    lo = e * (1.0 / _K97)
    hi = o * _K97
    return np.moveaxis(lo, -1, axis), np.moveaxis(hi, -1, axis)


def _inv_1d_97(lo: np.ndarray, hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.moveaxis(lo, axis, -1).astype(np.float64)
    hi = np.moveaxis(hi, axis, -1).astype(np.float64)
    ne, no = lo.shape[-1], hi.shape[-1]
    if no == 0:
        return np.moveaxis(lo * _K97, -1, axis)
    e = lo * _K97
    o = hi * (1.0 / _K97)
    i = np.arange(no)
    j = np.arange(ne)
    el, er = i, np.minimum(i + 1, ne - 1)
    ol, orr = np.maximum(j - 1, 0), np.minimum(j, no - 1)
    e -= _D97 * (o[..., ol] + o[..., orr])
    o -= _G97 * (e[..., el] + e[..., er])
    e -= _B97 * (o[..., ol] + o[..., orr])
    o -= _A97 * (e[..., el] + e[..., er])
    out = np.empty(lo.shape[:-1] + (ne + no,), dtype=np.float64)
    out[..., 0::2] = e
    out[..., 1::2] = o
    return np.moveaxis(out, -1, axis)


def _fwd_dwt_97(a: np.ndarray, levels: int):
    cur = a.astype(np.float64)
    highs = []
    for _ in range(levels):
        lo, hi = _fwd_1d_97(cur, axis=1)
        ll, lh = _fwd_1d_97(lo, axis=0)
        hl, hh = _fwd_1d_97(hi, axis=0)
        highs.append((hl, lh, hh))
        cur = ll
    return cur, highs


def _inv_dwt_97(ll: np.ndarray, highs) -> np.ndarray:
    cur = ll
    for hl, lh, hh in reversed(highs):
        lo = _inv_1d_97(cur, lh, axis=0)
        hi = _inv_1d_97(hl, hh, axis=0)
        cur = _inv_1d_97(lo, hi, axis=1)
    return cur


# -- Annex F: reversible 5/3 lifting -------------------------------------


def _fwd_1d(x: np.ndarray, axis: int) -> tuple[np.ndarray, np.ndarray]:
    x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n == 1:
        return np.moveaxis(x.copy(), -1, axis), np.moveaxis(x[..., :0].copy(), -1, axis)
    e = x[..., 0::2].astype(np.int64)
    o = x[..., 1::2].astype(np.int64)
    ne, no = e.shape[-1], o.shape[-1]
    i = np.arange(no)
    hi = o - ((e[..., i] + e[..., np.minimum(i + 1, ne - 1)]) >> 1)
    j = np.arange(ne)
    lo = e + ((hi[..., np.maximum(j - 1, 0)] + hi[..., np.minimum(j, no - 1)] + 2) >> 2)
    return np.moveaxis(lo, -1, axis), np.moveaxis(hi, -1, axis)


def _inv_1d(lo: np.ndarray, hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.moveaxis(lo, axis, -1).astype(np.int64)
    hi = np.moveaxis(hi, axis, -1).astype(np.int64)
    ne, no = lo.shape[-1], hi.shape[-1]
    if no == 0:
        return np.moveaxis(lo, -1, axis)
    j = np.arange(ne)
    e = lo - ((hi[..., np.maximum(j - 1, 0)] + hi[..., np.minimum(j, no - 1)] + 2) >> 2)
    i = np.arange(no)
    o = hi + ((e[..., i] + e[..., np.minimum(i + 1, ne - 1)]) >> 1)
    out = np.empty(lo.shape[:-1] + (ne + no,), dtype=np.int64)
    out[..., 0::2] = e
    out[..., 1::2] = o
    return np.moveaxis(out, -1, axis)


def _fwd_dwt(a: np.ndarray, levels: int):
    """-> (LL_levels, [per level: (HL, LH, HH)] from level 1 up)."""
    cur = a.astype(np.int64)
    highs = []
    for _ in range(levels):
        lo, hi = _fwd_1d(cur, axis=1)  # horizontal
        ll, lh = _fwd_1d(lo, axis=0)  # vertical
        hl, hh = _fwd_1d(hi, axis=0)
        highs.append((hl, lh, hh))
        cur = ll
    return cur, highs


def _inv_dwt(ll: np.ndarray, highs) -> np.ndarray:
    cur = ll
    for hl, lh, hh in reversed(highs):
        lo = _inv_1d(cur, lh, axis=0)
        hi = _inv_1d(hl, hh, axis=0)
        cur = _inv_1d(lo, hi, axis=1)
    return cur


# -- Annex D: Tier-1 code-block coding ------------------------------------
# Per-sample state lives in flat Python lists padded by one on every side
# (stride w+2) so neighbor reads never bounds-check — the same locality
# trick the JBIG2 generic-region rows use.


def _enc_block(m: list, chi: list, w: int, h: int, nb: int, orient: int) -> bytes:
    mq = MQEncoder(_N_CTX)
    _init_ctx(mq)
    _run_passes(mq, None, m, chi, w, h, nb, orient)
    return mq.flush()


def _dec_block(data: bytes, w: int, h: int, nb: int, orient: int) -> tuple[list, list]:
    mq = MQDecoder(data, _N_CTX)
    _init_ctx(mq)
    m = [0] * (w * h)
    chi = [0] * (w * h)
    _run_passes(None, mq, m, chi, w, h, nb, orient)
    return m, chi


def _run_passes(enc, dec, m, chi, w, h, nb, orient):
    """Drive all 3*nb-2 coding passes. In encode mode (`enc` set) the
    magnitude/sign arrays are read; in decode mode (`dec` set) they are
    built. One body for both keeps the two directions structurally
    identical — any asymmetry would fail the round-trip property test."""
    stride = w + 2
    size = stride * (h + 2)
    sig = bytearray(size)  # significance, padded
    sv = [0] * size  # 0 / +1 / -1 (significant sign value), padded
    vis = bytearray(w * h)  # coded in the current plane's SP pass
    ref = bytearray(w * h)  # has been refined at least once
    if orient == 1:
        zc0, swap = _ZC0, True
    elif orient == 2:
        zc0, swap = _ZC2, False
    else:
        zc0, swap = _ZC0, False
    sc = _SC
    encode = enc.encode if enc else None
    decode = dec.decode if dec else None

    def neighborhood(pi):
        hsum = (1 if sig[pi - 1] else 0) + (1 if sig[pi + 1] else 0)
        vsum = (1 if sig[pi - stride] else 0) + (1 if sig[pi + stride] else 0)
        dsum = (
            (1 if sig[pi - stride - 1] else 0)
            + (1 if sig[pi - stride + 1] else 0)
            + (1 if sig[pi + stride - 1] else 0)
            + (1 if sig[pi + stride + 1] else 0)
        )
        return hsum, vsum, dsum

    def code_sign(pi, j):
        hc = sv[pi - 1] + sv[pi + 1]
        vc = sv[pi - stride] + sv[pi + stride]
        hc = 1 if hc > 0 else (-1 if hc < 0 else 0)
        vc = 1 if vc > 0 else (-1 if vc < 0 else 0)
        ctx, xr = sc[(hc + 1) * 3 + (vc + 1)]
        if encode:
            encode(ctx, chi[j] ^ xr)
        else:
            chi[j] = decode(ctx) ^ xr
        sig[pi] = 1
        sv[pi] = -1 if chi[j] else 1

    for p in range(nb - 1, -1, -1):
        bit = 1 << p
        first = p == nb - 1
        if not first:
            # -- significance propagation pass (D.3.1)
            for y0 in range(0, h, 4):
                yl = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, yl):
                        pi = (y + 1) * stride + x + 1
                        if sig[pi]:
                            continue
                        hsum, vsum, dsum = neighborhood(pi)
                        if hsum + vsum + dsum == 0:
                            continue
                        ctx = (
                            zc0[vsum * 15 + hsum * 5 + dsum]
                            if swap
                            else zc0[hsum * 15 + vsum * 5 + dsum]
                        )
                        j = y * w + x
                        if encode:
                            b = 1 if m[j] & bit else 0
                            encode(ctx, b)
                        else:
                            b = decode(ctx)
                        vis[j] = 1
                        if b:
                            if not encode:
                                m[j] |= bit
                            code_sign(pi, j)
            # -- magnitude refinement pass (D.3.3)
            for y0 in range(0, h, 4):
                yl = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, yl):
                        pi = (y + 1) * stride + x + 1
                        j = y * w + x
                        if not sig[pi] or vis[j]:
                            continue
                        if ref[j]:
                            ctx = 16
                        else:
                            hsum, vsum, dsum = neighborhood(pi)
                            ctx = 15 if hsum + vsum + dsum else 14
                        if encode:
                            encode(ctx, 1 if m[j] & bit else 0)
                        else:
                            if decode(ctx):
                                m[j] |= bit
                        ref[j] = 1
        # -- cleanup pass (D.3.4) with run-length mode
        for y0 in range(0, h, 4):
            yl = min(y0 + 4, h)
            full = yl - y0 == 4
            for x in range(w):
                ystart = y0
                if full:
                    run = True
                    for y in range(y0, yl):
                        pi = (y + 1) * stride + x + 1
                        j = y * w + x
                        if sig[pi] or vis[j]:
                            run = False
                            break
                        hsum, vsum, dsum = neighborhood(pi)
                        if hsum + vsum + dsum:
                            run = False
                            break
                    if run:
                        if encode:
                            r = -1
                            for k in range(4):
                                if m[(y0 + k) * w + x] & bit:
                                    r = k
                                    break
                            if r < 0:
                                encode(_RL_CTX, 0)
                                continue
                            encode(_RL_CTX, 1)
                            encode(_UNI_CTX, r >> 1)
                            encode(_UNI_CTX, r & 1)
                        else:
                            if not decode(_RL_CTX):
                                continue
                            r = (decode(_UNI_CTX) << 1) | decode(_UNI_CTX)
                        y = y0 + r
                        pi = (y + 1) * stride + x + 1
                        j = y * w + x
                        if not encode:
                            m[j] |= bit
                        code_sign(pi, j)
                        ystart = y + 1
                for y in range(ystart, yl):
                    pi = (y + 1) * stride + x + 1
                    j = y * w + x
                    if sig[pi] or vis[j]:
                        continue
                    hsum, vsum, dsum = neighborhood(pi)
                    ctx = (
                        zc0[vsum * 15 + hsum * 5 + dsum]
                        if swap
                        else zc0[hsum * 15 + vsum * 5 + dsum]
                    )
                    if encode:
                        b = 1 if m[j] & bit else 0
                        encode(ctx, b)
                    else:
                        b = decode(ctx)
                    if b:
                        if not encode:
                            m[j] |= bit
                        code_sign(pi, j)
        vis = bytearray(w * h)


# -- Annex B: tag trees and packet-header bit I/O --------------------------


class _BitIO:
    """Packet-header bit stream with 0xFF stuffing (B.10.1): after a
    byte equal to 0xFF only 7 bits follow in the next byte."""

    def __init__(self, data: bytes | None = None) -> None:
        self.out = bytearray()
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0  # writer: bits pending; reader: bits available
        self.last = 0

    # writer
    def write(self, b: int) -> None:
        lim = 7 if self.last == 0xFF else 8
        self.buf = (self.buf << 1) | b
        self.nbits += 1
        if self.nbits == lim:
            self.out.append(self.buf)
            self.last = self.buf
            self.buf = 0
            self.nbits = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write((v >> i) & 1)

    def flush_w(self) -> bytes:
        if self.nbits:
            lim = 7 if self.last == 0xFF else 8
            self.out.append(self.buf << (lim - self.nbits))
            self.last = self.out[-1]
        if self.last == 0xFF:  # a packet header cannot end in 0xFF
            self.out.append(0)
        return bytes(self.out)

    # reader
    def read(self) -> int:
        if self.nbits == 0:
            lim = 7 if self.last == 0xFF else 8
            self.last = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf = self.last
            self.nbits = lim
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v

    def align_r(self) -> int:
        """End of packet header: discard pending bits; a terminal 0xFF
        is followed by a stuffed byte the writer emitted."""
        self.nbits = 0
        if self.last == 0xFF:
            self.pos += 1
        self.last = 0
        return self.pos


class _TagTree:
    """B.10.2 tag tree: each node is the minimum of its children; bits
    refine node values incrementally across calls (state persists)."""

    def __init__(self, w: int, h: int) -> None:
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.cur = [[0] * (w_ * h_) for w_, h_ in self.dims]
        self.done = [[False] * (w_ * h_) for w_, h_ in self.dims]
        self.value = [[0] * (w_ * h_) for w_, h_ in self.dims]

    def set(self, x: int, y: int, v: int) -> None:
        """Encoder: set a leaf value (then propagate mins upward lazily
        via finalize)."""
        self.value[0][y * self.dims[0][0] + x] = v

    def finalize(self) -> None:
        for lv in range(1, len(self.dims)):
            w, h = self.dims[lv]
            cw, ch = self.dims[lv - 1]
            for y in range(h):
                for x in range(w):
                    vals = []
                    for dy in (0, 1):
                        for dx in (0, 1):
                            cx, cy = 2 * x + dx, 2 * y + dy
                            if cx < cw and cy < ch:
                                vals.append(self.value[lv - 1][cy * cw + cx])
                    self.value[lv][y * w + x] = min(vals)

    def _path(self, x: int, y: int):
        out = []
        for lv in range(len(self.dims)):
            w = self.dims[lv][0]
            out.append((lv, y * w + x))
            x >>= 1
            y >>= 1
        return list(reversed(out))  # root first

    def encode(self, x: int, y: int, threshold: int, bio: _BitIO) -> None:
        low = 0
        for lv, i in self._path(x, y):
            if self.cur[lv][i] < low:
                self.cur[lv][i] = low
            v = self.value[lv][i]
            while not self.done[lv][i] and self.cur[lv][i] < threshold:
                if v > self.cur[lv][i]:
                    bio.write(0)
                    self.cur[lv][i] += 1
                else:
                    bio.write(1)
                    self.done[lv][i] = True
            low = v if self.done[lv][i] else self.cur[lv][i]

    def decode(self, x: int, y: int, threshold: int, bio: _BitIO) -> bool:
        """Refine toward `threshold`; True when the leaf value is fully
        determined below it (self.value holds it)."""
        low = 0
        for lv, i in self._path(x, y):
            if self.cur[lv][i] < low:
                self.cur[lv][i] = low
            while not self.done[lv][i] and self.cur[lv][i] < threshold:
                if bio.read():
                    self.done[lv][i] = True
                else:
                    self.cur[lv][i] += 1
            if self.done[lv][i]:
                self.value[lv][i] = self.cur[lv][i]
                low = self.cur[lv][i]
            else:
                low = self.cur[lv][i]
                return False
        return True


def _write_npasses(bio: _BitIO, n: int) -> None:
    """B.10.6 number-of-passes code."""
    if n == 1:
        bio.write(0)
    elif n == 2:
        bio.write_bits(0b10, 2)
    elif n <= 5:
        bio.write_bits(0b11, 2)
        bio.write_bits(n - 3, 2)
    elif n <= 36:
        bio.write_bits(0b1111, 4)
        bio.write_bits(n - 6, 5)
    elif n <= 164:
        bio.write_bits(0b111111111, 9)
        bio.write_bits(n - 37, 7)
    else:
        raise ValueError("too many coding passes")


def _read_npasses(bio: _BitIO) -> int:
    if not bio.read():
        return 1
    if not bio.read():
        return 2
    v = bio.read_bits(2)
    if v != 3:
        return 3 + v
    v = bio.read_bits(5)
    if v != 31:
        return 6 + v
    return 37 + bio.read_bits(7)


# -- band / code-block geometry -------------------------------------------


def _grid(bw: int, bh: int) -> tuple[int, int]:
    return (bw + _CBLK - 1) // _CBLK, (bh + _CBLK - 1) // _CBLK


def _bands_for(w: int, h: int, levels: int):
    """Subband layout: list of resolutions; each is a list of
    (name, orient, gain, bw, bh, level). Dims follow the even/odd lifting
    split: low gets ceil, high gets floor, per axis per level."""
    dims = [(w, h)]
    for _ in range(levels):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    res = []
    llw, llh = dims[levels]
    res.append([("LL", 0, 0, llw, llh, levels)])
    for r in range(1, levels + 1):
        lev = levels - r + 1  # this resolution adds level `lev` bands
        pw, ph = dims[lev - 1]
        lw, lh = dims[lev]
        hw, hh = pw - lw, ph - lh
        res.append(
            [
                ("HL", 1, 1, hw, lh, lev),
                ("LH", 0, 1, lw, hh, lev),
                ("HH", 2, 2, hw, hh, lev),
            ]
        )
    return res


# -- codestream -----------------------------------------------------------


def encode_j2k(img: np.ndarray, levels: int = 2, irreversible: bool = False) -> bytes:
    """8-bit image -> JPEG 2000 codestream (raw, no JP2): grayscale
    ``(h, w)`` or RGB ``(h, w, 3)`` (three full-resolution components, no
    MCT). Default is the lossless 5/3 path; ``irreversible=True`` codes
    the CDF 9/7 float wavelet with scalar-expounded quantization (Sqcd
    style 2) — the lossy layout real scanners emit. Step sizes are chosen
    per band so the quantizer keeps ~12 bits (near-transparent)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_j2k takes a 2-D or (h, w, 3) uint8 array")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("color input must have exactly 3 components")
    if not 0 <= levels <= 3:
        raise ValueError("levels must be 0..3 (coefficient growth bound)")
    h, w = img.shape[:2]
    planes = [img] if img.ndim == 2 else [img[:, :, c] for c in range(3)]
    ncomp = len(planes)
    guard = 3 if irreversible else _GUARD
    floats: dict[tuple[int, str, int], np.ndarray] = {}
    arrays: dict[tuple[int, str, int], np.ndarray] = {}
    for ci, plane in enumerate(planes):
        if irreversible:
            llf, highsf = _fwd_dwt_97(plane.astype(np.float64) - 128.0, levels)
            floats[(ci, "LL", levels)] = llf
            for i, (hl, lh, hh) in enumerate(highsf):
                floats[(ci, "HL", i + 1)] = hl
                floats[(ci, "LH", i + 1)] = lh
                floats[(ci, "HH", i + 1)] = hh
        else:
            ll, highs = _fwd_dwt(plane.astype(np.int64) - 128, levels)
            arrays[(ci, "LL", levels)] = ll
            for i, (hl, lh, hh) in enumerate(highs):
                arrays[(ci, "HL", i + 1)] = hl
                arrays[(ci, "LH", i + 1)] = lh
                arrays[(ci, "HH", i + 1)] = hh

    res = _bands_for(w, h, levels)
    # per-band epsilon from the actual coefficient range (Mb = eps+G-1),
    # shared across components (one QCD is the default for all of them);
    # irreversible: choose a power-of-two step keeping quantized indices
    # under 12 bits and signal it as (eps, mu=0) with eps = Rb - E
    eps: dict[tuple[str, int], int] = {}
    mu: dict[tuple[str, int], int] = {}
    for bands in res:
        for name, _o, gain, bw, bh, lev in bands:
            if irreversible:
                mx = max(
                    (float(np.abs(floats[(ci, name, lev)]).max()) if floats[(ci, name, lev)].size else 0.0)
                    for ci in range(ncomp)
                )
                e2 = int(np.ceil(np.log2(max(mx, 1e-9) / 4095.0)))
                rb = 8 + gain
                # a near-empty band would want eps > 31 (a step far finer
                # than needed); clamp to the 5-bit field — the larger step
                # still quantizes its tiny coefficients exactly as small
                ee = min(rb - e2, 31)
                e2 = rb - ee
                if ee < 1:
                    raise AssertionError("quantizer exponent out of the 5-bit field")
                eps[(name, lev)] = ee
                mu[(name, lev)] = 0
                delta = 2.0 ** e2
                for ci in range(ncomp):
                    a = floats[(ci, name, lev)]
                    arrays[(ci, name, lev)] = np.floor(np.abs(a) / delta).astype(
                        np.int64
                    ) * np.where(a < 0, -1, 1)
                continue
            nb = max(
                (int(np.abs(arrays[(ci, name, lev)]).max()) if arrays[(ci, name, lev)].size else 0)
                for ci in range(ncomp)
            ).bit_length()
            eps[(name, lev)] = max(nb - _GUARD + 1, 1)
            mu[(name, lev)] = 0

    body = bytearray()
    for bands, comp in ((bands, c) for bands in res for c in range(ncomp)):
        # LRCP with one layer: resolution-major, then component (B.12.1.1)
        bio = _BitIO()
        chunks: list[bytes] = []
        bio.write(1)  # packet non-empty
        for name, orient, _gain, bw, bh, lev in bands:
            if bw == 0 or bh == 0:
                continue
            gx, gy = _grid(bw, bh)
            incl = _TagTree(gx, gy)
            zbp = _TagTree(gx, gy)
            a = arrays[(comp, name, lev)]
            mb = eps[(name, lev)] + guard - 1
            blocks = []
            for cy in range(gy):
                for cx in range(gx):
                    sub = a[
                        cy * _CBLK : min((cy + 1) * _CBLK, bh),
                        cx * _CBLK : min((cx + 1) * _CBLK, bw),
                    ]
                    ch_, cw_ = sub.shape
                    mag = np.abs(sub).astype(np.int64)
                    nb = int(mag.max()).bit_length() if sub.size else 0
                    if nb > mb:
                        raise AssertionError("bitplane overflow vs signalled Mb")
                    if nb == 0:
                        incl.set(cx, cy, 1)  # never included
                        zbp.set(cx, cy, 0)
                        blocks.append((cx, cy, None))
                        continue
                    incl.set(cx, cy, 0)
                    zbp.set(cx, cy, mb - nb)
                    m = [int(v) for v in mag.ravel()]
                    chi = [1 if v < 0 else 0 for v in sub.ravel()]
                    data = _enc_block(m, chi, cw_, ch_, nb, orient)
                    blocks.append((cx, cy, (data, 3 * nb - 2, mb - nb)))
            incl.finalize()
            zbp.finalize()
            for cx, cy, blk in blocks:
                incl.encode(cx, cy, 1, bio)
                if blk is None:
                    continue
                data, npasses, zb = blk
                t = 1
                while True:  # zero-bitplane tag tree: raise threshold
                    zbp.encode(cx, cy, t, bio)
                    if zbp.done[0][cy * zbp.dims[0][0] + cx]:
                        break
                    t += 1
                _write_npasses(bio, npasses)
                lblock = 3
                nbits = len(data).bit_length()
                need = nbits - (npasses.bit_length() - 1)
                while lblock < need:
                    bio.write(1)
                    lblock += 1
                bio.write(0)
                bio.write_bits(len(data), lblock + npasses.bit_length() - 1)
                chunks.append(data)
        body += bio.flush_w()
        for c in chunks:
            body += c

    # markers
    siz = struct.pack(
        ">HHIIIIIIIIH", 38 + 3 * ncomp, 0, w, h, 0, 0, w, h, 0, 0, ncomp
    ) + bytes([7, 1, 1] * ncomp)
    spcod = bytes(
        [levels, _CBLK.bit_length() - 3, _CBLK.bit_length() - 3, 0, 0 if irreversible else 1]
    )
    cod = struct.pack(">HBBHB", 7 + len(spcod), 0, 0, 1, 0) + spcod
    band_keys = [("LL", levels)]
    for r in range(1, levels + 1):
        lev = levels - r + 1
        band_keys += [("HL", lev), ("LH", lev), ("HH", lev)]
    if irreversible:
        # Sqcd style 2 (scalar expounded): one 16-bit (eps<<11 | mu) per band
        qcd = struct.pack(">HB", 3 + 2 * len(band_keys), (guard << 5) | 2) + b"".join(
            struct.pack(">H", (eps[k] << 11) | mu[k]) for k in band_keys
        )
    else:
        qcd = struct.pack(">HB", 3 + len(band_keys), guard << 5) + bytes(
            eps[k] << 3 for k in band_keys
        )
    tile = struct.pack(">HHIBB", 10, 0, 12 + len(body) + 2, 0, 1)
    out = (
        b"\xff\x4f"
        + b"\xff\x51" + siz
        + b"\xff\x52" + cod
        + b"\xff\x5c" + qcd
        + b"\xff\x90" + tile
        + b"\xff\x93" + bytes(body)
        + b"\xff\xd9"
    )
    return out


def encode_jp2(img: np.ndarray, levels: int = 2, irreversible: bool = False) -> bytes:
    """Wrap the codestream in the minimal JP2 container (I.5): signature,
    ftyp, jp2h(ihdr+colr greyscale), jp2c."""
    cs = encode_j2k(img, levels, irreversible)
    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else img.shape[2]

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", h, w, nc, 7, 7, 0, 0))
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 17 if nc == 1 else 16))
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", cs)


def _unwrap_jp2(data: bytes) -> bytes:
    """JP2 container -> raw codestream (walk top-level boxes to jp2c)."""
    pos = 0
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        if ln == 1:  # XLbox
            (ln,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            head = 16
        else:
            head = 8
        if ln == 0:  # box runs to EOF
            ln = len(data) - pos
        if typ == b"jp2c":
            return data[pos + head : pos + ln]
        pos += ln
    raise ValueError("JP2 container without a jp2c codestream box")


def decode_jpx(data: bytes) -> np.ndarray:
    """JPEG 2000 (raw codestream or JP2 container) -> 2-D uint8 array.
    Constructs outside the lossless grayscale subset reject loudly."""
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        data = _unwrap_jp2(data)
    if data[:2] != b"\xff\x4f":
        raise ValueError("not a JPEG 2000 codestream")
    pos = 2
    w = h = None
    levels = None
    irreversible = False
    ncomp = 1
    sub_eps: list[int] = []
    guard = _GUARD
    body = None
    while pos + 4 <= len(data):
        marker = data[pos : pos + 2]
        if marker == b"\xff\xd9":
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == b"\xff\x51":  # SIZ
            rsiz, xs, ys, xo, yo, xt, yt, xto, yto, ncomp = struct.unpack(
                ">HIIIIIIIIH", seg[:36]
            )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "multi-component JPX outside 1 (gray) or 3 (RGB) components "
                    "is outside the codec subset"
                )
            if (xo, yo, xto, yto) != (0, 0, 0, 0) or (xt, yt) != (xs, ys):
                raise NotImplementedError("JPX tiling/offsets are outside the codec subset")
            for ci in range(ncomp):
                ssiz, xr, yr = seg[36 + 3 * ci], seg[37 + 3 * ci], seg[38 + 3 * ci]
                if ssiz != 7 or (xr, yr) != (1, 1):
                    raise NotImplementedError(
                        "JPX components outside 8-bit unsigned 1:1 are outside the codec subset"
                    )
            w, h = xs, ys
        elif marker == b"\xff\x52":  # COD
            scod, prog, layers, mct = seg[0], seg[1], struct.unpack(">H", seg[2:4])[0], seg[4]
            if scod != 0:
                raise NotImplementedError("JPX precincts/SOP/EPH are outside the codec subset")
            if layers != 1:
                raise NotImplementedError("multi-layer JPX is outside the codec subset")
            if prog != 0 or mct != 0:
                raise NotImplementedError("JPX progression/MCT is outside the codec subset")
            levels = seg[5]
            if seg[6] != _CBLK.bit_length() - 3 or seg[7] != _CBLK.bit_length() - 3:
                raise NotImplementedError("JPX code-block sizes other than 64x64")
            if seg[8] != 0:
                raise NotImplementedError("JPX code-block style flags are outside the subset")
            if seg[9] not in (0, 1):
                raise NotImplementedError(f"JPX transform {seg[9]} is outside the codec subset")
            irreversible = seg[9] == 0
        elif marker == b"\xff\x5c":  # QCD
            sqcd = seg[0]
            guard = sqcd >> 5
            style = sqcd & 0x1F
            if style == 0:  # reversible: per-band exponent only
                sub_eps = [(b >> 3, 0) for b in seg[1:]]
            elif style == 2:  # scalar expounded: 16-bit (eps<<11 | mu)
                vals = struct.unpack(">%dH" % ((len(seg) - 1) // 2), seg[1:])
                sub_eps = [(v >> 11, v & 0x7FF) for v in vals]
            else:
                raise NotImplementedError(
                    "JPX scalar-derived quantization is outside the codec subset"
                )
        elif marker == b"\xff\x90":  # SOT
            if struct.unpack(">H", seg[:2])[0] != 0:
                raise NotImplementedError("multi-tile JPX is outside the codec subset")
            if data[pos + 2 + ln : pos + 4 + ln] != b"\xff\x93":
                raise ValueError("SOT not followed by SOD")
            (psot,) = struct.unpack(">I", seg[2:6])
            end = pos + psot if psot else len(data) - 2
            body = data[pos + 4 + ln : end]
            pos = end
            continue
        pos += 2 + ln
    if w is None or levels is None or body is None:
        raise ValueError("incomplete JPEG 2000 codestream")
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]

    res = _bands_for(w, h, levels)
    eps_iter = iter(sub_eps)
    arrays: dict[tuple[int, str, int], np.ndarray] = {}
    band_eps: dict[tuple[str, int], tuple[int, int]] = {}
    band_gain: dict[tuple[str, int], int] = {}
    for bands in res:
        for name, _o, g_, _bw, _bh, lev in bands:
            band_eps[(name, lev)] = next(eps_iter)
            band_gain[(name, lev)] = g_

    pos = 0
    for bands, comp in ((bands, c) for bands in res for c in range(ncomp)):
        # LRCP, one layer: resolution-major, then component (B.12.1.1)
        bio = _BitIO(body[pos:])
        if not bio.read():  # empty packet
            pos += bio.align_r()
            continue
        pend: list[tuple] = []
        for name, orient, _gain, bw, bh, lev in bands:
            arr = np.zeros((bh, bw), dtype=np.float64 if irreversible else np.int64)
            arrays[(comp, name, lev)] = arr
            if bw == 0 or bh == 0:
                continue
            gx, gy = _grid(bw, bh)
            incl = _TagTree(gx, gy)
            zbp = _TagTree(gx, gy)
            mb = band_eps[(name, lev)][0] + guard - 1
            for cy in range(gy):
                for cx in range(gx):
                    if not incl.decode(cx, cy, 1, bio) or incl.value[0][
                        cy * gx + cx
                    ] != 0:
                        continue
                    t = 1
                    while not zbp.decode(cx, cy, t, bio):
                        t += 1
                        if t > mb + 2:  # truncated header: the reader
                            # yields 0-bits past EOF, which would spin
                            raise ValueError(
                                "zero-bitplane count exceeds the signalled Mb "
                                "(corrupt or truncated packet header)"
                            )
                    zb = zbp.value[0][cy * gx + cx]
                    npasses = _read_npasses(bio)
                    lblock = 3
                    while bio.read():
                        lblock += 1
                    ln_b = bio.read_bits(lblock + npasses.bit_length() - 1)
                    nb = mb - zb
                    if 3 * nb - 2 != npasses:
                        raise NotImplementedError(
                            "JPX truncated layers are outside the codec subset"
                        )
                    pend.append((comp, name, lev, orient, cx, cy, bw, bh, nb, ln_b))
        hdr_end = bio.align_r()
        pos += hdr_end
        for comp_, name, lev, orient, cx, cy, bw, bh, nb, ln_b in pend:
            data_blk = body[pos : pos + ln_b]
            pos += ln_b
            x0, y0 = cx * _CBLK, cy * _CBLK
            cw_ = min(_CBLK, bw - x0)
            ch_ = min(_CBLK, bh - y0)
            m, chi = _dec_block(data_blk, cw_, ch_, nb, orient)
            vals = np.array(m, dtype=np.float64).reshape(ch_, cw_)
            signs = np.array(chi, dtype=np.int64).reshape(ch_, cw_)
            if irreversible:
                # dequantize (E.1.1): c = sign * (q + 0.5) * delta, q > 0
                ee, mu_ = band_eps[(name, lev)]
                delta = 2.0 ** (8 + band_gain[(name, lev)] - ee) * (1 + mu_ / 2048.0)
                vals = np.where(vals > 0, (vals + 0.5) * delta, 0.0)
            arrays[(comp_, name, lev)][y0 : y0 + ch_, x0 : x0 + cw_] = np.where(
                signs == 1, -vals, vals
            )

    comps = []
    for ci in range(ncomp):
        ll = arrays[(ci, "LL", levels)]
        highs = []
        for lev in range(1, levels + 1):
            highs.append(
                (arrays[(ci, "HL", lev)], arrays[(ci, "LH", lev)], arrays[(ci, "HH", lev)])
            )
        if irreversible:
            out = np.rint(_inv_dwt_97(ll, highs) + 128.0)
        else:
            out = _inv_dwt(ll, highs) + 128
        comps.append(np.clip(out, 0, 255).astype(np.int64))
    if ncomp == 1:
        return comps[0].astype(np.uint8)
    # RGB -> the grayscale signal the pipeline consumes: integer BT.601
    # luma (exact identity when R == G == B, since the weights sum to 1000)
    y = (299 * comps[0] + 587 * comps[1] + 114 * comps[2] + 500) // 1000
    return np.clip(y, 0, 255).astype(np.uint8)
