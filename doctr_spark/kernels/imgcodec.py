"""Compact byte codecs for page images flowing between Spark stages.

Pages travel between UDF stages as compressed bytes in a BinaryType column
(never as raw pixel arrays in Spark rows) — the analogue of keeping pages
PNG-encoded between docTR stages. zlib on the sparse glyph bitmaps gives
~50-100x reduction, which is what makes the image-bearing shuffle cheap.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PAGE_HDR = struct.Struct("<HH")  # (height, width), uint8 grayscale payload


def encode_page(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale page -> compressed bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 (H, W) page, got {img.dtype} {img.shape}")
    h, w = img.shape
    return _PAGE_HDR.pack(h, w) + zlib.compress(img.tobytes(), level=1)


def decode_page(data: bytes) -> np.ndarray:
    from .png import PNG_SIG, decode_png

    if data[:8] == PNG_SIG:  # payloads may pack pages as real PNGs
        return decode_png(data)
    h, w = _PAGE_HDR.unpack_from(data, 0)
    raw = zlib.decompress(data[_PAGE_HDR.size :])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


def encode_multipage(pages: list[np.ndarray]) -> bytes:
    """The "PDF" stand-in: length-prefixed concatenation of encoded pages."""
    parts = [struct.pack("<H", len(pages))]
    for p in pages:
        blob = encode_page(p)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def decode_multipage(data: bytes) -> list[np.ndarray]:
    (n,) = struct.unpack_from("<H", data, 0)
    off = 2
    pages = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        pages.append(decode_page(data[off : off + ln]))
        off += ln
    return pages
