"""From-scratch BMP codec (stdlib + numpy).

Rounds out the raster set (png/gif/jpeg): uncompressed Windows BMP —
BITMAPINFOHEADER, 24-bit BGR and 8-bit paletted, bottom-up (positive
height) and top-down (negative height) row orders, 4-byte row padding.
RLE compression is rejected with a typed error (validation-grade scope;
RLE BMPs are vanishingly rare in ML corpora).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Malformed / unsupported BMP payload."""


def decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("bad bmp signature or truncated header")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if w < 1 or h_signed == 0:
        raise BmpError("zero image dimension")
    if planes != 1:
        raise BmpError(f"invalid plane count {planes}")
    if compression != 0:
        raise BmpError(f"unsupported compression {compression}")
    if bpp not in (8, 24):
        raise BmpError(f"unsupported bit depth {bpp}")
    h = abs(h_signed)
    top_down = h_signed < 0

    palette = None
    if bpp == 8:
        (colors_used,) = struct.unpack("<I", data[46:50])
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(data):
            raise BmpError("truncated palette")
        bgra = np.frombuffer(data[pal_off:pal_end], np.uint8).reshape(-1, 4)
        palette = bgra[:, [2, 1, 0]].copy()  # BGR(A) → RGB

    row_bytes = (w * bpp // 8 + 3) & ~3
    need = pix_off + row_bytes * h
    if pix_off < 54 or need > len(data):
        raise BmpError("truncated pixel data")
    raw = np.frombuffer(data[pix_off : pix_off + row_bytes * h], np.uint8).reshape(
        h, row_bytes
    )
    if not top_down:
        raw = raw[::-1]
    if bpp == 24:
        bgr = raw[:, : w * 3].reshape(h, w, 3)
        return bgr[..., ::-1].copy()  # BGR → RGB
    idx = raw[:, :w]
    if int(idx.max(initial=0)) >= len(palette):
        raise BmpError("palette index out of range")
    return palette[idx]


def encode_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """24-bit uncompressed BMP from an ``(h, w, 3)`` uint8 RGB array."""
    px = np.asarray(rgb, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    bgr = px[..., ::-1]
    rows = bgr if top_down else bgr[::-1]
    body[:, : w * 3] = rows.reshape(h, w * 3)
    pix = body.tobytes()
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return hdr + dib + pix
