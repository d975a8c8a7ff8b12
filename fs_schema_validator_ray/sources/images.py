"""Deterministic synthetic image corpus (header-only PNG/GIF payloads +
planted corruption) — the image analogue of ``sources/clips.py``. No
imaging library exists in this environment, so payloads are REAL format
headers (sniffable, dimension-parseable) with hash-derived fake pixel
content supplied by ``multimodal.FakePixelDecoder`` downstream; swap a
real encoder in production. Mirrors the reference's image fixture styles
(/root/reference/tests/test_image.py uses tiny real rasters)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa


def png_bytes(w: int, h: int, salt: int = 0) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
        + salt.to_bytes(8, "little")  # varies FakePixelDecoder's content
    )


def gif_bytes(w: int, h: int, salt: int = 0) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + salt.to_bytes(8, "little")


def build_images_table(n_rows: int, seed: int = 5) -> pa.Table:
    """n_rows deterministic images: alternating png/gif, dims derived
    from the index, every 97th payload corrupted (truncated header) and
    every 89th declared with the WRONG format — the planted violations
    the validate stage must flag."""
    rng = np.random.default_rng(seed)
    keys, fmts, blobs = [], [], []
    for i in range(n_rows):
        w = int(4 + (i * 7) % 60)
        h = int(3 + (i * 5) % 40)
        is_png = i % 2 == 0
        payload = png_bytes(w, h, i) if is_png else gif_bytes(w, h, i)
        fmt = "png" if is_png else "gif"
        if i % 97 == 0:
            payload = payload[:6]  # corrupt: too short to parse
        elif i % 89 == 0:
            fmt = "gif" if is_png else "png"  # declared-format mismatch
        keys.append(f"img-{i:06d}")
        fmts.append(fmt)
        blobs.append(payload)
    _ = rng  # reserved for future noise injection; corpus stays deterministic
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "format": pa.array(fmts, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
