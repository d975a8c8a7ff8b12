"""Deterministic synthetic image corpus — the image analogue of
``sources/clips.py``. PNG rows are REAL full rasters encoded by the
from-scratch codec (``functions/png.py``) with deterministic
hash-seeded pixel content, cycling color types (RGB / gray / palette),
filters 0-4 and Adam7 interlace so the decoder's every path runs in the
pipeline, not just in unit tests. GIF rows stay header-only (sniffable
+ dimension-parseable; no gif decoder in this sandbox — the
deterministic fake supplies their pixels downstream). Mirrors the
reference's image fixture styles (/root/reference/tests/test_image.py
uses tiny real rasters + corrupted variants).

Planted violations:
* every 97th payload truncated (fails sniff),
* every 89th declared with the WRONG format,
* every 101st png given a corrupt zlib stream — valid header, broken
  pixels: caught ONLY by the real deep decode
  (``ImageValidateStage(deep_decode=True)``)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.png import encode_png


def png_bytes(w: int, h: int, salt: int = 0) -> bytes:
    """Real PNG with deterministic content; color type / filter /
    interlace cycle with ``salt`` for decoder-path coverage."""
    rng = np.random.Generator(np.random.PCG64(salt))
    filter_type = salt % 5
    interlace = salt % 13 == 0
    kind = salt % 3
    if kind == 0:  # RGB8
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return encode_png(px, 2, 8, filter_type, interlace)
    if kind == 1:  # gray8
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        return encode_png(px, 0, 8, filter_type, interlace)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
    return encode_png(idx, 3, 4, filter_type, interlace, palette=palette)


def corrupt_idat(payload: bytes) -> bytes:
    """Valid chunk framing + CRC, garbage zlib stream — the deep-decode
    planted violation (header-only checks pass)."""
    i = payload.index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", payload[i : i + 4])
    bogus = bytes((b ^ 0x5A) for b in payload[i + 8 : i + 8 + ln])
    chunk = b"IDAT" + bogus
    return (
        payload[:i]
        + struct.pack(">I", ln)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
        + payload[i + 8 + ln + 4 :]
    )


def gif_bytes(w: int, h: int, salt: int = 0) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + salt.to_bytes(8, "little")


def build_images_table(n_rows: int, seed: int = 5) -> pa.Table:
    """n_rows deterministic images: alternating png/gif, dims derived
    from the index, planted corruption per the module docstring."""
    keys, fmts, blobs = [], [], []
    for i in range(n_rows):
        w = int(4 + (i * 7) % 60)
        h = int(3 + (i * 5) % 40)
        is_png = i % 2 == 0
        payload = png_bytes(w, h, i) if is_png else gif_bytes(w, h, i)
        fmt = "png" if is_png else "gif"
        if i % 97 == 0:
            payload = payload[:6]  # corrupt: too short to sniff
        elif i % 89 == 0:
            fmt = "gif" if is_png else "png"  # declared-format mismatch
        elif is_png and i % 101 == 0:
            payload = corrupt_idat(payload)  # deep-decode-only violation
        keys.append(f"img-{i:06d}")
        fmts.append(fmt)
        blobs.append(payload)
    _ = seed  # corpus is fully index-deterministic
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "format": pa.array(fmts, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
