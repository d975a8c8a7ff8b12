"""Deterministic synthetic image corpus — the image analogue of
``sources/clips.py``. BOTH formats carry REAL full rasters encoded by
the from-scratch codecs with deterministic hash-seeded pixel content:
PNG rows (``functions/png.py``) cycle color types (RGB / gray /
palette), filters 0-4 and Adam7 interlace; GIF rows
(``functions/gif.py``) cycle palette sizes and 4-pass interlace — so
every decoder path runs in the pipeline, not just in unit tests.
Mirrors the reference's image fixture styles
(/root/reference/tests/test_image.py uses tiny real rasters +
corrupted variants).

Planted violations:
* every 97th payload truncated (fails sniff),
* every 89th declared with the WRONG format,
* every 101st png given a corrupt zlib stream, and every 103rd gif a
  corrupt LZW stream — valid headers, broken pixels: caught ONLY by the
  real deep decode (``ImageValidateStage(deep_decode=True)``)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.gif import encode_gif
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
    """Real GIF frame with deterministic palette content; palette size /
    interlace cycle with ``salt`` for decoder-path coverage."""
    rng = np.random.Generator(np.random.PCG64(salt ^ 0x6766))
    n_colors = (16, 64, 256, 4)[salt % 4]
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    return encode_gif(idx, palette, interlace=salt % 11 == 0)


def corrupt_gif_lzw(payload: bytes) -> bytes:
    """Flip bytes inside the LZW data sub-blocks — header and dims stay
    parseable, pixels don't (the gif deep-decode planted violation)."""
    # image descriptor follows header + global color table
    pal_bits = (payload[10] & 0x07) + 1
    img_off = payload.index(0x2C, 13 + 3 * (1 << pal_bits))
    lzw_start = img_off + 9 + 1 + 1
    out = bytearray(payload)
    for i in range(lzw_start, min(lzw_start + 12, len(out) - 2)):
        out[i] ^= 0xA5
    return bytes(out)


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
        elif not is_png and i % 103 == 0:
            payload = corrupt_gif_lzw(payload)  # gif deep-decode violation
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
