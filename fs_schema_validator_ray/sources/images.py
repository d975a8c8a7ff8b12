"""Deterministic synthetic image corpus — the image analogue of
``sources/clips.py``. ALL FOUR formats carry REAL rasters encoded by
the from-scratch codecs with deterministic hash-seeded content:
PNG rows (``functions/png.py``) cycle color types (RGB / gray /
palette), filters 0-4 and Adam7 interlace; GIF rows
(``functions/gif.py``) cycle palette sizes and 4-pass interlace; JPEG
rows (``functions/jpeg.py``) cycle quality and 4:2:0/4:4:4; WEBP rows
cycle plain / subtract-green / predictor / palette / color-cache /
meta-prefix lossless VP8L streams (``functions/webp.py``) AND lossy
VP8 key frames (``functions/vp8.py``) — so every decoder path runs in
the pipeline, not just in unit tests. Mirrors the reference's image
fixture styles (/root/reference/tests/test_image.py uses tiny real
rasters + corrupted variants).

Planted violations:
* every 97th payload truncated (fails sniff or header parse),
* every 89th declared with the WRONG format,
* every 101st given broken pixel data under a valid header (corrupt
  zlib stream / corrupt LZW / truncated entropy scan / truncated VP8L
  bitstream) — caught ONLY by the real deep decode
  (``ImageValidateStage(deep_decode=True)``)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.gif import encode_gif
from fs_schema_validator_ray.functions.jpeg import encode_jpeg
from fs_schema_validator_ray.functions.png import encode_png
from fs_schema_validator_ray.functions.webp import encode_webp

#: bump when fixture generation changes (cache key for the corpus parquet)
IMAGES_CORPUS_VERSION = 4


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


def jpeg_bytes(w: int, h: int, salt: int = 0) -> bytes:
    """Real JPEG with deterministic smooth content (gradients compress
    honestly); 4:2:0 / 4:4:4, quality, and baseline-vs-PROGRESSIVE
    (SOF2 multi-scan) cycle with ``salt``."""
    rng = np.random.Generator(np.random.PCG64(salt ^ 0x4A50))
    yy, xx = np.mgrid[0:h, 0:w]
    base = rng.integers(0, 128, size=3)
    px = np.stack(
        [
            base[0] + xx * (200 - base[0]) / max(w, 1),
            base[1] + yy * (200 - base[1]) / max(h, 1),
            base[2] + (xx + yy) * (200 - base[2]) / max(h + w, 1),
        ],
        axis=2,
    ).astype(np.uint8)
    quality = (95, 85)[salt % 2]
    if salt % 7 == 3:
        return encode_jpeg(px, quality=quality, progressive=True)
    return encode_jpeg(px, quality=quality, subsample=salt % 3 == 0)


def corrupt_jpeg_entropy(payload: bytes) -> bytes:
    """Cut the FIRST scan's entropy data in half (EOI appended) —
    markers and dims stay parseable, the Huffman stream runs dry
    mid-MCU: a GUARANTEED deep-decode failure for baseline AND
    progressive streams (a cut after later complete scans could decode;
    bit flips may decode structurally with wrong pixels — a
    planted-count corpus cannot rely on either)."""
    sos = payload.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(payload[sos + 2 : sos + 4], "big")
    # end of the first scan's entropy: next 0xFF followed by a true marker
    end = scan_start
    while end < len(payload) - 1:
        if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
            0xD0 <= payload[end + 1] <= 0xD7
        ):
            break
        end += 1
    keep = scan_start + max(2, (end - scan_start) // 2)
    return payload[:keep] + b"\xff\xd9"


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


def webp_bytes(w: int, h: int, salt: int = 0) -> bytes:
    """Real WebP with deterministic content; the stream kind cycles
    with ``salt`` so plain / subtract-green / predictor /
    palette(bundled) / color-cache / meta-prefix VP8L decode paths AND
    the lossy VP8 key-frame path (``functions/vp8.py``, kind 6) all run
    in-pipeline."""
    rng = np.random.Generator(np.random.PCG64(salt ^ 0x5750))
    kind = salt % 7
    if kind == 3:  # small palette → sub-byte index bundling
        pal = rng.integers(0, 256, size=(9, 3), dtype=np.uint8)
        idx = rng.integers(0, 9, size=(h, w))
        return encode_webp(pal[idx], palette=True)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == 0:
        return encode_webp(px)
    if kind == 1:
        return encode_webp(px, subtract_green=True)
    if kind == 2:
        return encode_webp(px, predictor=True)
    if kind == 4:
        return encode_webp(px, color_cache_bits=5)
    if kind == 5:
        return encode_webp(px, meta_blocks=True)
    # lossy VP8 key frame, q cycling across the quantizer range
    from fs_schema_validator_ray.functions.vp8 import encode_webp_lossy

    return encode_webp_lossy(px, q_index=2 + (salt // 7) % 60)


def corrupt_webp_stream(payload: bytes) -> bytes:
    """Truncate the image chunk body — VP8L to 6 bytes (signature +
    dims keep parsing; the prefix-code tables cannot fit), lossy VP8 to
    24 bytes (the frame header parses, the first partition extends past
    the end) — a GUARANTEED deep-decode failure with a valid header,
    like the other formats' planted corruptions."""
    if b"VP8L" in payload:
        i = payload.index(b"VP8L")
        keep = 6
    else:
        i = payload.index(b"VP8 ")
        keep = 24
    body = payload[i + 8 : i + 8 + keep]
    out = payload[: i + 4] + struct.pack("<I", keep) + body
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def build_images_table(n_rows: int, seed: int = 5) -> pa.Table:
    """n_rows deterministic images cycling png / gif / jpeg / webp, dims
    derived from the index, planted corruption per the module
    docstring."""
    keys, fmts, blobs = [], [], []
    makers = (
        ("png", png_bytes, corrupt_idat),
        ("gif", gif_bytes, corrupt_gif_lzw),
        ("jpeg", jpeg_bytes, corrupt_jpeg_entropy),
        ("webp", webp_bytes, corrupt_webp_stream),
    )
    for i in range(n_rows):
        w = int(4 + (i * 7) % 60)
        h = int(3 + (i * 5) % 40)
        fmt, make, corrupt = makers[i % 4]
        payload = make(w, h, i)
        if i % 97 == 0:
            payload = payload[:6]  # corrupt: too short to parse
        elif i % 89 == 0:
            # declared-format mismatch (cycle to the NEXT format's name)
            fmt = makers[(i + 1) % 4][0]
        elif i % 101 == 0:
            payload = corrupt(payload)  # deep-decode-only violation
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
