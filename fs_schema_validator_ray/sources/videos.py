"""Deterministic synthetic MJPEG-AVI video corpus — the video analogue
of ``sources/images.py``. Every row is a REAL single-stream MJPEG AVI
(``functions/video.py``) with deterministic gradient frames; frame
count and dims derive from the row index so the frame-sample contract
is SQL-expressible.

Planted violations:
* every 23rd video: truncated container (parse fails → zero frames),
* every 11th video (not container-corrupt): ONE frame's entropy scan
  cut in half (that frame alone fails pixel decode; the container and
  the other frames stay good).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.video import encode_avi

#: bump when fixture generation changes (cache key for the corpus parquet)
VIDEOS_CORPUS_VERSION = 1


def n_frames_of(i: int) -> int:
    return 3 + i % 6


def video_bytes(i: int) -> bytes:
    """Real MJPEG AVI for row ``i``: n_frames_of(i) deterministic
    gradient frames at index-derived dims."""
    w = 16 + (i * 3) % 24
    h = 12 + (i * 5) % 20
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [
        np.stack(
            [
                (xx * (k + 2) + i) % 256,
                (yy * (k + 3) + 2 * i) % 256,
                (xx + yy + 7 * k) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        for k in range(n_frames_of(i))
    ]
    return encode_avi(frames, fps=10, quality=85)


def corrupt_frame(payload: bytes, frame_idx: int) -> bytes:
    """Cut frame ``frame_idx``'s JPEG entropy scan in half inside the
    container (chunk length patched): the container parses, every other
    frame decodes, only that frame fails — a per-frame deep-decode
    planted violation."""
    import struct

    from fs_schema_validator_ray.functions.video import parse_avi
    from fs_schema_validator_ray.sources.images import corrupt_jpeg_entropy

    info = parse_avi(payload)
    off, ln = info.frame_ranges[frame_idx]
    bad = corrupt_jpeg_entropy(payload[off : off + ln])
    pad = b"\x00" if len(bad) & 1 else b""
    out = (
        payload[: off - 8]
        + payload[off - 8 : off - 4]  # keep the 00dc tag
        + struct.pack("<I", len(bad))
        + bad
        + pad
        + payload[off + ln + (ln & 1) :]
    )
    # RIFF and movi LIST lengths shrink by the same delta
    delta = (ln + (ln & 1)) - (len(bad) + len(pad))
    out = bytearray(out)
    (riff_len,) = struct.unpack("<I", out[4:8])
    struct.pack_into("<I", out, 4, riff_len - delta)
    movi = bytes(out).index(b"LIST", 12)
    while bytes(out)[movi + 8 : movi + 12] != b"movi":
        movi = bytes(out).index(b"LIST", movi + 1)
    (movi_len,) = struct.unpack("<I", out[movi + 4 : movi + 8])
    struct.pack_into("<I", out, movi + 4, movi_len - delta)
    return bytes(out)


def build_videos_table(n_rows: int) -> pa.Table:
    keys, blobs = [], []
    for i in range(n_rows):
        payload = video_bytes(i)
        if i % 23 == 0:
            payload = payload[:24]  # container corrupt: truncated RIFF
        elif i % 11 == 0:
            payload = corrupt_frame(payload, i % n_frames_of(i))
        keys.append(f"vid-{i:05d}")
        blobs.append(payload)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
