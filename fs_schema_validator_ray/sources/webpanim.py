"""Deterministic synthetic animated-WebP corpus — the animation analogue
of ``sources/videos.py``. Every row is a REAL animated WebP container
(VP8X + ANIM/ANMF, frames encoded by the from-scratch VP8L encoder in
``functions/webp.py``) with index-derived canvas dims, frame rects,
durations and dispose flags, so the demux contract is SQL-expressible.

Planted violations:
* every 13th row: truncated container (RIFF cut short → the typed
  ``WebpError``; zero frames, ``ok = false`` in the contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.webp import encode_webp_anim

#: bump when fixture generation changes (cache key for the corpus parquet)
WEBPANIM_CORPUS_VERSION = 1


def n_frames_of(i: int) -> int:
    return 1 + i % 4


def duration_of(i: int, j: int) -> int:
    return 10 + 7 * j + i % 5


def anim_bytes(i: int) -> bytes:
    w = 16 + (i * 3) % 16
    h = 12 + (i * 5) % 12
    frames = []
    for j in range(n_frames_of(i)):
        xoff = 2 * (j % 3)
        yoff = 2 * (j % 2)
        fw, fh = w - 4, h - 2
        yy, xx = np.mgrid[0:fh, 0:fw]
        rgb = np.stack(
            [
                (xx * (j + 2) + i) % 256,
                (yy * (j + 3) + 2 * i) % 256,
                (xx + yy + 5 * j) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        frames.append(
            {
                "rgb": rgb,
                "x": xoff,
                "y": yoff,
                "duration_ms": duration_of(i, j),
                "dispose": bool(j % 2),
            }
        )
    return encode_webp_anim(
        w, h, frames, bg_rgba=(i % 256, (2 * i) % 256, (3 * i) % 256, 255),
        loop_count=i % 7,
    )


def build_webpanim_table(n_rows: int) -> pa.Table:
    keys, blobs = [], []
    for i in range(n_rows):
        payload = anim_bytes(i)
        if i % 13 == 0:
            payload = payload[:20]  # container corrupt: truncated RIFF
        keys.append(f"anim-{i:05d}")
        blobs.append(payload)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
