"""Deterministic synthetic animated-GIF corpus — the GIF leg of the
animation family (``sources/webpanim.py`` / ``sources/apng.py``).
Index-derived canvas dims, frame rects, delays, disposal and a shared
4-color palette, so the demux contract is SQL-expressible.

Planted violations:
* every 9th row: truncated container (block walk fails → the typed
  ``GifError``; ``ok = false`` with zero frames in the contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.gif import encode_gif_anim

#: bump when fixture generation changes (cache key for the corpus parquet)
GIFANIM_CORPUS_VERSION = 1

_PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
)


def n_frames_of(i: int) -> int:
    return 1 + i % 5


def delay_of(i: int, j: int) -> int:
    return 2 + 3 * j + i % 6


def gif_bytes(i: int) -> bytes:
    w = 10 + (i * 7) % 14
    h = 8 + (i * 3) % 10
    frames = []
    for j in range(n_frames_of(i)):
        if j == 0:
            fw, fh, x, y = w, h, 0, 0
        else:
            fw, fh = w - 4, h - 3
            x, y = j % 4, j % 3
        yy, xx = np.mgrid[0:fh, 0:fw]
        idx = ((xx * (j + 1) + yy + i) % 4).astype(np.uint8)
        frames.append(
            {
                "indices": idx,
                "x": x,
                "y": y,
                "delay_cs": delay_of(i, j),
                "disposal": j % 3,
                "transparent_index": 0 if j % 2 else None,
            }
        )
    return encode_gif_anim(w, h, frames, palette=_PAL, loop_count=i % 4)


def build_gifanim_table(n_rows: int) -> pa.Table:
    keys, blobs = [], []
    for i in range(n_rows):
        payload = gif_bytes(i)
        if i % 9 == 0:
            payload = payload[:16]  # container corrupt: truncated header
        keys.append(f"gifa-{i:05d}")
        blobs.append(payload)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
