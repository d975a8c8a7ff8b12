"""Deterministic synthetic APNG corpus — the PNG-animation analogue of
``sources/webpanim.py``. Every row is a REAL APNG (acTL/fcTL/fdAT,
frames encoded by the from-scratch PNG encoder) with index-derived
canvas dims, frame rects, delays and dispose flags, so the demux
contract is SQL-expressible.

Planted violations:
* every 11th row: truncated container (chunk walk fails → the typed
  ``PngError``; ``ok = false`` with zero frames in the contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.png import encode_apng

#: bump when fixture generation changes (cache key for the corpus parquet)
APNG_CORPUS_VERSION = 1


def n_frames_of(i: int) -> int:
    return 1 + i % 3


def delay_num_of(i: int, j: int) -> int:
    return 1 + j + i % 4


def apng_bytes(i: int) -> bytes:
    w = 12 + (i * 5) % 12
    h = 8 + (i * 3) % 8
    frames = []
    for j in range(n_frames_of(i)):
        if j == 0:
            fw, fh, x, y = w, h, 0, 0
        else:
            fw, fh = w - 3, h - 2
            x, y = j % 3, j % 2
        yy, xx = np.mgrid[0:fh, 0:fw]
        rgba = np.stack(
            [
                (xx * (j + 2) + i) % 256,
                (yy * (j + 3) + 2 * i) % 256,
                (xx + yy + 5 * j) % 256,
                np.full((fh, fw), 255),
            ],
            axis=2,
        ).astype(np.uint8)
        frames.append(
            {
                "rgba": rgba,
                "x": x,
                "y": y,
                "delay_num": delay_num_of(i, j),
                "delay_den": 50,
                "dispose_op": j % 2,
            }
        )
    return encode_apng(w, h, frames, num_plays=i % 5)


def build_apng_table(n_rows: int) -> pa.Table:
    keys, blobs = [], []
    for i in range(n_rows):
        payload = apng_bytes(i)
        if i % 11 == 0:
            payload = payload[:30]  # container corrupt: truncated chunks
        keys.append(f"apng-{i:05d}")
        blobs.append(payload)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
