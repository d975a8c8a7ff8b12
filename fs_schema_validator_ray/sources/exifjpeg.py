"""Deterministic EXIF-bearing JPEG corpus — metadata-QA analogue of the
image corpora: real JPEGs (``functions/jpeg.py`` encoder) with an APP1
EXIF segment built per index, so the extraction contract is
SQL-expressible.

Planted classes:
* every 7th row: NO EXIF (plain JPEG) — ``has_exif = false``;
* every 13th row (and not exif-less): APP1 present but its TIFF IFD is
  truncated → the typed ``JpegError`` — ``has_exif = true, valid =
  false``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.functions.jpeg import (
    build_exif_app1,
    encode_jpeg,
    insert_exif,
)

#: bump when fixture generation changes
EXIFJPEG_CORPUS_VERSION = 1


def orientation_of(i: int) -> int:
    return 1 + i % 8


def make_of(i: int) -> str:
    return f"CAMERA_MAKER_{i % 5}"


def exif_bytes(i: int) -> bytes:
    w = 16 + (i * 3) % 16
    h = 12 + (i * 5) % 12
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(xx * 3 + i) % 256, (yy * 5 + 2 * i) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)
    j = encode_jpeg(px, quality=80)
    if i % 7 == 0:
        return j  # no EXIF
    app1 = build_exif_app1(
        orientation=orientation_of(i),
        make=make_of(i),
        model=f"M{i % 3}",
        pixel_x=w,
        pixel_y=h,
        big_endian=bool(i % 2),
    )
    if i % 13 == 0:
        # truncate inside the TIFF IFD but keep the segment length field
        # consistent (the marker walk succeeds, the IFD walk raises)
        import struct

        body = app1[4:]
        cut = body[:14]
        return insert_exif(
            j, b"\xff\xe1" + struct.pack(">H", len(cut) + 2) + cut
        )
    return insert_exif(j, app1)


def build_exifjpeg_table(n_rows: int) -> pa.Table:
    keys, blobs = [], []
    for i in range(n_rows):
        keys.append(f"exif-{i:05d}")
        blobs.append(exif_bytes(i))
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
