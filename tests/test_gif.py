"""From-scratch GIF codec: encode→decode round-trips (plain + interlace,
palette sizes, multi-sub-block payloads), malformed-payload rejection,
and LZW edge behavior."""

import struct

import numpy as np
import pytest

from fs_schema_validator_ray.functions.gif import (
    GifError,
    decode_gif,
    encode_gif,
)


def frame(h, w, n_colors=16, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return idx, pal


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("n_colors", [4, 16, 64, 256])
def test_roundtrip(interlace, n_colors):
    idx, pal = frame(13, 17, n_colors, seed=n_colors)
    data = encode_gif(idx, pal, interlace=interlace)
    out = decode_gif(data)
    assert out.shape == (13, 17, 3)
    assert np.array_equal(out, pal[idx])


def test_roundtrip_large_frame_multiblock():
    # > 255 LZW bytes → multiple data sub-blocks
    idx, pal = frame(40, 50, 256, seed=3)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_interlace_row_order_differs_from_sequential():
    idx, pal = frame(10, 6, 16, seed=9)
    a = encode_gif(idx, pal, interlace=False)
    b = encode_gif(idx, pal, interlace=True)
    assert a != b
    assert np.array_equal(decode_gif(a), decode_gif(b))


def test_extension_blocks_skipped():
    idx, pal = frame(5, 5, 16, seed=1)
    data = bytearray(encode_gif(idx, pal))
    # inject a graphic-control extension right before the image descriptor
    img_off = data.index(0x2C, 13 + 3 * 16)
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    patched = bytes(data[:img_off]) + ext + bytes(data[img_off:])
    assert np.array_equal(decode_gif(patched), pal[idx])


def test_malformed_payloads():
    idx, pal = frame(6, 6, 16, seed=2)
    good = encode_gif(idx, pal)

    with pytest.raises(GifError, match="signature"):
        decode_gif(b"NOTAGIF" + good)
    with pytest.raises(GifError):
        decode_gif(good[:10])  # truncated header
    # truncate inside the LZW sub-blocks
    with pytest.raises(GifError):
        decode_gif(good[: len(good) - 6])
    # corrupt the LZW stream (flip bytes after the image descriptor)
    data = bytearray(good)
    lzw_start = data.index(0x2C, 13 + 3 * 16) + 9 + 1 + 1
    for i in range(lzw_start, min(lzw_start + 8, len(data) - 2)):
        data[i] ^= 0xA5
    with pytest.raises(GifError):
        decode_gif(bytes(data))
    # no image data at all: header + trailer
    with pytest.raises(GifError, match="no image data"):
        decode_gif(good[: 13 + 3 * 16] + b"\x3b")


def test_zero_dims_and_missing_palette():
    idx, pal = frame(4, 4, 16, seed=5)
    good = bytearray(encode_gif(idx, pal))
    # zero the frame width in the image descriptor
    img_off = good.index(0x2C, 13 + 3 * 16)
    bad = bytearray(good)
    struct.pack_into("<H", bad, img_off + 5, 0)
    with pytest.raises(GifError, match="zero frame dimension"):
        decode_gif(bytes(bad))
    # drop the global-color-table flag (no palette anywhere)
    bad2 = bytearray(good)
    bad2[10] &= 0x7F
    del bad2[13 : 13 + 3 * 16]
    with pytest.raises(GifError, match="color table"):
        decode_gif(bytes(bad2))
