"""APNG (animated PNG) demux + composition gates — same honesty model
as test_webp_anim.py: frame pixels ride the fixture-gated still core;
what is verified here is the acTL/fcTL/fdAT container arithmetic
(sequence numbers, rects, dispose none/background/previous, blend
source/over) against spec-analytic canvases composed by hand."""

import numpy as np
import pytest

from fs_schema_validator_ray.functions.png import (
    PngError,
    decode_apng,
    decode_png,
    encode_apng,
    png_is_animated,
)


def _solid(h, w, rgba):
    fr = np.zeros((h, w, 4), np.uint8)
    fr[:] = rgba
    return fr


def test_apng_roundtrip_rects_dispose_background():
    base = _solid(10, 16, (200, 0, 0, 255))
    patch = _solid(4, 6, (0, 200, 0, 255))
    tail = _solid(3, 5, (0, 0, 200, 255))
    data = encode_apng(
        16, 10,
        [
            {"rgba": base, "delay_num": 2, "delay_den": 100},
            {"rgba": patch, "x": 2, "y": 4, "dispose_op": 1},
            {"rgba": tail, "x": 11, "y": 0},
        ],
        num_plays=5,
    )
    assert png_is_animated(data)
    out = decode_apng(data)
    assert (out["canvas_w"], out["canvas_h"], out["num_plays"]) == (16, 10, 5)
    assert len(out["frames"]) == 3
    assert out["frames"][0]["delay_num"] == 2

    np.testing.assert_array_equal(out["frames"][0]["rgba"], base)
    c2 = base.copy()
    c2[4:8, 2:8] = (0, 200, 0, 255)
    np.testing.assert_array_equal(out["frames"][1]["rgba"], c2)
    c3 = base.copy()
    c3[4:8, 2:8] = 0  # disposed to transparent black
    c3[0:3, 11:16] = (0, 0, 200, 255)
    np.testing.assert_array_equal(out["frames"][2]["rgba"], c3)


def test_apng_dispose_previous_and_blend_over():
    base = _solid(8, 8, (100, 100, 100, 255))
    ov = _solid(4, 4, (200, 0, 0, 128))
    data = encode_apng(
        8, 8,
        [
            {"rgba": base},
            {"rgba": ov, "x": 2, "y": 2, "blend_op": 1, "dispose_op": 2},
            {"rgba": _solid(2, 2, (0, 255, 0, 255)), "x": 0, "y": 0},
        ],
    )
    out = decode_apng(data)
    # frame 2 blends OVER: same integer formula as webp (shared impl)
    A = 128 * 255 + 255 * 127
    red = (200 * 128 * 255 + 100 * 255 * 127 + A // 2) // A
    oth = (0 * 128 * 255 + 100 * 255 * 127 + A // 2) // A
    px = out["frames"][1]["rgba"][3, 3]
    assert tuple(px) == (red, oth, oth, 255)
    # frame 3: the blended rect reverted to base (dispose PREVIOUS)
    np.testing.assert_array_equal(
        out["frames"][2]["rgba"][2:6, 2:6], base[2:6, 2:6]
    )
    assert tuple(out["frames"][2]["rgba"][0, 0]) == (0, 255, 0, 255)


def test_apng_default_image_still_decodes():
    """The IDAT default image stays a valid still PNG for non-APNG-aware
    consumers — decode_png must return frame 1's RGB."""
    base = _solid(6, 6, (10, 20, 30, 255))
    data = encode_apng(6, 6, [{"rgba": base}, {"rgba": _solid(2, 2, (1, 2, 3, 255)), "x": 4, "y": 4}])
    np.testing.assert_array_equal(decode_png(data), base[..., :3])


def test_apng_sequence_and_rect_validation():
    base = _solid(6, 6, (1, 1, 1, 255))
    good = encode_apng(6, 6, [{"rgba": base}, {"rgba": _solid(2, 2, (9, 9, 9, 255)), "x": 2, "y": 2}])
    # corrupt an fdAT sequence number
    i = good.index(b"fdAT")
    bad = bytearray(good)
    bad[i + 4 : i + 8] = (99).to_bytes(4, "big")
    # fix the chunk CRC so the corruption reaches the sequence check
    import struct as _s
    import zlib as _z

    ln = _s.unpack(">I", bytes(bad[i - 4 : i]))[0]
    payload = bytes(bad[i + 4 : i + 4 + ln])
    bad[i + 4 + ln : i + 8 + ln] = _s.pack(
        ">I", _z.crc32(b"fdAT" + payload) & 0xFFFFFFFF
    )
    with pytest.raises(PngError, match="sequence"):
        decode_apng(bytes(bad))
    # rect outside canvas refuses at the encoder-independent decode layer
    with pytest.raises(PngError):
        decode_apng(
            encode_apng(6, 6, [{"rgba": base}])[:-20]
        )
    # a plain still is not animated
    from fs_schema_validator_ray.functions.png import encode_png

    still = encode_png(np.zeros((4, 4, 3), np.uint8))
    assert not png_is_animated(still)
    with pytest.raises(PngError, match="acTL"):
        decode_apng(still)


def test_apng_nonsolid_frames_exact():
    rng = np.random.default_rng(5)
    f1 = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    f1[..., 3] = 255
    f2 = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    f2[..., 3] = 255
    out = decode_apng(
        encode_apng(7, 5, [{"rgba": f1}, {"rgba": f2, "x": 2, "y": 1}])
    )
    np.testing.assert_array_equal(out["frames"][0]["rgba"], f1)
    exp = f1.copy()
    exp[1:4, 2:6] = f2
    np.testing.assert_array_equal(out["frames"][1]["rgba"], exp)
