"""Animated GIF (GCE / NETSCAPE2.0) demux + composition gates — same
honesty model as test_webp_anim.py / test_apng.py: pixels ride the
gated LZW core; verified here is the multi-frame container arithmetic
(rects, delays, loop count, disposal none/background/previous, binary
transparency) against hand-composed canvases."""

import numpy as np
import pytest

from fs_schema_validator_ray.functions.gif import (
    GifError,
    decode_gif,
    decode_gif_anim,
    encode_gif_anim,
    gif_is_animated,
)

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
)


def test_gif_anim_roundtrip_disposal_background():
    base = np.ones((6, 10), np.uint8)  # red canvas
    patch = np.full((3, 4), 2, np.uint8)  # green patch
    tail = np.full((2, 3), 3, np.uint8)  # blue tail
    data = encode_gif_anim(
        10, 6,
        [
            {"indices": base, "delay_cs": 4},
            {"indices": patch, "x": 2, "y": 1, "delay_cs": 6, "disposal": 2},
            {"indices": tail, "x": 7, "y": 4, "delay_cs": 8},
        ],
        palette=PAL, loop_count=3,
    )
    assert gif_is_animated(data)
    out = decode_gif_anim(data)
    assert (out["canvas_w"], out["canvas_h"], out["loop_count"]) == (10, 6, 3)
    assert [f["delay_cs"] for f in out["frames"]] == [4, 6, 8]

    c1 = np.zeros((6, 10, 4), np.uint8)
    c1[..., :3] = (255, 0, 0)
    c1[..., 3] = 255
    np.testing.assert_array_equal(out["frames"][0]["rgba"], c1)
    c2 = c1.copy()
    c2[1:4, 2:6, :3] = (0, 255, 0)
    np.testing.assert_array_equal(out["frames"][1]["rgba"], c2)
    c3 = c1.copy()
    c3[1:4, 2:6] = 0  # disposal 2: cleared to transparent
    c3[4:6, 7:10, :3] = (0, 0, 255)
    np.testing.assert_array_equal(out["frames"][2]["rgba"], c3)


def test_gif_anim_transparency_and_dispose_previous():
    base = np.ones((5, 5), np.uint8)
    ov = np.array(
        [[2, 0, 2], [0, 2, 0], [2, 0, 2]], np.uint8
    )  # checker, 0 = transparent
    data = encode_gif_anim(
        5, 5,
        [
            {"indices": base},
            {"indices": ov, "x": 1, "y": 1, "transparent_index": 0,
             "disposal": 3},
            {"indices": np.full((1, 1), 3, np.uint8)},
        ],
        palette=PAL,
    )
    out = decode_gif_anim(data)
    f2 = out["frames"][1]["rgba"]
    assert tuple(f2[1, 1]) == (0, 255, 0, 255)  # painted
    assert tuple(f2[1, 2]) == (255, 0, 0, 255)  # transparent: base shows
    # disposal 3 restored the rect before frame 3
    f3 = out["frames"][2]["rgba"]
    assert tuple(f3[1, 1]) == (255, 0, 0, 255)
    assert tuple(f3[0, 0]) == (0, 0, 255, 255)


def test_gif_anim_first_frame_matches_still_decoder():
    base = np.ones((4, 6), np.uint8)
    data = encode_gif_anim(
        6, 4, [{"indices": base}, {"indices": np.full((2, 2), 2, np.uint8)}],
        palette=PAL,
    )
    np.testing.assert_array_equal(
        decode_gif(data), out_expected := np.tile(PAL[1], (4, 6, 1))
    )


def test_gif_anim_malformed_and_still_detection():
    from fs_schema_validator_ray.functions.gif import encode_gif

    still = encode_gif(np.ones((3, 3), np.uint8), PAL)
    assert not gif_is_animated(still)
    # still GIFs are valid single-frame animations (one canvas)
    one = decode_gif_anim(still)
    assert len(one["frames"]) == 1
    data = encode_gif_anim(
        4, 4, [{"indices": np.ones((4, 4), np.uint8)},
               {"indices": np.full((2, 2), 2, np.uint8), "x": 2, "y": 2}],
        palette=PAL,
    )
    with pytest.raises(GifError):
        decode_gif_anim(data[:-6])
