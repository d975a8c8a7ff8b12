"""Animated WebP (VP8X + ANIM/ANMF) demux + composition gates.

Frame PIXELS go through the already-libwebp-gated still decoders
(test_webp.py / test_vp8.py); what is verified here is the container
spec arithmetic: rects, background, blend/dispose semantics, loop
count — all against spec-ANALYTIC expected canvases computed
independently in numpy (no decoder in the expectation path: fixture
frames are solid/known patterns composed by hand)."""

import numpy as np
import pytest

from fs_schema_validator_ray.functions.webp import (
    WebpError,
    decode_webp_anim,
    encode_webp_anim,
    webp_is_animated,
)


def _solid(h, w, rgb, a=255):
    fr = np.zeros((h, w, 3), np.uint8)
    fr[:] = rgb
    al = np.full((h, w), a, np.uint8)
    return fr, al


def test_anim_roundtrip_rects_and_dispose():
    canvas_w, canvas_h = 20, 12
    bg = (10, 20, 30, 255)
    f1, _ = _solid(12, 20, (200, 0, 0))
    f2, _ = _solid(4, 6, (0, 200, 0))
    f3, _ = _solid(4, 6, (0, 0, 200))
    data = encode_webp_anim(
        canvas_w, canvas_h,
        [
            {"rgb": f1, "duration_ms": 40},
            {"rgb": f2, "x": 2, "y": 4, "duration_ms": 50, "dispose": True},
            {"rgb": f3, "x": 10, "y": 0, "duration_ms": 60},
        ],
        bg_rgba=bg, loop_count=3,
    )
    assert webp_is_animated(data)
    out = decode_webp_anim(data)
    assert (out["canvas_w"], out["canvas_h"]) == (canvas_w, canvas_h)
    assert out["bg_rgba"] == bg
    assert out["loop_count"] == 3
    assert len(out["frames"]) == 3
    assert [f["duration_ms"] for f in out["frames"]] == [40, 50, 60]

    # analytic canvases
    c1 = np.zeros((canvas_h, canvas_w, 4), np.uint8)
    c1[..., :3] = (200, 0, 0)
    c1[..., 3] = 255
    np.testing.assert_array_equal(out["frames"][0]["rgba"], c1)

    c2 = c1.copy()
    c2[4:8, 2:8, :3] = (0, 200, 0)
    np.testing.assert_array_equal(out["frames"][1]["rgba"], c2)

    # frame 2 disposed to background before frame 3
    c3 = c1.copy()
    c3[4:8, 2:8] = bg
    c3[0:4, 10:16, :3] = (0, 0, 200)
    c3[0:4, 10:16, 3] = 255
    np.testing.assert_array_equal(out["frames"][2]["rgba"], c3)


def test_anim_alpha_blend_vs_overwrite():
    bg = (0, 0, 0, 255)
    base, _ = _solid(8, 8, (100, 100, 100))
    # half-transparent red overlay: alpha 128
    ov, al = _solid(8, 8, (200, 0, 0), a=128)
    blended = decode_webp_anim(
        encode_webp_anim(
            8, 8,
            [
                {"rgb": base, "duration_ms": 10},
                {"rgb": ov, "alpha": al, "duration_ms": 10, "blend": True},
            ],
            bg_rgba=bg,
        )
    )["frames"][1]["rgba"]
    # documented integer blend: A = 128*255 + 255*127; a_out = round(A/255)
    A = 128 * 255 + 255 * 127
    a_out = (A + 127) // 255
    red = (200 * 128 * 255 + 100 * 255 * 127 + A // 2) // A
    grn = (0 * 128 * 255 + 100 * 255 * 127 + A // 2) // A
    assert a_out == 255
    px = blended[3, 3]
    assert tuple(px) == (red, grn, grn, a_out)

    overwritten = decode_webp_anim(
        encode_webp_anim(
            8, 8,
            [
                {"rgb": base, "duration_ms": 10},
                {"rgb": ov, "alpha": al, "duration_ms": 10, "blend": False},
            ],
            bg_rgba=bg,
        )
    )["frames"][1]["rgba"]
    assert tuple(overwritten[3, 3]) == (200, 0, 0, 128)


def test_anim_blend_onto_transparent_background():
    # spec corner: fully-transparent dst -> result is the source as-is
    bg = (0, 0, 0, 0)
    ov, al = _solid(4, 4, (50, 60, 70), a=200)
    out = decode_webp_anim(
        encode_webp_anim(
            4, 4, [{"rgb": ov, "alpha": al, "duration_ms": 5}], bg_rgba=bg
        )
    )["frames"][0]["rgba"]
    assert tuple(out[1, 2]) == (50, 60, 70, 200)


def test_anim_malformed_raise_typed():
    f, _ = _solid(4, 4, (1, 2, 3))
    good = encode_webp_anim(8, 8, [{"rgb": f, "duration_ms": 5}])
    # frame rect outside canvas
    bad = encode_webp_anim(4, 4, [{"rgb": f, "x": 2, "y": 2, "duration_ms": 5}])
    with pytest.raises(WebpError, match="outside canvas"):
        decode_webp_anim(bad)
    # truncation inside the ANMF area
    with pytest.raises(WebpError):
        decode_webp_anim(good[:-7])
    # a still (non-animated) file is refused with the typed error
    from fs_schema_validator_ray.functions.webp import encode_webp

    with pytest.raises(WebpError):
        decode_webp_anim(encode_webp(f))
    assert not webp_is_animated(encode_webp(f))
    # odd offsets are an encoder-side error
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim(8, 8, [{"rgb": f, "x": 1, "duration_ms": 5}])


def test_anim_frame_pixels_use_gated_still_decoder():
    """A deterministic non-solid frame survives the round trip exactly
    (pixels go through the bit-exact-gated VP8L path)."""
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    out = decode_webp_anim(
        encode_webp_anim(10, 6, [{"rgb": fr, "x": 0, "y": 0, "duration_ms": 7}])
    )
    np.testing.assert_array_equal(out["frames"][0]["rgba"][..., :3], fr)
