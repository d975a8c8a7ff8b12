"""Fuzz-totality for the animation demuxers (codec-totality convention:
arbitrary corruption must raise the TYPED error or decode to something
valid — never an untyped crash)."""

import numpy as np
import pytest


def _flip(data: bytes, rng, n_flips: int) -> bytes:
    b = bytearray(data)
    for _ in range(n_flips):
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
    return bytes(b)


def test_webp_anim_fuzz_total():
    from fs_schema_validator_ray.functions.webp import (
        WebpError,
        decode_webp_anim,
        encode_webp_anim,
    )

    base = np.zeros((8, 12, 3), np.uint8)
    base[:] = (40, 80, 120)
    good = encode_webp_anim(
        12, 8,
        [{"rgb": base, "duration_ms": 5},
         {"rgb": base[:4, :6], "x": 2, "y": 2, "duration_ms": 7}],
    )
    rng = np.random.default_rng(0)
    crashes = 0
    for trial in range(300):
        bad = _flip(good, rng, 1 + trial % 4)
        try:
            out = decode_webp_anim(bad)
            assert out["frames"]  # decoded: must be structurally valid
        except WebpError:
            pass
        except Exception:  # noqa: BLE001
            crashes += 1
    assert crashes == 0


def test_apng_fuzz_total():
    from fs_schema_validator_ray.functions.png import (
        PngError,
        decode_apng,
        encode_apng,
    )

    f = np.zeros((6, 9, 4), np.uint8)
    f[..., 3] = 255
    good = encode_apng(
        9, 6, [{"rgba": f}, {"rgba": f[:3, :4], "x": 1, "y": 1}]
    )
    rng = np.random.default_rng(1)
    crashes = 0
    for trial in range(300):
        bad = _flip(good, rng, 1 + trial % 4)
        try:
            out = decode_apng(bad)
            assert out["frames"]
        except PngError:
            pass
        except Exception:  # noqa: BLE001
            crashes += 1
    assert crashes == 0


def test_gif_anim_fuzz_total():
    from fs_schema_validator_ray.functions.gif import (
        GifError,
        decode_gif_anim,
        encode_gif_anim,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    good = encode_gif_anim(
        8, 6,
        [{"indices": np.ones((6, 8), np.uint8)},
         {"indices": np.full((3, 3), 2, np.uint8), "x": 2, "y": 1}],
        palette=pal,
    )
    rng = np.random.default_rng(2)
    crashes = 0
    for trial in range(300):
        bad = _flip(good, rng, 1 + trial % 4)
        try:
            out = decode_gif_anim(bad)
            assert out["frames"]
        except GifError:
            pass
        except Exception:  # noqa: BLE001
            crashes += 1
    assert crashes == 0


def test_exif_fuzz_total():
    """EXIF parser totality: corrupted APP1 payloads raise JpegError or
    parse to a dict — never an untyped crash."""
    import numpy as np

    from fs_schema_validator_ray.functions.jpeg import (
        JpegError,
        build_exif_app1,
        encode_jpeg,
        insert_exif,
        jpeg_exif,
    )

    j = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    good = insert_exif(
        j,
        build_exif_app1(
            orientation=3, make="MAKER X", model="M", pixel_x=8, pixel_y=8
        ),
    )
    rng = np.random.default_rng(7)
    crashes = 0
    for trial in range(400):
        bad = _flip(good, rng, 1 + trial % 3)
        try:
            out = jpeg_exif(bad)
            assert out is None or isinstance(out, dict)
        except JpegError:
            pass
        except Exception:  # noqa: BLE001
            crashes += 1
    assert crashes == 0
