"""Conformance + totality tests for the from-scratch lossy-VP8 decoder
(``functions/vp8.py``, RFC 6386).

Two gate layers:

* an EMBEDDED libwebp-encoded fixture with pinned YUV plane digests —
  runs everywhere, no system library needed, catches any arithmetic /
  table / filter regression bit-exactly;
* a live bit-exact sweep against libwebp via ctypes (encode with
  ``WebPEncodeRGB`` / the advanced ``WebPEncode`` API, compare against
  ``WebPDecodeYUV``) across quality, segmentation, loop-filter type /
  sharpness, and token-partition counts — skipped when the shared
  library is absent.  The library is TEST SCAFFOLDING only (same role
  as DuckDB for the SQL oracles); the decode path under test is pure
  Python/numpy.

Reference parity: the reference validates lossy webp via PIL+libwebp
(``/root/reference/fs_schema_validator/schemas/image.py:15-22``); its
own 400×400 ``image.webp`` fixture decodes bit-exactly here
(``test_reference_fixture_bit_exact``).
"""

from __future__ import annotations

import base64
import hashlib
import struct
from pathlib import Path

import numpy as np
import pytest

from fs_schema_validator_ray.functions.vp8 import (
    Vp8Error,
    decode_vp8,
    decode_vp8_rgb,
    vp8_dimensions,
)

# 48x36 mixed smooth/noise content, libwebp q50, method 2, 2 token
# partitions, segmentation + normal loop filter active
_FIXTURE_B64 = (
    "UklGRloCAABXRUJQVlA4IE4CAAAQEQCdASowACQAPr1QmUunJSIhtV1dUOBXiWwAnTKEfASI"
    "qx/gNYRJ92dTydt9zsPoQ6ED1Gf2q9gD9YOst/vNmX6kGwjuldcmrLqr3wHVBDyaUHxQz4U5"
    "03jy5FZZMBqfZ1ai7T84+VtNVEqOsZy1YEoS0HT2oIOGuJTbOMNNOei+9KSNplk1hBysbnrx"
    "cHiAACQBAP7swhMTmik83t0OKCNq/LuBP2uDF9N8w/rG/IIZ8Fyyg3URvG8Qsyn5fsTK4z/+"
    "Ac2a5GNhCTvm45Lim4N+455K18YlVkq0Q269txzrIUA6epljSPzP8V/Anx4CglIKVyKVFCzo"
    "K4zOWqZjOb3GILGcBFCzIfjTXIQEkTpvjSdNde7jqazktWnmt7tff8G+OjzPFOhP7bQkMhj+"
    "HwrQ2epQz4tTmF6kopBprnnbsUMh0BlKCX9mfo2OvvQWeJ4ANjUh6no9Rh3Ppdx7nOSxyRwa"
    "xjFKPz/xmn3SBlYz0MTJM89XvGnIyhSDKGKNa06UnjPicsPziBdGW/ZMXHo0dEPqO/hSroso"
    "ghStYUj59oiYh412xO/Ly9lb0BKFT5dNiBBMAACKb/iLiSHndn+g3j488tkvH12jbp24BDd4"
    "BVAwbATbVEIMwfC78rrBGs2I4gqZa6TRGNasiFdZrSsK8IxtXsCC2rvTU8f7XMQMmFllXCQF"
    "VcYFClhO+HZNtZuKOvCy5V0fKEvzewU0UT93RSel2y8d6H9ByABr9y5Fywv5ZjEZ3FVdhkgD"
    "MfhkYs/LcRs77zqKh1qAAA=="
)
_Y_SHA = "6463429f2d8bfcbf600d6c7ca4694c05f07290f0dedc3b8040422f09b7edb4e9"
_U_SHA = "e834fdc9431b2560f0a2ef6de6c2ef68c4fb9d2f4eb9b434ce894f6b13b2b5fa"
_V_SHA = "8cbdfa6b6a30439d0fd631f59a747bc3d37ad95078abd589583ef34dae2fd433"


def _fixture_bytes() -> bytes:
    return base64.b64decode(_FIXTURE_B64)


def _vp8_chunk(data: bytes) -> bytes:
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise KeyError("no VP8 chunk")


# --- libwebp ctypes oracle (test scaffolding; None when unavailable) ---------


def _load_oracle():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None

    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)

    class Oracle:
        @staticmethod
        def encode(img: np.ndarray, quality: float = 75.0) -> bytes:
            h, w, _ = img.shape
            img = np.ascontiguousarray(img)
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = lib.WebPEncodeRGB(
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out),
            )
            assert n > 0
            data = ctypes.string_at(out, n)
            lib.WebPFree(out)
            return data

        @staticmethod
        def decode_yuv(data: bytes):
            W = ctypes.c_int()
            H = ctypes.c_int()
            u = ctypes.POINTER(ctypes.c_uint8)()
            v = ctypes.POINTER(ctypes.c_uint8)()
            stride = ctypes.c_int()
            uvs = ctypes.c_int()
            yp = lib.WebPDecodeYUV(
                data, ctypes.c_size_t(len(data)),
                ctypes.byref(W), ctypes.byref(H), ctypes.byref(u),
                ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uvs),
            )
            assert yp
            h, w = H.value, W.value
            cw, ch = (w + 1) // 2, (h + 1) // 2
            y = np.ctypeslib.as_array(yp, shape=(h, stride.value))[:, :w].copy()
            uu = np.ctypeslib.as_array(u, shape=(ch, uvs.value))[:, :cw].copy()
            vv = np.ctypeslib.as_array(v, shape=(ch, uvs.value))[:, :cw].copy()
            lib.WebPFree(yp)
            return y, uu, vv

    return Oracle


_ORACLE = _load_oracle()
needs_libwebp = pytest.mark.skipif(
    _ORACLE is None, reason="libwebp shared library unavailable"
)


# --- embedded-fixture gates (no system library needed) ------------------------


def test_embedded_fixture_pinned_planes():
    chunk = _vp8_chunk(_fixture_bytes())
    assert vp8_dimensions(chunk) == (48, 36)
    y, u, v = decode_vp8(chunk)
    assert y.shape == (36, 48) and u.shape == (18, 24) and v.shape == (18, 24)
    assert hashlib.sha256(y.tobytes()).hexdigest() == _Y_SHA
    assert hashlib.sha256(u.tobytes()).hexdigest() == _U_SHA
    assert hashlib.sha256(v.tobytes()).hexdigest() == _V_SHA


def test_embedded_fixture_rgb_shape_and_determinism():
    chunk = _vp8_chunk(_fixture_bytes())
    a = decode_vp8_rgb(chunk)
    b = decode_vp8_rgb(chunk)
    assert a.shape == (36, 48, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)


def test_decode_webp_routes_lossy_container():
    from fs_schema_validator_ray.functions.webp import decode_webp

    rgb = decode_webp(_fixture_bytes())
    assert rgb.shape == (36, 48, 3)
    assert np.array_equal(rgb, decode_vp8_rgb(_vp8_chunk(_fixture_bytes())))


# --- totality: malformed payloads raise Vp8Error, never untyped ---------------


def test_malformed_payloads_raise_typed():
    chunk = _vp8_chunk(_fixture_bytes())
    with pytest.raises(Vp8Error):
        decode_vp8(b"")
    with pytest.raises(Vp8Error, match="start code"):
        decode_vp8(chunk[:3] + b"xyz" + chunk[6:])
    # interframe tag bit set
    with pytest.raises(Vp8Error, match="key frame"):
        decode_vp8(bytes([chunk[0] | 1]) + chunk[1:])
    # first-partition size pointing past the end
    big = bytearray(chunk)
    big[0] = chunk[0] | 0xE0
    big[1] = 0xFF
    big[2] = 0xFF
    with pytest.raises(Vp8Error, match="partition"):
        decode_vp8(bytes(big))
    # zero dimensions
    zed = bytearray(chunk)
    zed[6] = zed[7] = 0
    with pytest.raises(Vp8Error, match="dimension"):
        decode_vp8(bytes(zed))


def test_fuzz_truncations_total():
    """Every truncation of a valid stream raises Vp8Error or decodes to
    the right-sized planes (zero-padded tail reads are spec-legal) —
    never an untyped exception."""
    chunk = _vp8_chunk(_fixture_bytes())
    for cut in range(0, len(chunk), 37):
        try:
            y, u, v = decode_vp8(chunk[:cut])
            assert y.shape == (36, 48)
        except Vp8Error:
            pass


def test_fuzz_random_bytes_total():
    rng = np.random.default_rng(13)
    for n in (0, 3, 10, 64, 300):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            decode_vp8(blob)
        except Vp8Error:
            pass
    # random corruption of a valid stream: typed error or a decode
    chunk = bytearray(_vp8_chunk(_fixture_bytes()))
    for _ in range(25):
        at = int(rng.integers(10, len(chunk)))
        old = chunk[at]
        chunk[at] = int(rng.integers(0, 256))
        try:
            decode_vp8(bytes(chunk))
        except Vp8Error:
            pass
        chunk[at] = old


# --- live bit-exact conformance vs libwebp ------------------------------------


def _test_images():
    rng = np.random.default_rng(42)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    photo = (
        np.stack(
            [
                128 + 60 * np.sin(xx / 7) * np.cos(yy / 9),
                128 + 80 * np.sin((xx + yy) / 11),
                128 + 50 * np.cos(xx * yy / 300),
            ],
            -1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )
    return [
        ("photo64", photo),
        ("noise48x32", rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)),
        ("odd37x23", rng.integers(0, 256, (23, 37, 3)).astype(np.uint8)),
        ("flat", np.full((16, 16, 3), 200, np.uint8)),
    ]


@needs_libwebp
@pytest.mark.parametrize("quality", [95.0, 75.0, 40.0, 10.0])
def test_bit_exact_vs_libwebp(quality):
    for name, img in _test_images():
        data = _ORACLE.encode(img, quality)
        oy, ou, ov = _ORACLE.decode_yuv(data)
        my, mu, mv = decode_vp8(_vp8_chunk(data))
        assert np.array_equal(oy, my), f"{name} q{quality}: Y plane differs"
        assert np.array_equal(ou, mu), f"{name} q{quality}: U plane differs"
        assert np.array_equal(ov, mv), f"{name} q{quality}: V plane differs"


@needs_libwebp
def test_reference_fixture_bit_exact():
    fx = Path("/root/reference/tests/fixtures/image.webp")
    if not fx.exists():
        pytest.skip("reference fixture unavailable")
    data = fx.read_bytes()
    oy, ou, ov = _ORACLE.decode_yuv(data)
    my, mu, mv = decode_vp8(_vp8_chunk(data))
    assert my.shape == (400, 400)
    assert np.array_equal(oy, my)
    assert np.array_equal(ou, mu)
    assert np.array_equal(ov, mv)


@needs_libwebp
def test_rgb_conversion_close_to_libwebp():
    """RGB output uses our own fancy-upsample + fixed-point BT.601; it
    need not be bit-identical to libwebp's RGB path, but must be within
    a hair (the YUV planes themselves ARE bit-exact)."""
    import ctypes

    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _, img = _test_images()[0]
    data = _ORACLE.encode(img, 75.0)
    W = ctypes.c_int()
    H = ctypes.c_int()
    p = lib.WebPDecodeRGB(data, ctypes.c_size_t(len(data)),
                          ctypes.byref(W), ctypes.byref(H))
    orgb = np.ctypeslib.as_array(p, shape=(H.value, W.value, 3)).copy()
    lib.WebPFree(p)
    mrgb = decode_vp8_rgb(_vp8_chunk(data))
    diff = np.abs(orgb.astype(int) - mrgb.astype(int))
    assert diff.max() <= 2
    mse = float((diff.astype(float) ** 2).mean())
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr >= 49.0


# --- from-scratch encoder round-trips ------------------------------------------


def _enc_img():
    rng = np.random.default_rng(9)
    xx, yy = np.meshgrid(np.arange(48), np.arange(36))
    return (
        np.stack(
            [
                128 + 70 * np.sin(xx / 6) * np.cos(yy / 5),
                (xx * 5 + yy * 3) % 256,
                rng.integers(0, 256, (36, 48)),
            ],
            -1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_encoder_self_roundtrip_quality_ladder():
    from fs_schema_validator_ray.functions.vp8 import (
        encode_vp8,
        rgb_to_yuv420,
    )

    img = _enc_img()
    sy, _, _ = rgb_to_yuv420(img)
    last_size = None
    for q, floor_db in ((0, 45.0), (4, 40.0), (20, 30.0)):
        chunk = encode_vp8(img, q)
        y, u, v = decode_vp8(chunk)
        assert y.shape == (36, 48)
        mse = float(((y.astype(float) - sy) ** 2).mean())
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        assert psnr >= floor_db, f"q{q}: {psnr:.1f} dB"
        if last_size is not None:
            assert len(chunk) < last_size  # coarser q → smaller stream
        last_size = len(chunk)


def test_encoder_deterministic_and_odd_dims():
    from fs_schema_validator_ray.functions.vp8 import encode_webp_lossy

    img = _enc_img()[:23, :37]
    a = encode_webp_lossy(img, 8)
    assert a == encode_webp_lossy(img, 8)
    from fs_schema_validator_ray.functions.webp import decode_webp

    rgb = decode_webp(a)
    assert rgb.shape == (23, 37, 3)


@needs_libwebp
def test_libwebp_decodes_our_streams_bit_exactly():
    """Interop in the ENCODE direction: libwebp must reconstruct our
    from-scratch streams to exactly the planes our own decoder
    produces (both implement the same normative inverse path)."""
    from fs_schema_validator_ray.functions.vp8 import (
        encode_vp8,
        encode_webp_lossy,
    )

    for img in (_enc_img(), _enc_img()[:17, :29]):
        for q in (0, 12, 40):
            data = encode_webp_lossy(img, q)
            oy, ou, ov = _ORACLE.decode_yuv(data)
            my, mu, mv = decode_vp8(encode_vp8(img, q))
            assert np.array_equal(oy, my)
            assert np.array_equal(ou, mu)
            assert np.array_equal(ov, mv)
