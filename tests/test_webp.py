"""From-scratch VP8L (lossless WebP) codec: encode→decode round-trips
across every stream kind (plain literals, subtract-green, predictor
blocks, palette with sub-byte bundling, color cache, LZ77 runs),
transform-math unit checks against independent numpy forward models,
malformed-payload rejection, and the stage/corpus integration."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from fs_schema_validator_ray.functions.webp import (
    WebpError,
    WebpLossyError,
    _ct_delta,
    _distance_map,
    decode_webp,
    encode_webp,
    parse_vp8l_dims,
)


def _vp8_lossy_body(w, h):
    """Minimal lossy-VP8 chunk body: 3-byte frame tag + 9D 01 2A start
    code + 14-bit dims (enough for header parsing; no coefficient data)."""
    return b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)


def rand_img(h, w, seed=0, colors=None):
    rng = np.random.default_rng(seed)
    if colors is not None:
        pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
        return pal[rng.integers(0, colors, size=(h, w))]
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (3, 17), (16, 16), (41, 23)])
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"lz77": False},
        {"subtract_green": True},
        {"predictor": True},
        {"subtract_green": True, "predictor": True},
        {"color_cache_bits": 4},
        {"color_cache_bits": 8, "subtract_green": True},
    ],
)
def test_roundtrip(shape, kwargs):
    img = rand_img(*shape, seed=sum(shape))
    assert np.array_equal(decode_webp(encode_webp(img, **kwargs)), img)


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 17, 200, 256])
def test_palette_roundtrip_incl_bundling(ncol):
    img = rand_img(11, 27, seed=ncol, colors=ncol)
    data = encode_webp(img, palette=True)
    assert np.array_equal(decode_webp(data), img)


def test_lz77_runs_and_cache_interaction():
    img = np.zeros((24, 40, 3), np.uint8)
    img[3:9] = (10, 200, 30)
    img[:, 7] = (99, 1, 99)
    img[20, ::2] = (5, 5, 5)
    for kw in ({}, {"color_cache_bits": 3}):
        assert np.array_equal(decode_webp(encode_webp(img, **kw)), img)


def test_parse_dims_and_container():
    img = rand_img(19, 33, seed=7)
    data = encode_webp(img)
    assert parse_vp8l_dims(data) == (33, 19)
    out = decode_webp(data)
    assert out.shape == (19, 33, 3)


def test_distance_map_matches_published_prefix():
    """The generated close-neighbor table must reproduce the spec's
    published ordering (checked against the d²≤25 prefix, including the
    (0,5),(3,4),(-3,4),(4,3),(-4,3),(5,0) tie-break group)."""
    m = _distance_map()
    assert len(m) == 120
    assert m[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert m[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]


def test_color_transform_delta_math():
    """Inverse math matches the spec's signed-int8 product >> 5 on the
    full corner set."""
    for t in (0, 1, 127, 128, 255):
        for c in (0, 1, 127, 128, 255):
            st = t - 256 if t >= 128 else t
            sc = c - 256 if c >= 128 else c
            assert _ct_delta(t, c) == (st * sc) >> 5


def test_malformed_payloads_raise_typed_errors():
    img = rand_img(9, 9, seed=3)
    good = encode_webp(img)
    with pytest.raises(WebpError, match="container"):
        decode_webp(b"NOTRIFF" + good)
    with pytest.raises(WebpError):
        decode_webp(good[:15])
    # truncate the VP8L body: bitstream runs dry mid-decode
    i = good.index(b"VP8L")
    (ln,) = struct.unpack("<I", good[i + 4 : i + 8])
    cut = bytearray(good[: i + 8 + ln // 2])
    struct.pack_into("<I", cut, i + 4, ln // 2)
    struct.pack_into("<I", cut, 4, len(cut) - 8)
    with pytest.raises(WebpError):
        decode_webp(bytes(cut))
    # bad signature byte inside the chunk
    bad = bytearray(good)
    bad[i + 8] = 0x30
    with pytest.raises(WebpError, match="signature byte"):
        decode_webp(bytes(bad))
    # garbage lossy VP8 chunk → routed to the vp8 decoder, whose typed
    # Vp8Error wraps back into WebpError (decode_webp totality holds)
    lossy = good[:12] + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    lossy = lossy[:4] + struct.pack("<I", len(lossy) - 8) + lossy[8:]
    with pytest.raises(WebpError, match="lossy"):
        decode_webp(lossy)


def test_fuzz_totality():
    """Random garbage and random truncations of valid streams must raise
    WebpError — never an untyped exception (one bad row must not kill a
    map_batches task)."""
    rng = np.random.default_rng(11)
    img = rand_img(14, 14, seed=5)
    good = encode_webp(img, color_cache_bits=4)
    for k in range(60):
        n = int(rng.integers(0, len(good)))
        data = bytes(good[:n])
        try:
            decode_webp(data)
        except WebpError:
            pass
    for k in range(60):
        data = bytearray(good)
        for _ in range(4):
            data[int(rng.integers(12, len(data)))] ^= int(rng.integers(1, 256))
        try:
            decode_webp(bytes(data))
        except WebpError:
            pass


def test_validate_stage_gates_webp():
    """Stage integration: corrupt VP8L emits the reference's invalid-
    image reason; lossy VP8 passes header checks without a deep gate."""
    from fs_schema_validator_ray.sources.images import corrupt_webp_stream
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    good = encode_webp(rand_img(8, 12, seed=1))
    corrupt = corrupt_webp_stream(good)
    lossy = good[:12] + b"VP8 " + struct.pack("<I", 10) + _vp8_lossy_body(12, 8)
    lossy = lossy[:4] + struct.pack("<I", len(lossy) - 8) + lossy[8:]
    batch = pa.table(
        {
            "key": pa.array(["good", "bad", "lossy"]),
            "bytes": pa.array([good, corrupt, lossy], pa.binary()),
            "format": pa.array(["webp"] * 3),
        }
    )
    stage = ImageValidateStage(min_width=0, min_height=0)
    got = {(r["key"], r["reason"]) for r in stage(batch).to_pylist()}
    assert got == {("bad", "file does not contain a valid image")}


def test_hybrid_decoder_real_vp8l_fake_lossy():
    from fs_schema_validator_ray.stages.multimodal import HybridPixelDecoder

    img = rand_img(10, 10, seed=9)
    dec = HybridPixelDecoder()
    out = dec(encode_webp(img), "webp", (10, 10))
    assert np.array_equal(out, img)  # REAL pixels, not the fake
    lossy = encode_webp(img)[:12] + b"VP8 " + struct.pack("<I", 10) + _vp8_lossy_body(10, 10)
    lossy = lossy[:4] + struct.pack("<I", len(lossy) - 8) + lossy[8:]
    fake = dec(lossy, "webp", (10, 10))
    assert fake.shape[2] == 3  # deterministic fake fallback, no raise


def test_meta_prefix_groups_roundtrip():
    """Meta-prefix (entropy-image) group selection: the encoder emits a
    two-group checkerboard; the decoder must pick the right huffman
    group per pixel position."""
    rng = np.random.default_rng(2)
    for shape in [(5, 6), (16, 16), (33, 21), (7, 40)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp(img, meta_blocks=True)), img)
    with pytest.raises(ValueError, match="literal-only"):
        from fs_schema_validator_ray.functions.webp import _write_entropy_image, _BitWriter

        _write_entropy_image(
            _BitWriter(), np.zeros(4, np.uint32), 2, True, cache_bits=3, meta_bits=2
        )


# --- ALPH alpha plane (extended VP8X container) ------------------------------


def _alpha_plane(h, w, seed=0):
    rng = np.random.default_rng(seed)
    a = np.zeros((h, w), np.uint8)
    a[:, : w // 3] = 255
    a[h // 4 : h // 2, w // 3 :] = (
        np.arange(w - w // 3, dtype=np.uint32)[None, :] * 13 % 256
    ).astype(np.uint8)
    a[h // 2 :, w // 2 :] = rng.integers(0, 256, (h - h // 2, w - w // 2), np.uint8)
    return a


@pytest.mark.parametrize("filter_method", [0, 1, 2, 3])
@pytest.mark.parametrize("compress", [False, True])
def test_alpha_roundtrip(filter_method, compress):
    from fs_schema_validator_ray.functions.webp import (
        decode_webp_alpha,
        encode_webp_alpha,
        webp_canvas_dims,
    )

    a = _alpha_plane(29, 43, seed=filter_method)
    blob = encode_webp_alpha(a, filter_method=filter_method, compress=compress)
    assert webp_canvas_dims(blob) == (43, 29)
    out = decode_webp_alpha(blob)
    assert np.array_equal(out, a)
    # the main (VP8L) image still decodes through the VP8X container
    assert decode_webp(blob).shape == (29, 43, 3)


def test_alpha_absent_returns_none():
    from fs_schema_validator_ray.functions.webp import decode_webp_alpha

    assert decode_webp_alpha(encode_webp(rand_img(6, 6, seed=4))) is None


def test_alpha_reference_fixture_interop():
    """REAL-FILE interop: the reference's own webp fixture
    (``/root/reference/tests/fixtures/image.webp``, VP8X + ALPH + VP8,
    produced by libwebp — see ``schemas/image.py:15-22`` for the
    reference's PIL validation of it) carries a VP8L-compressed,
    filtered alpha plane. Our from-scratch headerless-VP8L + unfilter
    path must decode it bit-exactly (pinned digest): a single
    arithmetic/prefix-code desync would scramble the plane."""
    import hashlib
    from pathlib import Path

    from fs_schema_validator_ray.functions.webp import (
        decode_webp_alpha,
        webp_canvas_dims,
    )

    fx = Path("/root/reference/tests/fixtures/image.webp")
    if not fx.exists():  # sandbox without the reference checkout
        pytest.skip("reference fixture unavailable")
    data = fx.read_bytes()
    assert webp_canvas_dims(data) == (400, 400)
    # the lossy-VP8 RGB plane decodes for real since round 4 (the
    # bit-exact-vs-libwebp gate lives in tests/test_vp8.py)
    rgb = decode_webp(data)
    assert rgb.shape == (400, 400, 3) and rgb.dtype == np.uint8
    al = decode_webp_alpha(data)
    assert al is not None and al.shape == (400, 400)
    # a transparent-background logo: mostly 0, a few opaque pixels,
    # an antialiased edge in between
    assert int((al == 0).sum()) == 159_656
    assert int((al == 255).sum()) == 268
    assert int(((al > 0) & (al < 255)).sum()) == 76
    assert (
        hashlib.sha256(al.tobytes()).hexdigest()
        == "c7b672a9fc4a13ee464f198e5870a7e47dbbfcd7fa9722ca4ba979de96c13be2"
    )


def test_alpha_malformed_raises_typed():
    from fs_schema_validator_ray.functions.webp import (
        decode_webp_alpha,
        encode_webp_alpha,
    )

    a = _alpha_plane(11, 17, seed=9)
    good = encode_webp_alpha(a, filter_method=3, compress=True)
    i = good.index(b"ALPH")
    (ln,) = struct.unpack("<I", good[i + 4 : i + 8])
    # corrupt compressed stream bytes → prefix-code/bitstream failure
    rng = np.random.default_rng(1)
    for _ in range(30):
        bad = bytearray(good)
        for _ in range(3):
            bad[i + 9 + int(rng.integers(0, ln - 1))] ^= int(rng.integers(1, 256))
        try:
            out = decode_webp_alpha(bytes(bad))
            assert out is None or out.shape == (11, 17)  # may still decode
        except WebpError:
            pass
    # invalid compression method (C=2)
    bad = bytearray(good)
    bad[i + 8] = (bad[i + 8] & ~3) | 2
    with pytest.raises(WebpError, match="compression method"):
        decode_webp_alpha(bytes(bad))
    # raw chunk shorter than w*h
    raw = encode_webp_alpha(a, compress=False)
    j = raw.index(b"ALPH")
    (rln,) = struct.unpack("<I", raw[j + 4 : j + 8])
    cut = bytearray(raw[: j + 8 + rln // 2])
    struct.pack_into("<I", cut, j + 4, rln // 2)
    struct.pack_into("<I", cut, 4, len(cut) - 8)
    with pytest.raises(WebpError, match="shorter"):
        decode_webp_alpha(bytes(cut))


def test_validate_stage_gates_alpha():
    """A lossy-VP8 + ALPH container (the reference fixture's shape) is
    gated on its REAL alpha decode: corrupt ALPH → invalid-image
    violation even though the lossy RGB plane itself is only
    header-checked."""
    from fs_schema_validator_ray.functions.webp import encode_webp_alpha
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    a = _alpha_plane(12, 16, seed=2)
    full = encode_webp_alpha(a, filter_method=1, compress=True)
    # swap the VP8L image chunk for a lossy VP8 header-only chunk
    i = full.index(b"VP8L")
    lossy_body = _vp8_lossy_body(16, 12)
    lossy = full[:i] + b"VP8 " + struct.pack("<I", len(lossy_body)) + lossy_body
    lossy = lossy[:4] + struct.pack("<I", len(lossy) - 8) + lossy[8:]
    # corrupt variant: garbage compressed alpha stream
    j = lossy.index(b"ALPH")
    (ln,) = struct.unpack("<I", lossy[j + 4 : j + 8])
    corrupt = bytearray(lossy)
    corrupt[j + 9 : j + 8 + ln] = b"\xff" * (ln - 1)
    batch = pa.table(
        {
            "key": pa.array(["ok", "badalpha"]),
            "bytes": pa.array([lossy, bytes(corrupt)], pa.binary()),
            "format": pa.array(["webp"] * 2),
        }
    )
    stage = ImageValidateStage(min_width=0, min_height=0)
    got = {(r["key"], r["reason"]) for r in stage(batch).to_pylist()}
    assert got == {("badalpha", "file does not contain a valid image")}
