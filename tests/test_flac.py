"""From-scratch FLAC codec (``functions/flac.py``): losslessness is THE
gate — decode(encode(x)) must equal x bit-exactly — plus the three
integrity layers (header CRC-8, frame CRC-16, stream MD5), the Rice
raw-escape path, and hand-built frames for the decoder-only grammar
(LPC subframes, stereo left-side / right-side / mid-side coding)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fs_schema_validator_ray.functions.flac import (
    FlacError,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
    flac_streaminfo,
)


def _roundtrip(x: np.ndarray, sr: int = 16000) -> bytes:
    blob = encode_flac(x, sr)
    y, sr2 = decode_flac(blob)
    assert sr2 == sr
    assert np.array_equal(y.astype(np.int16), x)
    return blob


def test_lossless_roundtrip_ladder():
    rng = np.random.default_rng(1)
    cases = [
        np.zeros(5000, np.int16),
        (3000 * np.sin(np.arange(20000) * 0.05)).astype(np.int16),
        rng.integers(-32768, 32768, 12345).astype(np.int16),  # rice escape
        np.arange(-5000, 5000, dtype=np.int16),
        np.array([1, -1, 32767, -32768], np.int16),
        np.array([7], np.int16),
        rng.integers(-100, 100, 4096).astype(np.int16),  # exact block
        rng.integers(-100, 100, 4097).astype(np.int16),  # block + 1
        np.zeros(0, np.int16),  # empty stream: header-only
    ]
    for x in cases:
        _roundtrip(x)


def test_compression_actually_compresses():
    t = np.arange(30000)
    smooth = (8000 * np.sin(t * 0.01)).astype(np.int16)
    blob = encode_flac(smooth, 8000)
    assert len(blob) < 2 * len(smooth) * 0.3  # < 30% of raw PCM16


def test_multiframe_utf8_frame_numbers():
    # > 128 blocks forces multi-byte coded frame numbers
    rng = np.random.default_rng(2)
    x = rng.integers(-50, 50, 4096 * 130 + 7).astype(np.int16)
    _roundtrip(x, 44100)
    assert _utf8_coded(0) == b"\x00"
    assert _utf8_coded(127) == b"\x7f"
    assert _utf8_coded(128) == b"\xc2\x80"  # standard UTF-8 agreement
    assert _utf8_coded(0x7FF) == b"\xdf\xbf"
    assert _utf8_coded(0x800) == b"\xe0\xa0\x80"


def test_streaminfo_fields():
    x = np.arange(100, dtype=np.int16)
    info = flac_streaminfo(encode_flac(x, 3000))
    assert info["sr_hz"] == 3000
    assert info["channels"] == 1
    assert info["bits"] == 16
    assert info["total_samples"] == 100
    assert info["md5"] == hashlib.md5(x.astype("<i2").tobytes()).digest()


def test_integrity_layers_detect_corruption():
    x = (3000 * np.sin(np.arange(9000) * 0.02)).astype(np.int16)
    good = encode_flac(x, 16000)
    info = flac_streaminfo(good)
    frames_at = info["frames_at"]
    # frame body flip → CRC-16 (or header CRC-8) must catch it
    for at in (frames_at + 3, frames_at + 40, len(good) - 5):
        bad = bytearray(good)
        bad[at] ^= 0x10
        with pytest.raises(FlacError):
            decode_flac(bytes(bad))
    # MD5 flip in STREAMINFO → stream-level mismatch
    bad = bytearray(good)
    bad[frames_at - 5] ^= 0xFF
    with pytest.raises(FlacError, match="md5"):
        decode_flac(bytes(bad))
    # verify_md5=False skips only the md5 layer
    y, _ = decode_flac(bytes(bad), verify_md5=False)
    assert np.array_equal(y.astype(np.int16), x)


def test_fuzz_totality():
    rng = np.random.default_rng(3)
    good = encode_flac(rng.integers(-500, 500, 5000).astype(np.int16), 8000)
    for cut in range(0, len(good), 97):
        try:
            decode_flac(good[:cut])
        except FlacError:
            pass
    for _ in range(30):
        blob = rng.integers(0, 256, int(rng.integers(0, 400)), dtype=np.uint8)
        try:
            decode_flac(b"fLaC" + blob.tobytes())
        except FlacError:
            pass
        try:
            decode_flac(blob.tobytes())
        except FlacError:
            pass


# --- hand-built frames for decoder-only grammar --------------------------------


def _streaminfo_block(sr, ch, bps, total, md5: bytes) -> bytes:
    w = _BitWriter()
    w.write(1, 1)
    w.write(0, 7)
    w.write(34, 24)
    w.write(16, 16)
    w.write(65535, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    return b"fLaC" + w.getvalue() + md5


def _frame_header(bs, sr, ch_code, bps_code) -> bytearray:
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit block size at end
    w.write(13, 4)  # 16-bit sample rate at end
    w.write(ch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(bs - 1, 16)
    w.write(sr, 16)
    w.align()
    hdr = bytearray(w.getvalue())
    hdr.append(_crc8(hdr))
    return hdr


def _verbatim_subframe(w: _BitWriter, samples, eff: int) -> None:
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    for s in samples:
        w.write(int(s) & ((1 << eff) - 1), eff)


def _finish_frame(hdr: bytearray, body: _BitWriter) -> bytes:
    body.align()
    frame = bytes(hdr) + body.getvalue()
    c = _crc16(frame)
    return frame + bytes([c >> 8, c & 0xFF])


def _stereo_md5(l, r) -> bytes:
    inter = np.stack([l, r], axis=1).astype("<i2").tobytes()
    return hashlib.md5(inter).digest()


@pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
def test_stereo_side_codings(mode):
    rng = np.random.default_rng(7)
    n = 64
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    side = left - right
    if mode == "left-side":
        ch_code, subs = 8, [(left, 16), (side, 17)]
    elif mode == "right-side":
        ch_code, subs = 9, [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        ch_code, subs = 10, [(mid, 16), (side, 17)]
    hdr = _frame_header(n, 8000, ch_code, 0b100)
    body = _BitWriter()
    for samples, eff in subs:
        _verbatim_subframe(body, samples, eff)
    stream = _streaminfo_block(8000, 2, 16, n, _stereo_md5(left, right))
    stream += _finish_frame(hdr, body)
    out, sr = decode_flac(stream)
    assert sr == 8000 and out.shape == (n, 2)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_lpc_subframe_decodes():
    """Hand-built LPC order-2 frame; expected samples derived by the
    spec recurrence independently in the test."""
    n = 32
    warm = [120, -75]
    coefs = [5, -3]  # 4-bit signed precision
    shift = 2
    res = list(np.arange(n - 2) % 7 - 3)
    expect = list(warm)
    for i in range(2, n):
        pred = (coefs[0] * expect[i - 1] + coefs[1] * expect[i - 2]) >> shift
        expect.append(res[i - 2] + pred)
    expect = np.array(expect, np.int64)

    hdr = _frame_header(n, 8000, 0, 0b100)  # mono, 16-bit
    body = _BitWriter()
    body.write(0, 1)
    body.write(32 | (2 - 1), 6)  # LPC order 2
    body.write(0, 1)
    for s in warm:
        body.write(int(s) & 0xFFFF, 16)
    body.write(3, 4)  # precision - 1 = 3 → 4-bit coefficients
    body.write(shift, 5)
    for c in coefs:
        body.write(int(c) & 0xF, 4)
    body.write(0, 2)  # 4-bit rice
    body.write(0, 4)  # partition order 0
    body.write(2, 4)  # rice k = 2
    from fs_schema_validator_ray.functions.flac import _rice_bit_array

    body.write_bit_array(_rice_bit_array(np.array(res, np.int64), 2))
    md5 = hashlib.md5(expect.astype("<i2").tobytes()).digest()
    stream = _streaminfo_block(8000, 1, 16, n, md5) + _finish_frame(hdr, body)
    out, sr = decode_flac(stream)
    assert np.array_equal(out.astype(np.int64), expect)


def test_wasted_bits_subframe():
    """Constant subframe with 3 wasted bits: output = value << 3."""
    n = 24
    val = -51  # within 13 effective bits
    hdr = _frame_header(n, 8000, 0, 0b100)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0, 6)  # CONSTANT
    body.write(1, 1)  # wasted bits flag
    body.write(0b001, 3)  # unary 2 → wasted = 3
    body.write(val & ((1 << 13) - 1), 13)
    expect = np.full(n, val << 3, np.int64)
    md5 = hashlib.md5(expect.astype("<i2").tobytes()).digest()
    stream = _streaminfo_block(8000, 1, 16, n, md5) + _finish_frame(hdr, body)
    out, _ = decode_flac(stream)
    assert np.array_equal(out.astype(np.int64), expect)


# --- audio.py integration -------------------------------------------------------


def test_audio_codec_dispatch():
    from fs_schema_validator_ray import audio

    x = audio.reference_signal("clip-x", 8000, 500)
    blob = audio.encode(x, 8000, "flac")
    assert blob[:4] == b"fLaC"
    assert audio.sniff_codec(blob) == "flac"
    y, sr, codec = audio.decode(blob)
    assert sr == 8000 and codec == "flac"
    # flac is lossless over the int16 quantization grid — same SNR class
    # as pcm_s16le
    assert audio.snr_db(x, y) > 60.0
    with pytest.raises(audio.AudioDecodeError):
        audio.decode(b"fLaC" + b"\x00" * 30)


def test_transcode_stage_flac(ray_session):
    import pyarrow as pa

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import TranscodeStage

    clips = [
        audio.encode(audio.reference_signal(f"c{i}", 8000, 400), 8000, c)
        for i, c in enumerate(["pcm_s16le", "ulaw", "alaw"])
    ]
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c"]),
            "bytes": pa.array(clips, pa.binary()),
        }
    )
    out = TranscodeStage(codec_out="flac")(batch).to_pylist()
    assert all(r["decode_ok"] for r in out)
    assert all(r["bytes"][:4] == b"fLaC" for r in out)
    # flac re-encode of the DECODED samples is exact → SNR inf-ish
    assert all(r["snr_db"] > 90 or r["snr_db"] == float("inf") for r in out)
