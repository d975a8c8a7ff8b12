"""Audio payload codecs + deterministic reference synthesis.

The data-plane analogue of the reference's byte-wise payload validators
(images `/root/reference/fs_schema_validator/schemas/image.py`, glTF
`schemas/gltf.py`, zip `schemas/zip.py`): a clip's ``bytes`` column holds a
RIFF/WAVE container whose fmt tag declares the actual codec — the header
plays the role of the image magic bytes (declared-vs-actual format
mismatch detection), decode failure the role of glTF deserialization
errors, and SNR-vs-reference the role of the zip CRC sweep.

Codecs are implemented with numpy only (no soundfile in the sandbox):

* ``pcm_s16le`` — 16-bit little-endian PCM (WAVE format tag 1)
* ``pcm_u8``   — 8-bit unsigned PCM (format tag 1, 8 bits)
* ``ulaw``     — ITU-T G.711 μ-law companding (format tag 7)
* ``alaw``     — ITU-T G.711 A-law companding (format tag 6)

The reference PCM for the SNR ≥ 30 dB invariant is re-synthesizable from
``clip_id`` alone (seeded sine + noise mixture), so workers never need a
second copy of the corpus.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class AudioDecodeError(ValueError):
    """Payload cannot be parsed as a RIFF/WAVE container."""


CODECS = ("pcm_s16le", "pcm_u8", "ulaw", "alaw")

_FMT_PCM = 1
_FMT_ALAW = 6
_FMT_ULAW = 7

_MU = 255.0
_A = 87.6
_LN_A = 1.0 + np.log(_A)


# --- G.711-style companding (continuous-law variants, numpy-vectorized) ----


def _ulaw_compress(x: np.ndarray) -> np.ndarray:
    """float [-1,1] → uint8 μ-law code."""
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.clip(np.round((y + 1.0) * 127.5), 0, 255).astype(np.uint8)


def _ulaw_expand(code: np.ndarray) -> np.ndarray:
    y = code.astype(np.float64) / 127.5 - 1.0
    return np.sign(y) * np.expm1(np.abs(y) * np.log1p(_MU)) / _MU


def _alaw_compress(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    small = ax < (1.0 / _A)
    y = np.where(small, _A * ax / _LN_A, (1.0 + np.log(np.maximum(_A * ax, 1.0))) / _LN_A)
    y = np.sign(x) * y
    return np.clip(np.round((y + 1.0) * 127.5), 0, 255).astype(np.uint8)


def _alaw_expand(code: np.ndarray) -> np.ndarray:
    y = code.astype(np.float64) / 127.5 - 1.0
    ay = np.abs(y)
    small = ay < (1.0 / _LN_A)
    x = np.where(small, ay * _LN_A / _A, np.exp(ay * _LN_A - 1.0) / _A)
    return np.sign(y) * x


# --- RIFF/WAVE container ---------------------------------------------------


def encode(samples: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode float samples in [-1, 1] into a mono WAVE payload."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if codec == "pcm_s16le":
        fmt, bits = _FMT_PCM, 16
        data = np.round(x * 32767.0).astype("<i2").tobytes()
    elif codec == "pcm_u8":
        fmt, bits = _FMT_PCM, 8
        data = (np.round((x + 1.0) * 127.5)).clip(0, 255).astype(np.uint8).tobytes()
    elif codec == "ulaw":
        fmt, bits = _FMT_ULAW, 8
        data = _ulaw_compress(x).tobytes()
    elif codec == "alaw":
        fmt, bits = _FMT_ALAW, 8
        data = _alaw_compress(x).tobytes()
    else:
        raise ValueError(f"unknown codec `{codec}`")

    block_align = bits // 8
    byte_rate = sr_hz * block_align
    header = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, fmt, 1, sr_hz, byte_rate, block_align, bits),
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    return header + data


def sniff_codec(payload: bytes) -> str:
    """Identify the actual codec from the container header — the analogue of
    PIL's format detection (reference ``image.py:54-69``)."""
    _, fmt, bits, _, _ = _parse_header(payload)
    return _codec_name(fmt, bits)


def _codec_name(fmt: int, bits: int) -> str:
    if fmt == _FMT_PCM and bits == 16:
        return "pcm_s16le"
    if fmt == _FMT_PCM and bits == 8:
        return "pcm_u8"
    if fmt == _FMT_ULAW:
        return "ulaw"
    if fmt == _FMT_ALAW:
        return "alaw"
    raise AudioDecodeError(f"unknown wave format tag {fmt} ({bits} bits)")


def _parse_header(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Returns (sr_hz, fmt_tag, bits, channels, data)."""
    if len(payload) < 44:
        raise AudioDecodeError(f"payload too short for a wave header ({len(payload)} bytes)")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("payload is not a RIFF/WAVE container")
    pos = 12
    fmt_tag = bits = channels = sr_hz = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if cid == b"fmt ":
            if size < 16 or body_start + 16 > n:
                raise AudioDecodeError("truncated fmt chunk")
            fmt_tag, channels, sr_hz, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
        elif cid == b"data":
            if body_start + size > n:
                raise AudioDecodeError("truncated data chunk")
            data = payload[body_start : body_start + size]
        pos = body_start + size + (size & 1)
    if fmt_tag is None:
        raise AudioDecodeError("missing fmt chunk")
    if data is None:
        raise AudioDecodeError("missing data chunk")
    if channels != 1:
        raise AudioDecodeError(f"only mono supported, got {channels} channels")
    return sr_hz, fmt_tag, bits, channels, data


def decode(payload: bytes) -> tuple[np.ndarray, int, str]:
    """Decode a WAVE payload → (float64 samples in [-1,1], sr_hz, codec)."""
    sr_hz, fmt, bits, _, data = _parse_header(payload)
    codec = _codec_name(fmt, bits)
    if codec == "pcm_s16le":
        if len(data) % 2:
            raise AudioDecodeError("pcm_s16le data length is odd")
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif codec == "pcm_u8":
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
    elif codec == "ulaw":
        x = _ulaw_expand(np.frombuffer(data, dtype=np.uint8))
    else:
        x = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    return x, sr_hz, codec


# --- deterministic reference synthesis ------------------------------------


def _seed_for(clip_id: str) -> int:
    return int.from_bytes(hashlib.blake2s(clip_id.encode(), digest_size=8).digest(), "little")


_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix_uniform(seed: int, n: int) -> np.ndarray:
    """n deterministic uniforms in [0,1): counter-based splitmix64,
    fully vectorized over positions (~ns/elem; no generator object to
    initialize — RNG-object setup was ~40% of the per-row decode cost)."""
    with np.errstate(over="ignore"):
        z = (np.uint64(seed) + np.arange(1, n + 1, dtype=np.uint64) * _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z = z ^ (z >> np.uint64(31))
    return z.astype(np.float64) / 18446744073709551616.0  # 2**64


def reference_signal(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic sine+noise mixture parameterized by ``clip_id`` alone
    (FIXTURES.md §1) — the per-row invariant baseline for SNR ≥ 30 dB.

    All randomness is digest/counter-derived (no RNG object): in the hot
    decode path this function runs once per row, and allocator traffic +
    generator init were the scaling bottleneck at full-node parallelism.
    """
    n = max(0, round(dur_ms * sr_hz / 1000))
    if n == 0:
        return np.zeros(0)
    d = hashlib.blake2s(clip_id.encode(), digest_size=32).digest()
    u = [int.from_bytes(d[i : i + 8], "little") / 2**64 for i in (8, 16, 24)]
    f1 = 80.0 + u[0] * (800.0 - 80.0)
    f2 = 800.0 + u[1] * (min(3800.0, sr_hz / 2.2) - 800.0)
    p1 = u[2] * 2 * np.pi
    p2 = (u[2] * 7919.0) % 1.0 * 2 * np.pi
    # in-place: 0.45*sin(2πf1·t+p1) + 0.25*sin(2πf2·t+p2) + 0.04*noise
    t = np.arange(n, dtype=np.float64)
    t /= sr_hz
    x = t * (2 * np.pi * f1)
    x += p1
    np.sin(x, out=x)
    x *= 0.45
    t *= 2 * np.pi * f2
    t += p2
    np.sin(t, out=t)
    t *= 0.25
    x += t
    noise = _splitmix_uniform(_seed_for(clip_id), n)
    noise -= 0.5
    noise *= 0.08  # uniform ±0.04
    x += noise
    return np.clip(x, -1.0, 1.0, out=x)


_VOCAB = (
    "the quick brown fox jumps over a lazy dog while seven wizards "
    "brew strong coffee under pale moonlight near quiet rivers and old stone bridges"
).split()


def reference_transcript(clip_id: str) -> str:
    """Deterministic transcript derived from ``clip_id`` alone (digest
    bytes → word indices; no RNG object in the hot path)."""
    d = hashlib.blake2s(clip_id.encode() + b"#t", digest_size=16).digest()
    n_words = 3 + d[0] % 8
    nv = len(_VOCAB)
    return " ".join(_VOCAB[(d[1 + i // 2] >> (4 * (i % 2)) | d[15 - i]) % nv]
                    for i in range(n_words))


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of ``decoded`` against ``reference`` in dB."""
    n = min(len(reference), len(decoded))
    if n == 0:
        return float("-inf")
    ref = reference[:n]
    err = ref - decoded[:n]
    p_sig = float(np.dot(ref, ref))
    p_err = float(np.dot(err, err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
