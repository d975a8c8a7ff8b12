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


CODECS = ("pcm_s16le", "pcm_u8", "ulaw", "alaw", "adpcm_ima", "flac")

_FMT_PCM = 1
_FMT_ALAW = 6
_FMT_ULAW = 7
_FMT_IMA_ADPCM = 17  # DVI/IMA ADPCM (WAVE format tag 0x0011)

# IMA ADPCM tables (public spec constants — IMA "Recommended Practices
# for Enhancing Digital Audio Compatibility", also Microsoft WAVE 0x11)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_BLOCK_ALIGN = 256  # 4-byte block header + 252 data bytes → 505 samples

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


# --- IMA ADPCM (4-bit adaptive differential PCM, sequential by nature) ------


def _ima_encode(pcm16: np.ndarray, block_align: int = _IMA_BLOCK_ALIGN) -> bytes:
    """int16 samples → IMA ADPCM block bytes (4-byte header: predictor
    int16, step index u8, reserved u8; then 2 samples per byte, low
    nibble first)."""
    spb = 1 + (block_align - 4) * 2
    n = len(pcm16)
    nb = -(-n // spb)
    blocks = np.zeros((nb, spb), dtype=np.int32)
    blocks.reshape(-1)[:n] = np.asarray(pcm16, dtype=np.int32)
    body, _recon = _ima_encode_blocks(blocks, block_align)
    return body.tobytes()


def _ima_encode_blocks(
    blocks: np.ndarray, block_align: int = _IMA_BLOCK_ALIGN
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-across-blocks core: ``(nb, spb) int32`` samples →
    ``((nb, block_align) uint8 bodies, (nb, spb) int32 reconstruction)``.
    The quantizer is sequential WITHIN a block, but every block header
    restarts (predictor, index) — so the loop runs over the
    samples-per-block axis with numpy vectors ACROSS all blocks (~500
    small vector steps instead of one Python step per sample). The
    returned reconstruction equals the decoder's output exactly (the
    encoder tracks the decoder's predictor), so SNR audits need no
    second decode. Blocks from MANY clips can stack into one call — the
    batching the transcode stage uses."""
    nb, spb = blocks.shape
    steps = _IMA_STEPS.astype(np.int32)
    idx_tab = _IMA_INDEX
    pred = blocks[:, 0].copy()
    # per-block initial step index ≈ the block's mean |first difference|
    # (stored in the header; avoids the slow re-adaptation from step 7
    # that a zero start costs at every block boundary)
    if spb > 1:
        mean_delta = np.abs(np.diff(blocks, axis=1)).mean(axis=1)
        index = np.clip(
            np.searchsorted(_IMA_STEPS, mean_delta), 0, 88
        ).astype(np.int32)
    else:
        index = np.zeros(nb, dtype=np.int32)
    index0 = index.copy()
    recon = np.empty((nb, spb), dtype=np.int32)
    recon[:, 0] = pred
    nibbles = np.zeros((nb, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        step = steps[index]
        delta = blocks[:, t] - pred
        sign = delta < 0
        ad = np.abs(delta)
        c4 = ad >= step
        ad = ad - np.where(c4, step, 0)
        half = step >> 1
        c2 = ad >= half
        ad = ad - np.where(c2, half, 0)
        quarter = step >> 2
        c1 = ad >= quarter
        code = (
            sign.astype(np.uint8) * 8
            + c4.astype(np.uint8) * 4
            + c2.astype(np.uint8) * 2
            + c1.astype(np.uint8)
        )
        # reconstruct exactly like the decoder (predictor tracks it)
        diff = (step >> 3) + np.where(c1, quarter, 0) + np.where(c2, half, 0)
        diff = diff + np.where(c4, step, 0)
        pred = np.clip(np.where(sign, pred - diff, pred + diff), -32768, 32767)
        index = np.clip(index + idx_tab[code & 7], 0, 88)
        nibbles[:, t - 1] = code
        recon[:, t] = pred
    if nibbles.shape[1] & 1:
        nibbles = np.concatenate(
            [nibbles, np.zeros((nb, 1), np.uint8)], axis=1
        )
    packed = nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)
    data_len = block_align - 4
    body = np.zeros((nb, block_align), dtype=np.uint8)
    body[:, 0] = (blocks[:, 0] & 0xFF).astype(np.uint8)
    body[:, 1] = ((blocks[:, 0] >> 8) & 0xFF).astype(np.uint8)
    body[:, 2] = index0.astype(np.uint8)  # per-block quantizer restart
    body[:, 4 : 4 + min(packed.shape[1], data_len)] = packed[:, :data_len]
    return body, recon


def encode_adpcm_many(
    signals: list, sr_list: list[int]
) -> tuple[list[bytes], list[np.ndarray]]:
    """Batch IMA-ADPCM transcode: stack EVERY clip's blocks into one
    ``_ima_encode_blocks`` call (the vectorization axis is total blocks
    across the batch, not the ~20 blocks of one clip). Returns
    ``(wav_payloads, reconstructed_float_signals)`` — the recon comes
    free from the encoder, so the SNR audit costs no second decode."""
    ba = _IMA_BLOCK_ALIGN
    spb = 1 + (ba - 4) * 2
    pcm = [
        np.round(np.clip(np.asarray(x, np.float64), -1.0, 1.0) * 32767.0).astype(
            np.int32
        )
        for x in signals
    ]
    counts = [(-(-len(p) // spb)) if len(p) else 0 for p in pcm]
    total = sum(counts)
    payloads: list[bytes] = []
    recons: list[np.ndarray] = []
    if total == 0:
        return (
            [encode(np.zeros(0), sr, "adpcm_ima") for sr in sr_list],
            [np.zeros(0) for _ in signals],
        )
    big = np.zeros((total, spb), dtype=np.int32)
    row = 0
    for p, c in zip(pcm, counts):
        if c:
            big[row : row + c].reshape(-1)[: len(p)] = p
        row += c
    bodies, recon = _ima_encode_blocks(big, ba)
    row = 0
    for p, c, sr in zip(pcm, counts, sr_list):
        n = len(p)
        data = bodies[row : row + c].tobytes()
        fact = b"fact" + struct.pack("<II", 4, n)
        byte_rate = (sr * ba) // spb
        header = b"".join(
            [
                b"RIFF",
                struct.pack("<I", 36 + len(fact) + len(data)),
                b"WAVE",
                b"fmt ",
                struct.pack(
                    "<IHHIIHH", 16, _FMT_IMA_ADPCM, 1, sr, byte_rate, ba, 4
                ),
                fact,
                b"data",
                struct.pack("<I", len(data)),
            ]
        )
        payloads.append(header + data)
        recons.append(
            recon[row : row + c].reshape(-1)[:n].astype(np.float64) / 32767.0
        )
        row += c
    return payloads, recons


def _ima_decode(
    data: bytes, block_align: int, n_samples: int | None
) -> np.ndarray:
    if block_align < 5:
        raise AudioDecodeError(f"invalid adpcm block align {block_align}")
    if len(data) % block_align:
        # trailing partial block: decode what is whole, reject a fragment
        # that cannot even hold a header
        if len(data) % block_align < 5:
            raise AudioDecodeError("truncated adpcm block")
    raw = np.frombuffer(data, dtype=np.uint8)
    nb = len(raw) // block_align
    if nb == 0:
        raise AudioDecodeError("truncated adpcm block")
    body = raw[: nb * block_align].reshape(nb, block_align)
    pred = (
        body[:, 0].astype(np.int32) | (body[:, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 32768, pred - 65536, pred)
    index = body[:, 2].astype(np.int32)
    if (index > 88).any():
        raise AudioDecodeError(
            f"invalid adpcm step index {int(index.max())}"
        )
    nib_bytes = body[:, 4:]
    nibbles = np.empty((nb, nib_bytes.shape[1] * 2), dtype=np.uint8)
    nibbles[:, 0::2] = nib_bytes & 0x0F
    nibbles[:, 1::2] = nib_bytes >> 4
    spb = 1 + (block_align - 4) * 2
    steps = _IMA_STEPS.astype(np.int32)
    idx_tab = _IMA_INDEX
    out = np.empty((nb, spb), dtype=np.int32)
    out[:, 0] = pred
    for t in range(spb - 1):
        code = nibbles[:, t]
        step = steps[index]
        diff = (
            (step >> 3)
            + np.where(code & 1, step >> 2, 0)
            + np.where(code & 2, step >> 1, 0)
            + np.where(code & 4, step, 0)
        )
        pred = np.clip(
            np.where(code & 8, pred - diff, pred + diff), -32768, 32767
        )
        index = np.clip(index + idx_tab[code & 7], 0, 88)
        out[:, t + 1] = pred
    pcm = out.reshape(-1).astype(np.float64)
    if n_samples is not None:
        if n_samples > len(pcm):
            raise AudioDecodeError("fact chunk claims more samples than data")
        pcm = pcm[:n_samples]
    return pcm / 32767.0


# --- RIFF/WAVE container ---------------------------------------------------


def encode(samples: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode float samples in [-1, 1] into a mono WAVE payload."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    fact = b""
    if codec == "pcm_s16le":
        fmt, bits = _FMT_PCM, 16
        data = np.round(x * 32767.0).astype("<i2").tobytes()
        block_align = 2
    elif codec == "pcm_u8":
        fmt, bits = _FMT_PCM, 8
        data = (np.round((x + 1.0) * 127.5)).clip(0, 255).astype(np.uint8).tobytes()
        block_align = 1
    elif codec == "ulaw":
        fmt, bits = _FMT_ULAW, 8
        data = _ulaw_compress(x).tobytes()
        block_align = 1
    elif codec == "alaw":
        fmt, bits = _FMT_ALAW, 8
        data = _alaw_compress(x).tobytes()
        block_align = 1
    elif codec == "adpcm_ima":
        fmt, bits = _FMT_IMA_ADPCM, 4
        pcm16 = np.round(x * 32767.0).astype(np.int16)
        data = _ima_encode(pcm16) if len(pcm16) else b""
        block_align = _IMA_BLOCK_ALIGN
        # fact chunk carries the true sample count (last block may pad)
        fact = b"fact" + struct.pack("<II", 4, len(pcm16))
    elif codec == "flac":
        # native FLAC container (not RIFF) — the lossless member of the
        # codec family, from-scratch in functions/flac.py
        from fs_schema_validator_ray.functions.flac import encode_flac

        return encode_flac(np.round(x * 32767.0).astype(np.int16), sr_hz)
    else:
        raise ValueError(f"unknown codec `{codec}`")

    byte_rate = sr_hz * block_align if fmt != _FMT_IMA_ADPCM else (
        sr_hz * block_align
    ) // (1 + (block_align - 4) * 2)
    header = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(fact) + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, fmt, 1, sr_hz, byte_rate, block_align, bits),
            fact,
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    return header + data


def sniff_codec(payload: bytes) -> str:
    """Identify the actual codec from the container header — the analogue of
    PIL's format detection (reference ``image.py:54-69``)."""
    if payload[:4] == b"fLaC":
        return "flac"
    _, fmt, bits, _, _, _, _ = _parse_header(payload)
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
    if fmt == _FMT_IMA_ADPCM:
        return "adpcm_ima"
    raise AudioDecodeError(f"unknown wave format tag {fmt} ({bits} bits)")


def _parse_header(payload: bytes) -> tuple[int, int, int, int, bytes, int, int | None]:
    """Returns (sr_hz, fmt_tag, bits, channels, data, block_align,
    fact_samples)."""
    if len(payload) < 44:
        raise AudioDecodeError(f"payload too short for a wave header ({len(payload)} bytes)")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("payload is not a RIFF/WAVE container")
    pos = 12
    fmt_tag = bits = channels = sr_hz = None
    block_align = 0
    fact_samples = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if cid == b"fmt ":
            if size < 16 or body_start + 16 > n:
                raise AudioDecodeError("truncated fmt chunk")
            fmt_tag, channels, sr_hz, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
        elif cid == b"fact":
            if size >= 4 and body_start + 4 <= n:
                (fact_samples,) = struct.unpack_from("<I", payload, body_start)
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
    return sr_hz, fmt_tag, bits, channels, data, block_align, fact_samples


def wav_header_fields(payload: bytes) -> dict:
    """Raw fmt-chunk fields for header-conformance validation (no
    decode): ``{fmt_tag, channels, sr_hz, byte_rate, block_align,
    bits}``. Raises :class:`AudioDecodeError` like :func:`decode`."""
    if len(payload) < 44:
        raise AudioDecodeError("payload too short for a wave header")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("payload is not a RIFF/WAVE container")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if size < 16 or body + 16 > n:
                raise AudioDecodeError("truncated fmt chunk")
            fmt_tag, channels, sr_hz, byte_rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", payload, body)
            )
            return {
                "fmt_tag": fmt_tag,
                "channels": channels,
                "sr_hz": sr_hz,
                "byte_rate": byte_rate,
                "block_align": block_align,
                "bits": bits,
            }
        pos = body + size + (size & 1)
    raise AudioDecodeError("missing fmt chunk")


def decode(payload: bytes) -> tuple[np.ndarray, int, str]:
    """Decode a WAVE (or native-FLAC) payload → (float64 samples in
    [-1,1], sr_hz, codec)."""
    if payload[:4] == b"fLaC":
        from fs_schema_validator_ray.functions.flac import FlacError, decode_flac

        try:
            pcm, sr_hz = decode_flac(payload)
        except FlacError as exc:
            raise AudioDecodeError(f"bad flac payload: {exc}") from exc
        if pcm.ndim != 1:
            raise AudioDecodeError("only mono supported")
        return pcm.astype(np.float64) / 32767.0, sr_hz, "flac"
    sr_hz, fmt, bits, _, data, block_align, fact_samples = _parse_header(payload)
    codec = _codec_name(fmt, bits)
    if codec == "pcm_s16le":
        if len(data) % 2:
            raise AudioDecodeError("pcm_s16le data length is odd")
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif codec == "pcm_u8":
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
    elif codec == "ulaw":
        x = _ulaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif codec == "adpcm_ima":
        x = _ima_decode(data, block_align, fact_samples) if data else np.zeros(0)
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
