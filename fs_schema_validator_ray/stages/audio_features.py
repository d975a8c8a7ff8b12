"""Audio feature extraction over binary clip payloads.

The training-data companion to payload *validation*
(``stages/decode.py``): decode each clip (zero-copy memoryview slices of
the Arrow binary column) and emit a per-clip feature row — the kind of
signal a 100 TB audio-corpus pipeline filters and stratifies on
(silence/clipping screens, loudness normalization buckets, spectral
sanity checks). Pure numpy (rfft) — no external DSP library.

Stage shape: callable class for ``map_batches`` (instance → stateless
tasks; pass the class + constructor args for an actor pool when a real
codec library with per-worker init replaces ``audio.decode``). Decode is
inherently per-row (variable-length payloads), the per-clip math is
numpy-vectorized; undecodable payloads emit ``decode_ok=false`` rows
with null features rather than dropping silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray import audio
from fs_schema_validator_ray.stages.decode import binary_views

FEATURE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("codec", pa.string()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("duration_ms", pa.float64()),
        ("rms_db", pa.float64()),
        ("peak", pa.float64()),
        ("zero_crossing_rate", pa.float64()),
        ("spectral_centroid_hz", pa.float64()),
        ("clipping_ratio", pa.float64()),
        ("silence_ratio", pa.float64()),
    ]
)

_SILENCE_ABS = 1e-3
_CLIP_ABS = 0.999
_MAX_FFT = 1 << 16  # centroid on the first 64k samples — O(n log n) cap


def clip_features(x: np.ndarray, sr_hz: int) -> dict:
    """Feature dict for one decoded clip (float samples in [-1, 1])."""
    n = len(x)
    if n == 0:
        return {
            "n_samples": 0,
            "duration_ms": 0.0,
            "rms_db": float("-inf"),
            "peak": 0.0,
            "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0,
            "clipping_ratio": 0.0,
            "silence_ratio": 1.0,
        }
    ax = np.abs(x)
    rms = float(np.sqrt(np.mean(np.square(x))))
    head = x[:_MAX_FFT]
    spec = np.abs(np.fft.rfft(head))
    freqs = np.fft.rfftfreq(len(head), d=1.0 / sr_hz)
    power = spec.sum()
    centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
    return {
        "n_samples": n,
        "duration_ms": n * 1000.0 / sr_hz,
        "rms_db": 20.0 * np.log10(rms) if rms > 0 else float("-inf"),
        "peak": float(ax.max()),
        "zero_crossing_rate": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if n > 1
        else 0.0,
        "spectral_centroid_hz": centroid,
        "clipping_ratio": float(np.mean(ax >= _CLIP_ABS)),
        "silence_ratio": float(np.mean(ax < _SILENCE_ABS)),
    }


class AudioFeatureStage:
    """``map_batches`` callable: (clip_id, bytes) → one feature row per
    clip (``FEATURE_SCHEMA``)."""

    def __init__(
        self, bytes_column: str = "bytes", key_column: str = "clip_id"
    ) -> None:
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            base = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "codec": None,
                "sr_hz": None,
                "n_samples": None,
                "duration_ms": None,
                "rms_db": None,
                "peak": None,
                "zero_crossing_rate": None,
                "spectral_centroid_hz": None,
                "clipping_ratio": None,
                "silence_ratio": None,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, codec = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    feats = clip_features(x, sr_hz)
                    base.update(
                        {"decode_ok": True, "codec": codec, "sr_hz": sr_hz, **feats}
                    )
            rows.append(base)
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


def audio_feature_dataset(ds, bytes_column: str = "bytes", key_column: str = "clip_id"):
    """clips Dataset → per-clip feature Dataset (columns pruned before the
    decode stage; batch size kept small because payloads are large)."""
    return ds.select_columns([key_column, bytes_column]).map_batches(
        AudioFeatureStage(bytes_column, key_column),
        batch_format="pyarrow",
        batch_size=512,
    )


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (numpy-only; the audio analogue of
    an image resize). Good enough for rate normalization of band-limited
    speech; swap a polyphase/sinc kernel in via the same stage at
    production quality."""
    if sr_in == sr_out or len(x) == 0:
        return np.asarray(x, dtype=np.float64)
    n_out = max(1, int(round(len(x) * sr_out / sr_in)))
    t_out = np.arange(n_out) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(x)), x)


RESAMPLE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("sr_in", pa.int32()),
        ("n_samples_in", pa.int64()),
        ("decode_ok", pa.bool_()),
    ]
)


class ResampleStage:
    """``map_batches`` callable: decode → resample to ``target_sr`` →
    re-encode (``codec_out``) — the rate-normalization stage a training
    pipeline runs before featurization. Undecodable payloads pass through
    as ``decode_ok=false`` rows with null bytes (never dropped
    silently)."""

    def __init__(
        self,
        target_sr: int = 16_000,
        codec_out: str = "pcm_s16le",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.target_sr = target_sr
        self.codec_out = codec_out
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "bytes": None,
                "sr_hz": None,
                "n_samples": None,
                "sr_in": None,
                "n_samples_in": None,
                "decode_ok": False,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    y = resample_linear(x, sr_hz, self.target_sr)
                    row.update(
                        {
                            "bytes": audio.encode(y, self.target_sr, self.codec_out),
                            "sr_hz": self.target_sr,
                            "n_samples": len(y),
                            "sr_in": sr_hz,
                            "n_samples_in": len(x),
                            "decode_ok": True,
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=RESAMPLE_SCHEMA)


GAIN_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("decode_ok", pa.bool_()),
        ("gain_db", pa.float64()),
        ("rms_db_in", pa.float64()),
        ("rms_db_out", pa.float64()),
        ("limited", pa.bool_()),
    ]
)


class GainNormalizeStage:
    """``map_batches`` callable: decode → scale to a target RMS level
    (dBFS) with a peak limiter → re-encode — the loudness-normalization
    pass a speech corpus runs before training (batch gain, not a
    compressor). All-silence clips pass through at unit gain
    (``gain_db = 0``); when the required gain would push the peak past
    ``peak_ceiling`` the gain is capped and ``limited = true``.
    Undecodable payloads emit ``decode_ok=false`` with null bytes."""

    def __init__(
        self,
        target_dbfs: float = -20.0,
        peak_ceiling: float = 0.999,
        codec_out: str = "pcm_s16le",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.target_rms = 10.0 ** (target_dbfs / 20.0)
        self.peak_ceiling = float(peak_ceiling)
        self.codec_out = codec_out
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "bytes": None,
                "sr_hz": None,
                "decode_ok": False,
                "gain_db": None,
                "rms_db_in": None,
                "rms_db_out": None,
                "limited": None,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
                    peak = float(np.max(np.abs(x))) if len(x) else 0.0
                    if rms > 0.0 and peak > 0.0:
                        gain = self.target_rms / rms
                        limited = gain * peak > self.peak_ceiling
                        if limited:
                            gain = self.peak_ceiling / peak
                    else:
                        gain, limited = 1.0, False
                    y = x * gain
                    rms_out = float(np.sqrt(np.mean(np.square(y)))) if len(y) else 0.0
                    row.update(
                        {
                            "bytes": audio.encode(y, sr_hz, self.codec_out),
                            "sr_hz": sr_hz,
                            "decode_ok": True,
                            "gain_db": 20.0 * float(np.log10(gain)) if gain > 0 else 0.0,
                            "rms_db_in": 20.0 * float(np.log10(rms)) if rms > 0 else -120.0,
                            "rms_db_out": 20.0 * float(np.log10(rms_out)) if rms_out > 0 else -120.0,
                            "limited": bool(limited),
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=GAIN_SCHEMA)


LEVELS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("n_samples", pa.int64()),
        ("peak", pa.float64()),
        ("rms", pa.float64()),
        ("dc_offset", pa.float64()),
        ("clip_frac", pa.float64()),
        ("clipped", pa.bool_()),
        ("dc_ok", pa.bool_()),
    ]
)


class LevelsStage:
    """``map_batches`` callable: per-clip level QA — peak, RMS, DC
    offset, clipping-sample fraction — the gain-staging audit a speech
    corpus runs alongside the reference's per-file payload checks
    (``/root/reference/fs_schema_validator/schemas/audio-analogue``:
    decode, then assert semantic facts about the decoded payload).

    Verdicts: ``clipped`` = any sample with ``|y| >= clip_threshold``
    (full scale 1.0); ``dc_ok`` = ``|mean(y)| <= dc_threshold``. Empty
    decodes (0 samples) are vacuous: ``clipped=false, dc_ok=true`` with
    null metrics. Undecodable payloads emit ``decode_ok=false`` rows
    with null verdicts (never dropped silently).

    Optional ``gain_column`` / ``dc_column`` (float64 per row) scale and
    bias the decoded signal *before* measurement — contract testing
    (planted-gain corpus sweeps, ``pipelines/queries.py::
    audio_levels_contract``) and simulated gain-staging sweeps; both
    default to identity. Stateless; all numerics are per-clip numpy
    vector ops."""

    def __init__(
        self,
        clip_threshold: float = 0.999,
        dc_threshold: float = 0.1,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
        gain_column: str | None = None,
        dc_column: str | None = None,
    ) -> None:
        self.clip_threshold = float(clip_threshold)
        self.dc_threshold = float(dc_threshold)
        self.bytes_column = bytes_column
        self.key_column = key_column
        self.gain_column = gain_column
        self.dc_column = dc_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        n = len(views)
        ones = np.ones(n)
        zeros = np.zeros(n)
        gains = (
            np.asarray(batch.column(self.gain_column).to_numpy(zero_copy_only=False), np.float64)
            if self.gain_column
            else ones
        )
        biases = (
            np.asarray(batch.column(self.dc_column).to_numpy(zero_copy_only=False), np.float64)
            if self.dc_column
            else zeros
        )
        rows = []
        for key, view, gain, bias in zip(keys, views, gains, biases):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "n_samples": None,
                "peak": None,
                "rms": None,
                "dc_offset": None,
                "clip_frac": None,
                "clipped": None,
                "dc_ok": None,
            }
            if view is not None and len(view) > 0:
                try:
                    x, _sr, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    row["decode_ok"] = True
                    row["n_samples"] = len(x)
                    if len(x) == 0:
                        row["clipped"] = False
                        row["dc_ok"] = True
                    else:
                        y = x * float(gain) + float(bias)
                        ay = np.abs(y)
                        peak = float(ay.max())
                        mean = float(y.mean())
                        clip_frac = float((ay >= self.clip_threshold).mean())
                        row.update(
                            {
                                "peak": peak,
                                "rms": float(np.sqrt(np.mean(y * y))),
                                "dc_offset": mean,
                                "clip_frac": clip_frac,
                                "clipped": clip_frac > 0.0,
                                "dc_ok": abs(mean) <= self.dc_threshold,
                            }
                        )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=LEVELS_SCHEMA)


# --- spectrogram summary ----------------------------------------------------

_SPEC_N_BANDS = 8
_SPEC_FRAME = 512
_SPEC_HOP = 256

SPECTROGRAM_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("sr_hz", pa.int32()),
        ("n_frames", pa.int64()),
        *[(f"band{b}_db", pa.float64()) for b in range(_SPEC_N_BANDS)],
    ]
)


def _frame_signal(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n_frames, frame) view of x — zero-copy strided windows."""
    if len(x) < frame:
        return np.zeros((0, frame))
    n_frames = 1 + (len(x) - frame) // hop
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, frame),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )


def spectrogram_bands(x: np.ndarray, sr_hz: int) -> tuple[int, np.ndarray]:
    """(n_frames, mean log-spaced band energies in dB) for one clip:
    strided 512-sample frames (hop 256) → one batched ``rfft`` over all
    frames → power split into log-spaced frequency bands. Numpy-only —
    the real mel-filterbank drops into the same stage when a DSP library
    is available."""
    frames = _frame_signal(np.ascontiguousarray(x), _SPEC_FRAME, _SPEC_HOP)
    if frames.shape[0] == 0:
        return 0, np.full(_SPEC_N_BANDS, -120.0)
    win = np.hanning(_SPEC_FRAME)
    power = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2  # (n_frames, 257)
    freqs = np.fft.rfftfreq(_SPEC_FRAME, d=1.0 / sr_hz)
    nyq = sr_hz / 2.0
    edges = np.geomspace(50.0, max(nyq, 51.0), _SPEC_N_BANDS + 1)
    band = np.clip(np.searchsorted(edges, freqs, side="right") - 1, 0, _SPEC_N_BANDS - 1)
    sums = np.zeros(_SPEC_N_BANDS)
    np.add.at(sums, band, power.mean(axis=0))
    db = 10.0 * np.log10(np.maximum(sums, 1e-12))
    return frames.shape[0], db


class SpectrogramStage:
    """``map_batches`` callable: (clip_id, bytes) → one spectral-summary
    row per clip (``SPECTROGRAM_SCHEMA``) — the bounded-size output a
    corpus pipeline stratifies on (band-energy fingerprint) without ever
    shipping per-frame spectrogram matrices through the shuffle.
    Undecodable payloads emit ``decode_ok=false`` rows, never drop."""

    def __init__(
        self, bytes_column: str = "bytes", key_column: str = "clip_id"
    ) -> None:
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "sr_hz": None,
                "n_frames": None,
                **{f"band{b}_db": None for b in range(_SPEC_N_BANDS)},
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    n_frames, db = spectrogram_bands(x, sr_hz)
                    row.update(
                        {
                            "decode_ok": True,
                            "sr_hz": sr_hz,
                            "n_frames": n_frames,
                            **{
                                f"band{b}_db": float(db[b])
                                for b in range(_SPEC_N_BANDS)
                            },
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=SPECTROGRAM_SCHEMA)


# --- energy-based voice-activity segments -----------------------------------

VAD_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("seg_idx", pa.int64()),
        ("start_ms", pa.float64()),
        ("end_ms", pa.float64()),
        ("rms_db", pa.float64()),
    ]
)


def vad_segments(
    x: np.ndarray, sr_hz: int, threshold_db: float = -35.0
) -> list[tuple[float, float, float]]:
    """Energy VAD for one clip: 25 ms frames / 10 ms hop, a frame is
    active when its RMS clears ``threshold_db`` dBFS, consecutive active
    frames merge into one segment (run-length over the boolean frame
    mask). Returns ``[(start_ms, end_ms, seg_rms_db), …]``."""
    frame = max(1, int(0.025 * sr_hz))
    hop = max(1, int(0.010 * sr_hz))
    frames = _frame_signal(np.ascontiguousarray(x), frame, hop)
    if frames.shape[0] == 0:
        return []
    rms = np.sqrt(np.mean(np.square(frames), axis=1))
    active = 20.0 * np.log10(np.maximum(rms, 1e-12)) > threshold_db
    edges = np.diff(active.astype(np.int8))
    starts = np.flatnonzero(edges == 1) + 1
    ends = np.flatnonzero(edges == -1) + 1
    if active[0]:
        starts = np.concatenate([[0], starts])
    if active[-1]:
        ends = np.concatenate([ends, [len(active)]])
    out = []
    for s, e in zip(starts, ends):
        seg_rms = float(np.sqrt(np.mean(np.square(rms[s:e]))))
        out.append(
            (
                s * hop * 1000.0 / sr_hz,
                ((e - 1) * hop + frame) * 1000.0 / sr_hz,
                20.0 * float(np.log10(max(seg_rms, 1e-12))),
            )
        )
    return out


class VadStage:
    """``map_batches`` callable: (clip_id, bytes) → one row per detected
    speech segment (``VAD_SCHEMA``) — flat-map shape (0..n rows per
    clip). Silent or undecodable clips emit no rows; the companion
    ``AudioFeatureStage.silence_ratio`` covers the screening use case
    where every clip must appear."""

    def __init__(
        self,
        threshold_db: float = -35.0,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.threshold_db = threshold_db
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            if view is None or len(view) == 0 or key is None:
                continue
            try:
                x, sr_hz, _ = audio.decode(view)
            except (audio.AudioDecodeError, ValueError):
                continue
            for i, (s_ms, e_ms, seg_db) in enumerate(
                vad_segments(x, sr_hz, self.threshold_db)
            ):
                rows.append(
                    {
                        "clip_id": str(key),
                        "seg_idx": i,
                        "start_ms": s_ms,
                        "end_ms": e_ms,
                        "rms_db": seg_db,
                    }
                )
        return pa.Table.from_pylist(rows, schema=VAD_SCHEMA)


# --- fixed-window audio segmentation ----------------------------------------

AUDIO_CHUNK_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("seg_idx", pa.int64()),
        ("start_ms", pa.float64()),
        ("dur_ms", pa.float64()),
        ("n_samples", pa.int64()),
        ("bytes", pa.binary()),
    ]
)


class AudioChunkStage:
    """``map_batches`` callable: (clip_id, bytes) → fixed-length audio
    training windows, the payload-axis analogue of ``text.ChunkStage``:
    windows start every ``stride_ms`` and span ``window_ms``
    (``stride < window`` ⇒ overlap); each emitted row carries a
    STANDALONE mono PCM16 WAV payload so downstream stages (feature
    extraction, model inference) treat segments exactly like clips.
    Flat-map shape — one row per window, output bytes ≈ input bytes ×
    (window/stride); keep upstream batches modest for long clips.

    A trailing window shorter than ``min_fill × window_ms`` is dropped
    (a 1 ms tail is not a training sample); undecodable or empty
    payloads emit no rows (the screening pass is ``AudioFeatureStage``,
    where every clip appears)."""

    def __init__(
        self,
        window_ms: int = 1000,
        stride_ms: int = 500,
        min_fill: float = 0.5,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if window_ms < 1 or stride_ms < 1:
            raise ValueError("window_ms and stride_ms must be >= 1")
        if not 0.0 < min_fill <= 1.0:
            raise ValueError("min_fill must be in (0, 1]")
        self.window_ms = window_ms
        self.stride_ms = stride_ms
        self.min_fill = min_fill
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            if view is None or len(view) == 0 or key is None:
                continue
            try:
                x, sr_hz, _ = audio.decode(view)
            except (audio.AudioDecodeError, ValueError):
                continue
            win = max(1, int(round(self.window_ms * sr_hz / 1000.0)))
            hop = max(1, int(round(self.stride_ms * sr_hz / 1000.0)))
            min_len = max(1, int(round(win * self.min_fill)))
            for i, start in enumerate(range(0, max(len(x) - min_len + 1, 1), hop)):
                seg = x[start : start + win]
                if len(seg) < min_len:
                    break
                rows.append(
                    {
                        "clip_id": str(key),
                        "seg_idx": i,
                        "start_ms": start * 1000.0 / sr_hz,
                        "dur_ms": len(seg) * 1000.0 / sr_hz,
                        "n_samples": len(seg),
                        "bytes": audio.encode(seg, sr_hz, "pcm_s16le"),
                    }
                )
        return pa.Table.from_pylist(rows, schema=AUDIO_CHUNK_SCHEMA)


# --- perceptual fingerprint + cross-codec near-dup ---------------------------
#
# Content-based audio dedup: the same recording re-encoded through a
# different (lossy) codec or resampled has different BYTES but nearly
# identical spectral structure, so byte-hash exact dedup misses it. The
# fingerprint here is a 64-bit random-hyperplane signature of a
# gain-invariant spectral feature vector (band energies + temporal
# deltas), computed on a rate-normalized decode — a numpy-only stand-in
# for Haitsma-Kalker / Chromaprint-style fingerprints, with the same
# dedup-side contract: near-identical audio ⇒ small hamming distance.

_FP_SR = 8_000
_FP_FRAME = 256
_FP_HOP = 128
_FP_DIMS = _FP_FRAME // 2 + 1  # rfft bins
_FP_CLAMP_DB = 30.0
# fixed hyperplanes — every worker derives the identical matrix
_FP_PLANES = np.random.Generator(np.random.PCG64(0xA0D10F1)).standard_normal(
    (64, _FP_DIMS)
)


def audio_fingerprint64(x: np.ndarray, sr_hz: int) -> int:
    """64-bit perceptual fingerprint of one decoded clip.

    Rate-normalize to 8 kHz → strided 256/128 frames → one batched rfft →
    time-averaged FINE power spectrum (129 bins — coarse band energies
    cannot separate narrowband content) → dB, clamped to a 30 dB dynamic
    range below the peak (floor bins are quantization-noise-dominated;
    clamping pins them) → centered (gain invariance) → sign of 64 fixed
    hyperplane projections.

    Measured on the synthetic corpus: µ-law/A-law/8-bit re-encodes land
    ≤ 2 hamming bits from the original; distinct clips average ~31 bits.
    The rare distinct pair inside the threshold has near-coincident
    spectral peaks — perceptually a real near-duplicate, the intended
    positive class (like boilerplate text in MinHash dedup)."""
    y = resample_linear(x, sr_hz, _FP_SR)
    frames = _frame_signal(np.ascontiguousarray(y), _FP_FRAME, _FP_HOP)
    if frames.shape[0] == 0:
        return 0
    win = np.hanning(_FP_FRAME)
    power = (np.abs(np.fft.rfft(frames * win, axis=1)) ** 2).mean(axis=0)
    spec = 10.0 * np.log10(np.maximum(power, 1e-12))
    spec = np.maximum(spec, spec.max() - _FP_CLAMP_DB)
    feat = spec - spec.mean()
    bits = (_FP_PLANES @ feat) > 0.0
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


FINGERPRINT_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("fp", pa.int64()),
    ]
)


class AudioFingerprintStage:
    """``map_batches`` callable: (clip_id, bytes) → (clip_id, decode_ok,
    64-bit fingerprint as int64). Per-row decode (variable-length
    payloads), vectorized math per clip; undecodable payloads emit
    ``decode_ok=false`` with fp=0 rather than dropping."""

    def __init__(
        self, bytes_column: str = "bytes", key_column: str = "clip_id"
    ) -> None:
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "fp": 0,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    row["decode_ok"] = True
                    # int64 view (bijective) — native Arrow shuffle type
                    row["fp"] = int(
                        np.uint64(audio_fingerprint64(x, sr_hz)).view(np.int64)
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=FINGERPRINT_SCHEMA)


def audio_near_dup_pairs(
    ds,
    bytes_column: str = "bytes",
    key_column: str = "clip_id",
    max_hamming: int = 3,
):
    """Cross-codec audio near-dup pairs ``(a, b, hamming)`` (a < b,
    distinct clip ids): fingerprint every clip, band-expand the 64-bit
    fingerprint into 4×16-bit LSH blocks (hamming ≤ 3 guarantees a
    shared block by pigeonhole — measured re-encode distance is ≤ 2), ONE
    coarse-bucketed groupby shuffle of (id, fp, band, band_key) rows,
    then an in-bucket sorted segment scan emitting hamming-verified
    pairs. Same shuffle discipline as text SimHash
    (``stages/dedup.py::simhash_near_dup_pairs``), with string clip ids
    carried through via an int64 surrogate sort key."""
    from fs_schema_validator_ray.stages.dedup import fingerprint64_near_dup_pairs

    fps = ds.select_columns([key_column, bytes_column]).map_batches(
        AudioFingerprintStage(bytes_column, key_column),
        batch_format="pyarrow",
        batch_size=512,
    )
    return fingerprint64_near_dup_pairs(
        fps, key_column="clip_id", fp_column="fp",
        max_hamming=max_hamming, ok_column="decode_ok",
    )


TRANSCODE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("codec_in", pa.string()),
        ("codec_out", pa.string()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("snr_db", pa.float64()),
        ("decode_ok", pa.bool_()),
    ]
)


class TranscodeStage:
    """``map_batches`` callable: decode each clip and re-encode it in the
    target codec (the corpus-normalization pass that standardizes a
    mixed-codec crawl onto one container before training). Emits the
    transcoded payload plus the round-trip SNR vs the source samples —
    µ-law/A-law companding is lossy, so the SNR column is the per-clip
    quality audit (lossless targets report ``inf``). Undecodable payloads
    emit ``decode_ok=false`` with null bytes."""

    def __init__(
        self,
        codec_out: str = "pcm_s16le",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if codec_out not in (
            "pcm_s16le", "pcm_u8", "ulaw", "alaw", "adpcm_ima", "flac",
        ):
            raise ValueError(f"unknown target codec `{codec_out}`")
        self.codec_out = codec_out
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        decoded = []  # (row_index, x, sr_hz)
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "bytes": None,
                "codec_in": None,
                "codec_out": self.codec_out,
                "sr_hz": None,
                "n_samples": None,
                "snr_db": None,
                "decode_ok": False,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, codec_in = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    row.update(
                        {
                            "codec_in": codec_in,
                            "sr_hz": sr_hz,
                            "n_samples": int(len(x)),
                            "decode_ok": True,
                        }
                    )
                    decoded.append((len(rows), x, sr_hz))
            rows.append(row)

        if self.codec_out == "adpcm_ima" and decoded:
            # batch path: ALL clips' blocks encode in one vectorized call
            # and the encoder's reconstruction doubles as the SNR decode
            payloads, recons = audio.encode_adpcm_many(
                [x for _i, x, _sr in decoded], [sr for _i, _x, sr in decoded]
            )
            for (i, x, _sr), payload, y in zip(decoded, payloads, recons):
                rows[i]["bytes"] = payload
                rows[i]["snr_db"] = audio.snr_db(x, y)
        else:
            for i, x, sr_hz in decoded:
                payload = audio.encode(x, sr_hz, self.codec_out)
                y, _, _ = audio.decode(payload)
                rows[i]["bytes"] = payload
                rows[i]["snr_db"] = audio.snr_db(x, y)
        return pa.Table.from_pylist(rows, schema=TRANSCODE_SCHEMA)


TRIM_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms_in", pa.float64()),
        ("dur_ms_out", pa.float64()),
        ("trimmed_head_ms", pa.float64()),
        ("trimmed_tail_ms", pa.float64()),
        ("all_silent", pa.bool_()),
        ("decode_ok", pa.bool_()),
    ]
)


class SilenceTrimStage:
    """``map_batches`` callable: strip leading/trailing silence (frame RMS
    below ``threshold_db`` dBFS over ``frame_ms`` frames) and re-encode
    the kept span — the edge-trim pass before duration bucketing /
    sequence packing. Frames are vectorized per clip (strided reshape +
    one RMS reduction); an all-silent clip emits ``all_silent=true`` with
    null bytes rather than a zero-length payload."""

    def __init__(
        self,
        threshold_db: float = -40.0,
        frame_ms: int = 25,
        codec_out: str = "pcm_s16le",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.threshold = 10.0 ** (threshold_db / 20.0)
        self.frame_ms = int(frame_ms)
        self.codec_out = codec_out
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "bytes": None,
                "sr_hz": None,
                "dur_ms_in": None,
                "dur_ms_out": None,
                "trimmed_head_ms": None,
                "trimmed_tail_ms": None,
                "all_silent": None,
                "decode_ok": False,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    frame = max(1, sr_hz * self.frame_ms // 1000)
                    n_frames = (len(x) + frame - 1) // frame
                    padded = np.zeros(n_frames * frame, dtype=np.float64)
                    padded[: len(x)] = x
                    rms = np.sqrt(
                        np.mean(np.square(padded.reshape(n_frames, frame)), axis=1)
                    )
                    active = np.flatnonzero(rms >= self.threshold)
                    dur_in = 1000.0 * len(x) / sr_hz if sr_hz else 0.0
                    row.update(
                        {"sr_hz": sr_hz, "dur_ms_in": dur_in, "decode_ok": True}
                    )
                    if len(active) == 0:
                        row.update(
                            {
                                "all_silent": True,
                                "dur_ms_out": 0.0,
                                "trimmed_head_ms": dur_in,
                                "trimmed_tail_ms": 0.0,
                            }
                        )
                    else:
                        start = int(active[0]) * frame
                        stop = min(len(x), (int(active[-1]) + 1) * frame)
                        kept = x[start:stop]
                        row.update(
                            {
                                "bytes": audio.encode(kept, sr_hz, self.codec_out),
                                "all_silent": False,
                                "dur_ms_out": 1000.0 * len(kept) / sr_hz,
                                "trimmed_head_ms": 1000.0 * start / sr_hz,
                                "trimmed_tail_ms": 1000.0 * (len(x) - stop) / sr_hz,
                            }
                        )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=TRIM_SCHEMA)


GATE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("duration_ms", pa.float64()),
        ("rms_db", pa.float64()),
    ]
)


class AudioQualityGateStage:
    """``map_batches`` callable: decode ONCE, compute the screening
    features, and pass the original payload through only for clips that
    clear every gate — the filter stage at the head of a curation
    pipeline (gate first so every downstream decode/transcode runs only
    on survivors). Undecodable, too-short, too-quiet, clipped or
    mostly-silent clips drop here (this is a filter by design — the
    audit pass that reports every clip is ``AudioFeatureStage``)."""

    def __init__(
        self,
        min_duration_ms: float = 400.0,
        min_rms_db: float = -45.0,
        max_clipping_ratio: float = 0.1,
        max_silence_ratio: float = 0.9,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.min_duration_ms = min_duration_ms
        self.min_rms_db = min_rms_db
        self.max_clipping_ratio = max_clipping_ratio
        self.max_silence_ratio = max_silence_ratio
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            if view is None or len(view) == 0 or key is None:
                continue
            try:
                x, sr_hz, _ = audio.decode(view)
            except (audio.AudioDecodeError, ValueError):
                continue
            feats = clip_features(x, sr_hz)
            if (
                feats["duration_ms"] >= self.min_duration_ms
                and feats["rms_db"] is not None
                and feats["rms_db"] >= self.min_rms_db
                and feats["clipping_ratio"] <= self.max_clipping_ratio
                and feats["silence_ratio"] <= self.max_silence_ratio
            ):
                rows.append(
                    {
                        "clip_id": str(key),
                        "bytes": bytes(view),
                        "sr_hz": sr_hz,
                        "duration_ms": feats["duration_ms"],
                        "rms_db": feats["rms_db"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=GATE_SCHEMA)


SPEED_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("factor", pa.float64()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("decode_ok", pa.bool_()),
    ]
)


class SpeedPerturbStage:
    """``map_batches`` callable: deterministic speed-perturbation
    augmentation (the ASR-training standard, cf. Kaldi's 0.9/1.0/1.1
    triple): each clip is resampled to ``round(n / factor)`` samples and
    re-labeled at the ORIGINAL rate, so playback runs ``factor``× faster
    (pitch shifts with it, like SoX ``speed``). The factor is chosen per
    clip by a stable hash of ``clip_id`` — reruns and resumed partitions
    pick identical factors with no RNG state. ``emit_all`` instead emits
    every factor per clip (dataset ×len(factors) augmentation).
    Undecodable payloads emit ``decode_ok=false`` with null bytes."""

    def __init__(
        self,
        factors: tuple = (0.9, 1.0, 1.1),
        emit_all: bool = False,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if not factors or any(f <= 0 for f in factors):
            raise ValueError("factors must be positive and non-empty")
        self.factors = tuple(float(f) for f in factors)
        self.emit_all = emit_all
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fs_schema_validator_ray.state.sketches import hash64

        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        # one vectorized hash per batch picks every clip's factor
        kh = hash64(np.asarray([str(k) for k in keys], dtype=object))
        picked = np.asarray(self.factors)[
            (kh % np.uint64(len(self.factors))).astype(np.int64)
        ]
        rows = []
        for key, view, pick in zip(keys, views, picked):
            kid = None if key is None else str(key)
            factors = self.factors if self.emit_all else (float(pick),)
            decoded = None
            if view is not None and len(view) > 0:
                try:
                    decoded = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    decoded = None
            for f in factors:
                if decoded is None:
                    rows.append(
                        {
                            "clip_id": kid, "factor": f, "bytes": None,
                            "sr_hz": None, "n_samples": None, "decode_ok": False,
                        }
                    )
                    continue
                x, sr_hz, _ = decoded
                # speed f ⇒ same content in n/f samples at the same rate:
                # resample the waveform onto round(n/f) points
                target_n = max(1, int(round(len(x) / f)))
                sr_virtual = max(1, int(round(sr_hz * len(x) / max(target_n, 1))))
                y = resample_linear(x, sr_virtual, sr_hz) if len(x) else x
                rows.append(
                    {
                        "clip_id": kid,
                        "factor": f,
                        "bytes": audio.encode(y, sr_hz, "pcm_s16le"),
                        "sr_hz": sr_hz,
                        "n_samples": len(y),
                        "decode_ok": True,
                    }
                )
        return pa.Table.from_pylist(rows, schema=SPEED_SCHEMA)


NOISE_MIX_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("snr_db", pa.float64()),
        ("noise_rms_db", pa.float64()),
    ]
)


class NoiseMixStage:
    """``map_batches`` callable: additive white-noise augmentation at a
    target SNR (the standard ASR robustness augmentation). Per clip the
    noise is regenerated from a splitmix counter keyed by a stable hash
    of ``(clip_id, seed_salt)`` — reruns, resumed partitions, and
    different block splits produce bit-identical output with zero RNG
    state on the actor (same discipline as ``SpeedPerturbStage``).

    The noise is scaled so ``10·log10(P_signal / P_noise) = snr_db``;
    the mix is hard-limited to [-1, 1] before re-encoding (pcm_s16le).
    All-silent clips (zero signal power — target SNR undefined) pass
    through unmixed with ``noise_rms_db`` null. Undecodable payloads
    emit ``decode_ok=false`` with null bytes.
    """

    def __init__(
        self,
        snr_db: float = 20.0,
        seed_salt: str = "noise-mix-v1",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        self.snr_db = float(snr_db)
        self.seed_salt = seed_salt
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fs_schema_validator_ray.state.sketches import hash64

        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        seeds = hash64(
            np.asarray(
                [f"{self.seed_salt}:{k}" for k in keys], dtype=object
            )
        )
        rows = []
        for key, view, seed in zip(keys, views, seeds):
            kid = None if key is None else str(key)
            decoded = None
            if view is not None and len(view) > 0:
                try:
                    decoded = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    decoded = None
            if decoded is None:
                rows.append(
                    {
                        "clip_id": kid, "decode_ok": False, "bytes": None,
                        "sr_hz": None, "n_samples": None,
                        "snr_db": self.snr_db, "noise_rms_db": None,
                    }
                )
                continue
            x, sr_hz, _ = decoded
            p_sig = float(np.mean(np.square(x))) if len(x) else 0.0
            if p_sig <= 0.0:
                y, noise_rms_db = x, None
            else:
                # uniform [0,1) → zero-mean unit-ish noise, then scale to
                # the exact power ratio the target SNR demands
                u = audio._splitmix_uniform(int(seed), len(x))
                noise = (u - 0.5) * np.sqrt(12.0)  # unit variance
                p_noise_target = p_sig / (10.0 ** (self.snr_db / 10.0))
                noise = noise * np.sqrt(p_noise_target)
                noise_rms_db = 10.0 * np.log10(
                    max(float(np.mean(np.square(noise))), 1e-30)
                )
                y = np.clip(x + noise, -1.0, 1.0)
            rows.append(
                {
                    "clip_id": kid,
                    "decode_ok": True,
                    "bytes": audio.encode(y, sr_hz, "pcm_s16le"),
                    "sr_hz": sr_hz,
                    "n_samples": len(y),
                    "snr_db": self.snr_db,
                    "noise_rms_db": noise_rms_db,
                }
            )
        return pa.Table.from_pylist(rows, schema=NOISE_MIX_SCHEMA)


REVERB_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("rt60_ms", pa.float64()),
    ]
)


class ReverbStage:
    """``map_batches`` callable: synthetic room-impulse-response (RIR)
    reverb augmentation — FFT convolution with an exponentially decaying
    noise tail (the standard synthetic-RIR model when no measured RIR
    corpus is available; decay constant set so the tail falls 60 dB over
    ``rt60_ms``).

    This is the showcase STATEFUL stage shape: the RIR for each sample
    rate is built once and memoized on the instance (``self._rirs``), so
    running it as an actor pool (``map_batches(ReverbStage, concurrency=N)``)
    pays the construction once per actor, not per batch. The RIR itself
    is deterministic (splitmix noise keyed by ``seed_salt`` + sr), so
    every actor builds the identical filter. Output keeps the input
    length (tail truncated, like torchaudio's ``fftconvolve`` + slice)
    and is peak-renormalized to the dry peak to avoid clipping.
    """

    def __init__(
        self,
        rt60_ms: float = 120.0,
        wet: float = 0.6,
        seed_salt: str = "rir-v1",
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if rt60_ms <= 0 or not (0.0 <= wet <= 1.0):
            raise ValueError("rt60_ms must be > 0 and wet within [0, 1]")
        self.rt60_ms = float(rt60_ms)
        self.wet = float(wet)
        self.seed_salt = seed_salt
        self.bytes_column = bytes_column
        self.key_column = key_column
        self._rirs: dict[int, np.ndarray] = {}

    def _rir(self, sr_hz: int) -> np.ndarray:
        rir = self._rirs.get(sr_hz)
        if rir is None:
            from fs_schema_validator_ray.state.sketches import hash64

            n = max(1, int(round(sr_hz * self.rt60_ms / 1000.0)))
            seed = int(hash64(np.asarray([f"{self.seed_salt}:{sr_hz}"], dtype=object))[0])
            u = audio._splitmix_uniform(seed, n)
            # -60 dB over the tail: exp decay with ln(1000) ≈ 6.908
            env = np.exp(-6.908 * np.arange(n) / n)
            rir = (u - 0.5) * env
            rir[0] = 1.0  # direct path
            rir = rir / np.sqrt(np.sum(np.square(rir)))
            self._rirs[sr_hz] = rir
        return rir

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            kid = None if key is None else str(key)
            decoded = None
            if view is not None and len(view) > 0:
                try:
                    decoded = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    decoded = None
            if decoded is None:
                rows.append(
                    {
                        "clip_id": kid, "decode_ok": False, "bytes": None,
                        "sr_hz": None, "n_samples": None, "rt60_ms": self.rt60_ms,
                    }
                )
                continue
            x, sr_hz, _ = decoded
            rir = self._rir(sr_hz)
            if len(x):
                m = len(x) + len(rir) - 1
                nfft = 1 << (m - 1).bit_length()
                wet_sig = np.fft.irfft(
                    np.fft.rfft(x, nfft) * np.fft.rfft(rir, nfft), nfft
                )[: len(x)]
                y = (1.0 - self.wet) * x + self.wet * wet_sig
                peak_dry = float(np.max(np.abs(x)))
                peak_wet = float(np.max(np.abs(y)))
                if peak_wet > 0 and peak_dry > 0 and peak_wet > peak_dry:
                    y = y * (peak_dry / peak_wet)
                y = np.clip(y, -1.0, 1.0)
            else:
                y = x
            rows.append(
                {
                    "clip_id": kid,
                    "decode_ok": True,
                    "bytes": audio.encode(y, sr_hz, "pcm_s16le"),
                    "sr_hz": sr_hz,
                    "n_samples": len(y),
                    "rt60_ms": self.rt60_ms,
                }
            )
        return pa.Table.from_pylist(rows, schema=REVERB_SCHEMA)


COMPRESS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("n_samples", pa.int64()),
        ("gain_reduction_db", pa.float64()),
    ]
)


def _one_pole_envelope(x_abs: np.ndarray, alpha: float, chunk: int = 256) -> np.ndarray:
    """Smoothed level detector ``env_i = α·|x_i| + (1−α)·env_{i−1}``
    (zero-initialized) — delegates to the single shared implementation
    of the chunked renormalized scan (``stages/window.ewma_scan``)."""
    from fs_schema_validator_ray.stages.window import ewma_scan

    return ewma_scan(np.asarray(x_abs, dtype=np.float64), alpha, chunk=chunk)


class CompressorStage:
    """``map_batches`` callable: dynamic-range compression — the mastering
    stage a speech-corpus pipeline runs before loudness bucketing. Per
    clip: one-pole envelope follower (smoothing ``alpha``), then gain
    ``(env/threshold)^(1/ratio − 1)`` wherever the envelope exceeds the
    linear threshold (classic feed-forward compressor law), unity gain
    below it. Fully deterministic, vectorized (envelope via the chunked
    renormalized scan, gain via one power), pcm_s16le re-encode.
    Reports the peak gain reduction applied (dB ≤ 0) per clip."""

    def __init__(
        self,
        threshold_db: float = -20.0,
        ratio: float = 4.0,
        alpha: float = 0.05,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if ratio < 1.0 or not (0.0 < alpha <= 1.0):
            raise ValueError("ratio must be >= 1 and alpha in (0, 1]")
        self.threshold = 10.0 ** (threshold_db / 20.0)
        self.threshold_db = float(threshold_db)
        self.ratio = float(ratio)
        self.alpha = float(alpha)
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            kid = None if key is None else str(key)
            decoded = None
            if view is not None and len(view) > 0:
                try:
                    decoded = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    decoded = None
            if decoded is None:
                rows.append(
                    {
                        "clip_id": kid, "decode_ok": False, "bytes": None,
                        "sr_hz": None, "n_samples": None,
                        "gain_reduction_db": None,
                    }
                )
                continue
            x, sr_hz, _ = decoded
            if len(x):
                env = _one_pole_envelope(np.abs(x), self.alpha)
                over = env > self.threshold
                gain = np.ones(len(x))
                if over.any():
                    gain[over] = (env[over] / self.threshold) ** (
                        1.0 / self.ratio - 1.0
                    )
                y = np.clip(x * gain, -1.0, 1.0)
                gr_db = float(20.0 * np.log10(max(gain.min(), 1e-12)))
            else:
                y, gr_db = x, 0.0
            rows.append(
                {
                    "clip_id": kid,
                    "decode_ok": True,
                    "bytes": audio.encode(y, sr_hz, "pcm_s16le"),
                    "sr_hz": sr_hz,
                    "n_samples": len(y),
                    "gain_reduction_db": gr_db,
                }
            )
        return pa.Table.from_pylist(rows, schema=COMPRESS_SCHEMA)


# --- MFCC features (mel filterbank + DCT cepstrum) ---------------------------

_MFCC_N = 13
_MFCC_N_MELS = 26

MFCC_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("sr_hz", pa.int32()),
        ("n_frames", pa.int64()),
        *[(f"mfcc{i}", pa.float64()) for i in range(_MFCC_N)],
    ]
)


def mel_filterbank(
    sr_hz: int, n_fft: int, n_mels: int = _MFCC_N_MELS, fmin: float = 20.0
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular mel filterbank (HTK mel scale,
    ``mel = 2595·log10(1 + f/700)``), peak-normalized triangles on the
    rfft bin grid — the standard speech-feature front end, numpy-only."""
    fmax = sr_hz / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = from_mel(mel_pts)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr_hz)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - freqs) / max(hi - ctr, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, 1.0)
    return fb


def mfcc_features(
    x: np.ndarray,
    sr_hz: int,
    fb: np.ndarray,
    dct_basis: np.ndarray,
    frame: int,
    hop: int,
) -> tuple[int, np.ndarray]:
    """(n_frames, per-clip MEAN of the first ``n_mfcc`` cepstral
    coefficients): framed Hamming power spectrum → mel filterbank → log
    → orthonormal DCT-II. One batched ``rfft`` over all frames.

    DCT-orthonormality invariant (tested): scaling the waveform by a
    constant shifts every log-mel bin equally, which moves ONLY the
    c0 coefficient — c1..c12 are amplitude-invariant timbre features."""
    frames = _frame_signal(np.ascontiguousarray(x), frame, hop)
    if frames.shape[0] == 0:
        return 0, np.zeros(dct_basis.shape[0])
    win = np.hamming(frame)
    power = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2 / frame
    mel_e = power @ fb.T  # (n_frames, n_mels)
    logm = np.log(np.maximum(mel_e, 1e-10))
    mfcc = logm @ dct_basis.T  # (n_frames, n_mfcc)
    return frames.shape[0], mfcc.mean(axis=0)


class MfccStage:
    """``map_batches`` actor-pool callable: (clip_id, bytes) → one row of
    per-clip mean MFCCs (``MFCC_SCHEMA``) — the classic bounded-size
    speech embedding a curation pipeline clusters / dedups / stratifies
    on without shipping per-frame matrices through any shuffle.

    Actor state (once per actor, NOT per batch): the orthonormal DCT-II
    basis in ``__init__``; the mel filterbank + frame geometry memoized
    per sample rate on first sight (clips arrive mixed-rate). Undecodable
    payloads emit ``decode_ok=false`` rows, never drop."""

    def __init__(
        self,
        n_mfcc: int = _MFCC_N,
        n_mels: int = _MFCC_N_MELS,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if not (1 <= n_mfcc <= n_mels):
            raise ValueError("need 1 <= n_mfcc <= n_mels")
        self.n_mfcc = n_mfcc
        self.n_mels = n_mels
        self.bytes_column = bytes_column
        self.key_column = key_column
        k = np.arange(n_mels)
        basis = np.sqrt(2.0 / n_mels) * np.cos(
            np.pi * (2 * k[None, :] + 1) * np.arange(n_mfcc)[:, None] / (2 * n_mels)
        )
        basis[0] /= np.sqrt(2.0)
        self._dct = basis
        self._per_sr: dict[int, tuple[np.ndarray, int, int]] = {}
        self._schema = (
            MFCC_SCHEMA
            if n_mfcc == _MFCC_N
            else pa.schema(
                [
                    *list(MFCC_SCHEMA)[:4],
                    *[(f"mfcc{i}", pa.float64()) for i in range(n_mfcc)],
                ]
            )
        )

    def _geometry(self, sr_hz: int) -> tuple[np.ndarray, int, int]:
        got = self._per_sr.get(sr_hz)
        if got is None:
            frame = max(16, int(0.025 * sr_hz))  # 25 ms / 10 ms hop
            hop = max(8, int(0.010 * sr_hz))
            got = (mel_filterbank(sr_hz, frame, self.n_mels), frame, hop)
            if len(self._per_sr) >= 16:
                self._per_sr.clear()  # corpora carry a handful of rates
            self._per_sr[sr_hz] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "sr_hz": None,
                "n_frames": None,
                **{f"mfcc{i}": None for i in range(self.n_mfcc)},
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    fb, frame, hop = self._geometry(sr_hz)
                    n_frames, coeffs = mfcc_features(
                        x, sr_hz, fb, self._dct, frame, hop
                    )
                    row.update(
                        {
                            "decode_ok": True,
                            "sr_hz": sr_hz,
                            "n_frames": n_frames,
                            **{
                                f"mfcc{i}": float(coeffs[i])
                                for i in range(self.n_mfcc)
                            },
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=self._schema)


# --- pitch (f0) estimation ---------------------------------------------------

PITCH_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("sr_hz", pa.int32()),
        ("n_frames", pa.int64()),
        ("voiced_ratio", pa.float64()),
        ("f0_hz", pa.float64()),
    ]
)


def pitch_f0(
    x: np.ndarray,
    sr_hz: int,
    fmin: float = 50.0,
    fmax: float = 500.0,
    voicing_threshold: float = 0.5,
    silence_db: float = -40.0,
) -> tuple[int, float, float | None]:
    """(n_frames, voiced_ratio, median f0) for one clip by short-time
    AUTOCORRELATION pitch tracking: 40 ms frames / 20 ms hop, per-frame
    autocorrelation via one batched ``rfft → |·|² → irfft`` (the
    Wiener-Khinchin route — no per-lag loops), peak over the
    ``[sr/fmax, sr/fmin]`` lag range with parabolic sub-bin
    interpolation. A frame is VOICED when its normalized autocorrelation
    peak clears ``voicing_threshold`` and its RMS clears ``silence_db``
    dBFS; the clip f0 is the median over voiced frames (None when no
    frame is voiced — noise, silence, or out-of-range pitch)."""
    frame = max(32, int(0.040 * sr_hz))
    hop = max(16, int(0.020 * sr_hz))
    frames = _frame_signal(np.ascontiguousarray(x), frame, hop)
    n_frames = frames.shape[0]
    if n_frames == 0:
        return 0, 0.0, None
    lag_lo = max(1, int(sr_hz / fmax))
    lag_hi = min(frame - 2, int(np.ceil(sr_hz / fmin)))
    if lag_hi <= lag_lo:
        return n_frames, 0.0, None
    demeaned = frames - frames.mean(axis=1, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(2 * frame)))  # zero-pad: linear, not circular
    spec = np.fft.rfft(demeaned, n=nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), n=nfft, axis=1)[:, : lag_hi + 2]
    e0 = ac[:, 0]  # frame energy (autocorr at lag 0)
    rms_db = 10.0 * np.log10(np.maximum(e0 / frame, 1e-12))
    band = ac[:, lag_lo : lag_hi + 1]
    peak_rel = np.argmax(band, axis=1)
    peak = peak_rel + lag_lo
    rows = np.arange(n_frames)
    norm = band[rows, peak_rel] / np.maximum(e0, 1e-12)
    voiced = (norm > voicing_threshold) & (rms_db > silence_db)
    ratio = float(voiced.mean())
    if not voiced.any():
        return n_frames, ratio, None
    # parabolic interpolation around the integer peak lag
    p = peak[voiced]
    ym = ac[voiced, p - 1]
    y0 = ac[voiced, p]
    yp = ac[voiced, p + 1]
    denom = ym - 2 * y0 + yp
    delta = np.where(np.abs(denom) > 1e-12, 0.5 * (ym - yp) / np.where(denom == 0, 1, denom), 0.0)
    lags = p + np.clip(delta, -0.5, 0.5)
    return n_frames, ratio, float(np.median(sr_hz / lags))


class PitchStage:
    """``map_batches`` callable: (clip_id, bytes) → one pitch row per
    clip (``PITCH_SCHEMA``) — the prosody feature a speech-curation
    pipeline stratifies and filters on (monotone TTS artifacts, wrong
    speaker splits). Stateless vectorized DSP; undecodable payloads emit
    ``decode_ok=false`` rows, never drop."""

    def __init__(
        self, bytes_column: str = "bytes", key_column: str = "clip_id"
    ) -> None:
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        rows = []
        for key, view in zip(keys, views):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "sr_hz": None,
                "n_frames": None,
                "voiced_ratio": None,
                "f0_hz": None,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr_hz, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    n_frames, ratio, f0 = pitch_f0(x, sr_hz)
                    row.update(
                        {
                            "decode_ok": True,
                            "sr_hz": sr_hz,
                            "n_frames": n_frames,
                            "voiced_ratio": ratio,
                            "f0_hz": f0,
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=PITCH_SCHEMA)


# --- K-weighted gated loudness (ITU-R BS.1770 / EBU R128 style) --------------


def k_weighting_coeffs(sr: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Re-derive the BS.1770 K-weighting biquads at an arbitrary sample
    rate from the published analog prototype (high-shelf f0≈1681.97 Hz
    +3.99984 dB Q≈0.70718; high-pass f0≈38.1355 Hz Q≈0.50033) via the
    RBJ cookbook bilinear formulas — the same re-derivation public
    loudness meters use. At 48 kHz the result reproduces the ITU table
    coefficients (pytest-gated to 2e-3). Returns (b_shelf, a_shelf,
    b_hp, a_hp), each a0-normalized."""
    # stage 1: spherical-head high shelf — pre-warped bilinear derivation
    # (De Man 2014, "Evaluation of implementations of the EBU R128
    # loudness measurement"); the 0.4996667… exponent places the
    # mid-band zero exactly where the ITU 48 kHz table has it
    g_db, f0, q = 3.999843853973347, 1681.974450955533, 0.7071752369554196
    k = np.tan(np.pi * f0 / sr)
    vh = 10.0 ** (g_db / 20.0)
    vb = vh ** 0.499666774155
    a0 = 1.0 + k / q + k * k
    b_shelf = np.array(
        [(vh + vb * k / q + k * k), 2.0 * (k * k - vh), (vh - vb * k / q + k * k)]
    ) / a0
    a_shelf = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])
    # stage 2: revised low-frequency B-curve high-pass; the spec keeps
    # b = [1, -2, 1] UN-normalized (passband gain ≈ 1)
    f0, q = 38.13547087602444, 0.5003270373238773
    k = np.tan(np.pi * f0 / sr)
    a0 = 1.0 + k / q + k * k
    b_hp = np.array([1.0, -2.0, 1.0])
    a_hp = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])
    return b_shelf, a_shelf, b_hp, a_hp


def _k_weight(x: np.ndarray, sr: int, cache: dict) -> np.ndarray:
    """Apply the two K-weighting biquads exactly in the frequency domain:
    H(e^jw) evaluated from the coefficients on the rfft grid of the
    0.5 s-zero-padded clip (the truncated-IR error of the 38 Hz
    high-pass decays with τ≈4 ms, so a 0.5 s pad is exact to double
    precision) — fully vectorized, no per-sample recurrence."""
    n = len(x)
    if n == 0:
        return x
    key = sr
    if key not in cache:
        cache[key] = k_weighting_coeffs(sr)
    b1, a1, b2, a2 = cache[key]
    npad = n + max(64, sr // 2)
    w = np.exp(-2j * np.pi * np.fft.rfftfreq(npad))  # e^{-jw} per bin
    def resp(b, a):
        return (b[0] + b[1] * w + b[2] * w * w) / (a[0] + a[1] * w + a[2] * w * w)
    spec = np.fft.rfft(x, npad) * resp(b1, a1) * resp(b2, a2)
    return np.fft.irfft(spec, npad)[:n]


def integrated_lufs(
    x: np.ndarray, sr: int, cache: dict, block_sec: float = 0.4
) -> tuple[float | None, int, int]:
    """BS.1770 gated integrated loudness of a mono signal: K-weight,
    ``block_sec`` blocks (spec: 400 ms) at 75% overlap, −70 LUFS
    absolute gate then a −10 dB relative gate, −0.691 offset. Returns
    (lufs | None, n_blocks, n_gated) — None when the clip is shorter
    than one block or fully gated (digital silence). ``block_sec`` is a
    documented deviation hook for sub-second corpora (the synthetic
    clips run 0–240 ms, under one spec block); the spec default is what
    the conformance pytest gates use."""
    if sr <= 0 or len(x) < int(block_sec * sr) or int(block_sec * sr) == 0:
        return None, 0, 0
    y = _k_weight(np.asarray(x, np.float64), sr, cache)
    blk, step = int(block_sec * sr), max(1, int(block_sec * sr / 4))
    n_blocks = (len(y) - blk) // step + 1
    idx = np.arange(blk)[None, :] + step * np.arange(n_blocks)[:, None]
    z = np.mean(y[idx] ** 2, axis=1)
    with np.errstate(divide="ignore"):
        lj = -0.691 + 10.0 * np.log10(z)
    abs_gated = lj > -70.0
    if not abs_gated.any():
        return None, n_blocks, 0
    gamma_r = -0.691 + 10.0 * np.log10(z[abs_gated].mean()) - 10.0
    gated = abs_gated & (lj > gamma_r)
    if not gated.any():
        return None, n_blocks, 0
    return (
        float(-0.691 + 10.0 * np.log10(z[gated].mean())),
        int(n_blocks),
        int(gated.sum()),
    )


LOUDNESS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("n_blocks", pa.int64()),
        ("n_gated", pa.int64()),
        ("lufs", pa.float64()),
        ("loud", pa.bool_()),
    ]
)


class LoudnessStage:
    """``map_batches`` callable: EBU-R128-style program loudness QA — the
    level gate a speech corpus actually normalizes to (plain RMS counts
    silence; gated LUFS does not). Per-clip: decode → K-weighting
    (filters derived once per sample rate, memoized per actor) → gated
    integration. ``loud`` = ``lufs > loud_threshold_lufs`` (NULL when
    undefined: short clip / silence / decode failure — never dropped).
    Optional ``gain_column`` scales the decoded float signal before
    measurement (planted-gain contract sweeps; LUFS is exactly
    +20·log10(gain) covariant while gating selections are unchanged)."""

    def __init__(
        self,
        loud_threshold_lufs: float = -20.0,
        block_sec: float = 0.4,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
        gain_column: str | None = None,
    ) -> None:
        self.loud_threshold_lufs = float(loud_threshold_lufs)
        self.block_sec = float(block_sec)
        self.bytes_column = bytes_column
        self.key_column = key_column
        self.gain_column = gain_column
        self._coeffs: dict = {}  # per-actor: sr → biquad coefficients

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        gains = (
            np.asarray(
                batch.column(self.gain_column).to_numpy(zero_copy_only=False),
                np.float64,
            )
            if self.gain_column
            else np.ones(len(views))
        )
        rows = []
        for key, view, gain in zip(keys, views, gains):
            row = {
                "clip_id": None if key is None else str(key),
                "decode_ok": False,
                "n_blocks": None,
                "n_gated": None,
                "lufs": None,
                "loud": None,
            }
            if view is not None and len(view) > 0:
                try:
                    x, sr, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    row["decode_ok"] = True
                    lufs, nb, ng = integrated_lufs(
                        np.asarray(x, np.float64) * float(gain), sr, self._coeffs,
                        block_sec=self.block_sec,
                    )
                    row["n_blocks"] = nb
                    row["n_gated"] = ng
                    if lufs is not None:
                        row["lufs"] = round(lufs, 6)
                        row["loud"] = lufs > self.loud_threshold_lufs
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=LOUDNESS_SCHEMA)


# --- DTW alignment (banded dynamic time warping) -----------------------------


def dtw_band(a: np.ndarray, b: np.ndarray, band_frac: float = 0.25) -> float:
    """Normalized banded DTW distance between two feature sequences
    ``a`` (n×d) and ``b`` (m×d): Sakoe-Chiba band of radius
    ``max(2, band_frac·max(n,m))`` around the length-scaled diagonal,
    anti-diagonal DP (each of the n+m−1 diagonals is one vector min —
    no per-cell Python), euclidean step cost, symmetric step pattern
    (up/left/diag), result divided by (n+m) so lengths compare.
    Returns ``inf``-free floats; empty sequences → ``inf``."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if b.ndim == 1:
        b = b[:, None]
    n, m = a.shape[0], b.shape[0]
    if n == 0 or m == 0:
        return float("inf")
    # full pairwise cost (clips are short; band masks the DP, the cost
    # matrix is one vectorized broadcast)
    diff = a[:, None, :] - b[None, :, :]
    cost = np.sqrt((diff * diff).sum(axis=2))
    r = max(2.0, band_frac * max(n, m))
    i_idx = np.arange(n)[:, None]
    j_idx = np.arange(m)[None, :]
    center = i_idx * ((m - 1) / max(1, n - 1)) if n > 1 else j_idx * 0.0
    mask = np.abs(j_idx - center) <= r
    cost = np.where(mask, cost, np.inf)

    inf = np.inf
    d_prev2 = None  # diagonal k-2, indexed by i
    d_prev = None  # diagonal k-1
    for k in range(n + m - 1):
        lo = max(0, k - m + 1)
        hi = min(n - 1, k)
        ii = np.arange(lo, hi + 1)
        c = cost[ii, k - ii]
        cur = np.full(len(ii), inf)
        if k == 0:
            cur[0] = c[0]
        else:
            plo = max(0, k - m)
            # neighbor lookups by absolute i into the previous diagonals
            def at(diag, dlo, i_abs):
                out = np.full(len(i_abs), inf)
                ok = (i_abs >= dlo) & (i_abs < dlo + len(diag)) & (i_abs >= 0)
                out[ok] = diag[i_abs[ok] - dlo]
                return out

            # (i-1, j) and (i, j-1) live on diagonal k-1; (i-1, j-1) on k-2
            best = np.minimum(at(d_prev, plo, ii - 1), at(d_prev, plo, ii))
            if d_prev2 is not None:
                p2lo = max(0, k - m - 1)
                best = np.minimum(best, at(d_prev2, p2lo, ii - 1))
            cur = c + best
        d_prev2, d_prev = d_prev, cur
    total = d_prev[-1]
    return float(total / (n + m)) if np.isfinite(total) else float("inf")


def frame_log_energy(x: np.ndarray, sr: int, frame_ms: int = 20, hop_ms: int = 10) -> np.ndarray:
    """Per-frame log-energy envelope, z-normalized per clip (gain
    invariance) — the cheap alignment feature DTW verify runs on."""
    frame = max(1, int(sr * frame_ms / 1000))
    hop = max(1, int(sr * hop_ms / 1000))
    if len(x) < frame:
        x = np.pad(np.asarray(x, np.float64), (0, frame - len(x)))
    nfr = (len(x) - frame) // hop + 1
    idx = np.arange(frame)[None, :] + hop * np.arange(nfr)[:, None]
    e = np.log10(np.mean(np.asarray(x, np.float64)[idx] ** 2, axis=1) + 1e-12)
    sd = e.std()
    return ((e - e.mean()) / sd if sd > 0 else e - e.mean()).astype(np.float32)


class EnergyEnvelopeStage:
    """``map_batches`` callable: decode each clip and attach its
    z-normalized log-energy envelope (``list<float>``) — the broadcastable
    per-clip feature DTW pair-verify consumes. Undecodable payloads emit
    an empty envelope (never dropped)."""

    def __init__(self, bytes_column: str = "bytes", key_column: str = "clip_id") -> None:
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        ids, envs = [], []
        for key, view in zip(keys, views):
            env = []
            if view is not None and len(view) > 0:
                try:
                    x, sr, _ = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    pass
                else:
                    if len(x):
                        env = frame_log_energy(x, sr).tolist()
            ids.append(None if key is None else str(key))
            envs.append(env)
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "envelope": pa.array(envs, pa.list_(pa.float32())),
            }
        )


class DtwPairVerifyStage:
    """``map_batches`` callable over CANDIDATE PAIRS ``(a, b)``: attach
    the banded-DTW alignment cost of the two clips' broadcast envelopes.
    The envelope lookup rides one ``ray.put`` (KBs per clip — envelopes,
    never payloads); above ~10⁶ clips the documented path is two
    ``hash_join`` passes attaching ``envelope_a`` / ``envelope_b`` before
    a stateless verify (the minhash verify's broadcast→co-partition
    switchover pattern). Pairs whose side failed to decode emit NULL
    cost, never dropped."""

    def __init__(self, env_ref, band_frac: float = 0.25) -> None:
        self.env_ref = env_ref
        self.band_frac = band_frac
        self._env = None

    def _resolve(self):
        if self._env is None:
            import ray

            obj = self.env_ref
            self._env = ray.get(obj) if hasattr(obj, "hex") else obj
        return self._env

    def __call__(self, batch: pa.Table) -> pa.Table:
        env = self._resolve()
        costs = []
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            ea = env.get(a)
            eb = env.get(b)
            if ea is None or eb is None or not len(ea) or not len(eb):
                costs.append(None)
            else:
                costs.append(
                    round(dtw_band(np.asarray(ea)[:, None], np.asarray(eb)[:, None],
                                   self.band_frac), 6)
                )
        return batch.append_column("dtw_cost", pa.array(costs, pa.float64()))


# --- WSOLA time stretch (tempo change, pitch preserved) -----------------------


def wsola_stretch(
    x: np.ndarray,
    sr: int,
    rate: float,
    frame_ms: float = 25.0,
    search_ms: float = 5.0,
) -> np.ndarray:
    """Waveform-Similarity Overlap-Add time stretch: change tempo by
    ``rate`` (>1 = faster/shorter) WITHOUT shifting pitch — the dual of
    resample-based speed perturbation (which shifts both). Hann-windowed
    frames at 50% synthesis overlap; each analysis frame is picked
    within ±``search_ms`` of its nominal position by maximizing
    normalized cross-correlation with the natural continuation of the
    previous frame (the WSOLA criterion). The per-output-frame loop is
    over frames, not samples, and every inner op (correlation via one
    matmul over the candidate matrix, OLA) is vectorized.

    Returns float64 samples of length ≈ ``len(x)/rate``; empty or
    shorter-than-one-frame inputs pass through unchanged."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    x = np.asarray(x, np.float64)
    n = len(x)
    frame = max(4, int(sr * frame_ms / 1000) & ~1)  # even
    hs = frame // 2  # synthesis hop (50% overlap)
    ha = hs * rate  # analysis hop
    delta = max(1, int(sr * search_ms / 1000))
    if n < frame + 2 * delta + 1 or abs(rate - 1.0) < 1e-12:
        return x.copy()
    win = np.hanning(frame)
    out_len = int(round(n / rate)) + frame
    out = np.zeros(out_len + frame)
    norm = np.zeros(out_len + frame)
    n_frames = max(1, int((n - frame - delta) / ha))
    # first frame anchors at 0
    prev_start = 0
    seg = x[0:frame]
    out[0:frame] += seg * win
    norm[0:frame] += win
    for k in range(1, n_frames):
        nominal = int(round(k * ha))
        lo = max(0, nominal - delta)
        hi = min(n - frame, nominal + delta)
        if hi < lo:
            break
        # natural continuation of the previous pick: its second half
        target = x[prev_start + hs : prev_start + hs + frame]
        if len(target) < frame:
            break
        cand_starts = np.arange(lo, hi + 1)
        cand = x[cand_starts[:, None] + np.arange(frame)[None, :]]
        scores = cand @ target  # one matmul per frame, no sample loop
        e = np.sqrt((cand * cand).sum(axis=1)) * np.sqrt(target @ target)
        with np.errstate(invalid="ignore", divide="ignore"):
            ncc = np.where(e > 0, scores / e, 0.0)
        best = int(cand_starts[np.argmax(ncc)])
        pos = k * hs
        out[pos : pos + frame] += x[best : best + frame] * win
        norm[pos : pos + frame] += win
        prev_start = best
    y = out[: int(round(n / rate))]
    nz = norm[: len(y)] > 1e-8
    y[nz] = y[nz] / norm[: len(y)][nz]
    return y


class TimeStretchStage:
    """``map_batches`` callable: WSOLA tempo augmentation — per-clip
    deterministic rate pick (stable id hash, same convention as
    ``SpeedPerturbStage``) or all rates via ``emit_all``; output clips
    re-encoded at the ORIGINAL sample rate so duration scales by
    ``1/rate`` while pitch is preserved (the property pytest gates:
    stretched pure tones keep f0 within 2% while resample-based speed
    perturbation shifts it by the factor). Undecodable payloads emit
    ``decode_ok=false`` rows with null bytes."""

    def __init__(
        self,
        rates: tuple = (0.9, 1.0, 1.1),
        emit_all: bool = False,
        bytes_column: str = "bytes",
        key_column: str = "clip_id",
    ) -> None:
        if not rates or any(r <= 0 for r in rates):
            raise ValueError("rates must be positive and non-empty")
        self.rates = tuple(float(r) for r in rates)
        self.emit_all = emit_all
        self.bytes_column = bytes_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fs_schema_validator_ray.state.sketches import hash64

        views = binary_views(batch.column(self.bytes_column))
        keys = batch.column(self.key_column).to_pylist()
        kh = hash64(np.asarray([str(k) for k in keys], dtype=object))
        picked = np.asarray(self.rates)[
            (kh % np.uint64(len(self.rates))).astype(np.int64)
        ]
        ids, rates_out, blobs, oks, nsamp = [], [], [], [], []
        for key, view, pick in zip(keys, views, picked):
            kid = None if key is None else str(key)
            rates = self.rates if self.emit_all else (float(pick),)
            decoded = None
            if view is not None and len(view) > 0:
                try:
                    decoded = audio.decode(view)
                except (audio.AudioDecodeError, ValueError):
                    decoded = None
            for r in rates:
                ids.append(kid)
                rates_out.append(float(r))
                if decoded is None:
                    blobs.append(None)
                    oks.append(False)
                    nsamp.append(None)
                else:
                    xx, sr, _ = decoded
                    y = wsola_stretch(np.asarray(xx, np.float64), sr, r)
                    blobs.append(audio.encode(y, sr, "pcm_s16le"))
                    oks.append(True)
                    nsamp.append(len(y))
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "rate": pa.array(rates_out, pa.float64()),
                "decode_ok": pa.array(oks, pa.bool_()),
                "n_samples": pa.array(nsamp, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
            }
        )
