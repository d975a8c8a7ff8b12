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
                            "decode_ok": True,
                        }
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=RESAMPLE_SCHEMA)


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
