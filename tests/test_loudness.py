"""BS.1770 / EBU-R128-style K-weighted gated loudness conformance gates.

Quantitative ground truths: the ITU 48 kHz coefficient table, the
997 Hz full-scale-sine = −3.01 LUFS conformance point, exact gain
covariance, and gating behavior on loud+silence programs.
"""

from __future__ import annotations

import numpy as np

from fs_schema_validator_ray.stages.audio_features import (
    integrated_lufs,
    k_weighting_coeffs,
)

# ITU-R BS.1770-4 table coefficients at 48 kHz (public spec values)
ITU_SHELF_B = [1.53512485958697, -2.69169618940638, 1.19839281085285]
ITU_SHELF_A = [1.0, -1.69065929318241, 0.73248077421585]
ITU_HP_B = [1.0, -2.0, 1.0]
ITU_HP_A = [1.0, -1.99004745483398, 0.99007225036621]


def test_k_weighting_reproduces_itu_48k_table():
    bs, as_, bh, ah = k_weighting_coeffs(48000)
    assert np.max(np.abs(bs - ITU_SHELF_B)) < 2e-13
    assert np.max(np.abs(as_ - ITU_SHELF_A)) < 2e-13
    assert np.max(np.abs(bh - ITU_HP_B)) == 0.0
    assert np.max(np.abs(ah - ITU_HP_A)) < 2e-13


def test_997hz_full_scale_sine_reads_minus_3_01_lufs():
    # BS.1770 conformance: a 0 dBFS 997 Hz sine on one channel with
    # weight 1.0 indicates −3.01 LKFS (the −0.691 offset cancels the
    # K-weighting gain at 997 Hz by construction)
    cache: dict = {}
    for sr in (48000, 44100, 32000):
        t = np.arange(int(sr * 2.0)) / sr
        lufs, nb, ng = integrated_lufs(np.sin(2 * np.pi * 997.0 * t), sr, cache)
        assert abs(lufs - (-3.01)) < 0.05, (sr, lufs)
        assert nb == ng == 17
    # lower rates keep the bilinear warp small but nonzero
    t = np.arange(32000) / 16000
    lufs, _, _ = integrated_lufs(np.sin(2 * np.pi * 997.0 * t), 16000, cache)
    assert abs(lufs - (-3.01)) < 0.2


def test_gain_covariance_exact():
    cache: dict = {}
    sr = 16000
    t = np.arange(sr) / sr
    x = 0.1 * np.sin(2 * np.pi * 440.0 * t)
    base, _, _ = integrated_lufs(x, sr, cache)
    for g_db in (6.0, 20.0, -12.0):
        shifted, _, _ = integrated_lufs(x * 10 ** (g_db / 20), sr, cache)
        # gating selection is scale-covariant → shift is exact
        assert abs((shifted - base) - g_db) < 1e-9, g_db


def test_gating_ignores_trailing_silence():
    cache: dict = {}
    sr = 16000
    t = np.arange(sr) / sr
    loud = 0.5 * np.sin(2 * np.pi * 997.0 * t)
    program = np.concatenate([loud, np.zeros(3 * sr)])
    l_loud, _, _ = integrated_lufs(loud, sr, cache)
    l_prog, nb, ng = integrated_lufs(program, sr, cache)
    # gated loudness tracks the loud segment (boundary blocks legitimately
    # contribute a little); an UN-gated mean over 4× the duration would sit
    # ~6 dB lower
    assert abs(l_prog - l_loud) < 1.0
    assert ng < nb  # silence blocks were actually gated out
    naive = -0.691 + 10 * np.log10(np.mean(loud**2) / 4)
    assert l_prog > naive + 4.0


def test_silence_and_short_clips_are_undefined():
    cache: dict = {}
    assert integrated_lufs(np.zeros(32000), 16000, cache)[0] is None
    assert integrated_lufs(np.ones(100) * 0.5, 16000, cache)[0] is None  # < 1 block
    assert integrated_lufs(np.zeros(0), 16000, cache) == (None, 0, 0)


def test_loudness_stage_planted_attenuation(ray_session):
    import pyarrow as pa
    import ray

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import LoudnessStage

    sr = 16000
    t = np.arange(sr) / sr
    sig = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    payload = audio.encode(sig, sr, "pcm_s16le")
    tbl = pa.table(
        {
            "clip_id": pa.array([f"c{i}" for i in range(6)], pa.string()),
            "bytes": pa.array([payload] * 5 + [b"notaudio"], pa.binary()),
            "gain": pa.array([1.0, 1.0, 10 ** (-24 / 20), 1.0, 10 ** (-24 / 20), 1.0]),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            LoudnessStage(loud_threshold_lufs=-20.0, gain_column="gain"),
            batch_format="pyarrow",
        )
        .take_all()
    )
    by = {r["clip_id"]: r for r in out}
    assert by["c0"]["loud"] and by["c1"]["loud"] and by["c3"]["loud"]
    assert by["c2"]["loud"] is False and by["c4"]["loud"] is False
    assert by["c5"]["decode_ok"] is False and by["c5"]["loud"] is None
    assert abs(by["c0"]["lufs"] - by["c2"]["lufs"] - 24.0) < 0.1
