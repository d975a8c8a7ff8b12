"""Audio feature extraction: ground-truth checks on synthetic tones."""

import numpy as np
import pyarrow as pa
import pytest

from fs_schema_validator_ray import audio
from fs_schema_validator_ray.stages.audio_features import (
    AudioFeatureStage,
    clip_features,
)


def tone(freq, sr=16000, dur_s=1.0, amp=0.5):
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_clip_features_pure_tone():
    sr = 16000
    x = tone(440, sr=sr, dur_s=1.0, amp=0.5)
    f = clip_features(x, sr)
    assert f["n_samples"] == sr
    assert f["duration_ms"] == pytest.approx(1000.0)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2) → 20log10 ≈ -9.03 dB
    assert f["rms_db"] == pytest.approx(-9.03, abs=0.05)
    assert f["peak"] == pytest.approx(0.5, abs=1e-3)
    # a 440 Hz sine crosses zero 2×440 times/sec → ZCR ≈ 880/16000
    assert f["zero_crossing_rate"] == pytest.approx(880 / sr, rel=0.01)
    assert f["spectral_centroid_hz"] == pytest.approx(440, rel=0.05)
    assert f["clipping_ratio"] == 0.0
    assert f["silence_ratio"] < 0.01


def test_clip_features_silence_and_clipping():
    sr = 8000
    silent = np.zeros(sr)
    f = clip_features(silent, sr)
    assert f["silence_ratio"] == 1.0 and f["rms_db"] == float("-inf")
    clipped = np.ones(sr)
    f2 = clip_features(clipped, sr)
    assert f2["clipping_ratio"] == 1.0 and f2["peak"] == 1.0


def test_audio_feature_stage_batch():
    sr = 16000
    payload = audio.encode(tone(1000, sr=sr, dur_s=0.5), sr, "pcm_s16le")
    ulaw = audio.encode(tone(250, sr=sr, dur_s=0.25), sr, "ulaw")
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b", "bad", "empty"]),
            "bytes": pa.array([payload, ulaw, b"notwave", b""], pa.binary()),
        }
    )
    out = AudioFeatureStage()(batch).to_pylist()
    by_id = {r["clip_id"]: r for r in out}
    assert len(out) == 4
    assert by_id["a"]["decode_ok"] and by_id["a"]["codec"] == "pcm_s16le"
    assert by_id["a"]["spectral_centroid_hz"] == pytest.approx(1000, rel=0.05)
    assert by_id["a"]["duration_ms"] == pytest.approx(500.0)
    assert by_id["b"]["decode_ok"] and by_id["b"]["codec"] == "ulaw"
    # µ-law quantization noise adds broadband energy, pulling the
    # magnitude-weighted centroid above the tone frequency — bound it
    # loosely instead of pinning it
    assert 250 <= by_id["b"]["spectral_centroid_hz"] <= 1500
    assert not by_id["bad"]["decode_ok"] and by_id["bad"]["rms_db"] is None
    assert not by_id["empty"]["decode_ok"]


def test_audio_features_query_runs(ray_session):
    from fs_schema_validator_ray.pipelines.queries import audio_features_clips

    out = audio_features_clips("/unused", n_rows=200).to_pandas()
    assert len(out) == 200
    ok = out[out["decode_ok"]]
    # the corpus plants some undecodable clips; the rest must decode with
    # sane features
    assert len(ok) > 150
    assert (ok["duration_ms"] > 0).all()
    assert set(ok["codec"]) <= {"pcm_s16le", "pcm_u8", "ulaw", "alaw"}


def test_resample_stage_roundtrip():
    from fs_schema_validator_ray.stages.audio_features import (
        ResampleStage,
        clip_features,
        resample_linear,
    )

    sr = 16000
    x = tone(440, sr=sr, dur_s=1.0, amp=0.5)
    # direct resampler: 2:1 decimation preserves duration and the tone
    y = resample_linear(x, sr, 8000)
    assert len(y) == 8000
    f = clip_features(y, 8000)
    assert f["spectral_centroid_hz"] == pytest.approx(440, rel=0.05)
    assert f["duration_ms"] == pytest.approx(1000.0)

    batch = pa.table(
        {
            "clip_id": pa.array(["a", "bad"]),
            "bytes": pa.array(
                [audio.encode(x, sr, "ulaw"), b"junk"], pa.binary()
            ),
        }
    )
    out = ResampleStage(target_sr=8000)(batch).to_pylist()
    by_id = {r["clip_id"]: r for r in out}
    assert by_id["a"]["decode_ok"] and by_id["a"]["sr_hz"] == 8000
    dec, sr2, codec = audio.decode(by_id["a"]["bytes"])
    assert sr2 == 8000 and codec == "pcm_s16le" and len(dec) == 8000
    # tone survives the ulaw→resample→pcm16 chain
    f2 = clip_features(dec, sr2)
    assert f2["peak"] == pytest.approx(0.5, abs=0.05)
    assert not by_id["bad"]["decode_ok"] and by_id["bad"]["bytes"] is None


def test_resample_upsample():
    from fs_schema_validator_ray.stages.audio_features import resample_linear

    x = tone(100, sr=8000, dur_s=0.5)
    y = resample_linear(x, 8000, 16000)
    assert len(y) == 8000  # 0.5 s at 16 kHz
    assert np.max(np.abs(y)) == pytest.approx(0.5, abs=0.01)


def test_audio_fingerprint_codec_invariance():
    import numpy as np

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import audio_fingerprint64

    def ham(a, b):
        return bin(a ^ b).count("1")

    fps = []
    worst_same = 0
    for i in range(40):
        cid = f"fp-{i:05d}"
        sr, dur = [(16000, 120), (8000, 90), (44100, 200), (22050, 60)][i % 4]
        x = audio.reference_signal(cid, sr, dur)
        base = audio_fingerprint64(x, sr)
        fps.append(base)
        for codec in ["ulaw", "alaw", "pcm_u8"]:
            y, s, _ = audio.decode(audio.encode(x, sr, codec))
            worst_same = max(worst_same, ham(base, audio_fingerprint64(y, s)))
    # re-encodes stay within the LSH guarantee; distinct content far apart
    assert worst_same <= 3
    d = [ham(fps[i], fps[j]) for i in range(len(fps)) for j in range(i + 1, len(fps))]
    assert np.mean(d) > 20


def test_audio_fingerprint_empty_and_stage_nulls():
    import pyarrow as pa

    from fs_schema_validator_ray.stages.audio_features import (
        AudioFingerprintStage,
        audio_fingerprint64,
    )
    import numpy as np

    assert audio_fingerprint64(np.zeros(0), 16000) == 0
    t = pa.table(
        {
            "clip_id": pa.array(["a", None, "c"]),
            "bytes": pa.array([b"", None, b"\x00garbage"], pa.binary()),
        }
    )
    out = AudioFingerprintStage()(t)
    assert out.column("decode_ok").to_pylist() == [False, False, False]
    assert out.column("fp").to_pylist() == [0, 0, 0]


def test_audio_near_dup_recovers_cross_codec_plants(ray_session):
    import ray.data
    import pyarrow as pa

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import audio_near_dup_pairs

    ids, payloads = [], []
    for i in range(30):
        cid = f"nd-{i:05d}"
        sr, dur = [(16000, 150), (8000, 100)][i % 2]
        x = audio.reference_signal(cid, sr, dur)
        ids.append(cid)
        payloads.append(audio.encode(x, sr, "pcm_s16le"))
        if i % 5 == 0:  # cross-codec re-encode, different bytes
            ids.append(f"{cid}-re")
            payloads.append(audio.encode(x, sr, "ulaw"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "bytes": pa.array(payloads, pa.binary()),
            }
        )
    ).repartition(3)
    pairs = audio_near_dup_pairs(ds).take_all()
    got = {(r["a"], r["b"]) for r in pairs}
    for i in range(0, 30, 5):
        cid = f"nd-{i:05d}"
        assert (cid, f"{cid}-re") in got, f"planted pair {cid} missed"
    for r in pairs:
        assert r["a"] < r["b"]
        assert 0 <= r["hamming"] <= 3


# --- TranscodeStage / SilenceTrimStage --------------------------------------


def test_transcode_to_ulaw_roundtrip_snr():
    from fs_schema_validator_ray.stages.audio_features import TranscodeStage

    sr = 16000
    payload = audio.encode(tone(440, sr=sr, dur_s=0.5), sr, "pcm_s16le")
    batch = pa.table(
        {
            "clip_id": pa.array(["c1", "c2"]),
            "bytes": pa.array([payload, b"not audio"], pa.binary()),
        }
    )
    out = {r["clip_id"]: r for r in TranscodeStage(codec_out="ulaw")(batch).to_pylist()}
    ok = out["c1"]
    assert ok["decode_ok"] and ok["codec_in"] == "pcm_s16le"
    assert ok["codec_out"] == "ulaw" and ok["sr_hz"] == sr
    # the transcoded payload must decode as ulaw with companding-grade SNR
    y, sr2, codec2 = audio.decode(ok["bytes"])
    assert codec2 == "ulaw" and sr2 == sr and len(y) == ok["n_samples"]
    assert 25.0 < ok["snr_db"] < 60.0
    bad = out["c2"]
    assert not bad["decode_ok"] and bad["bytes"] is None


def test_transcode_lossless_target_inf_snr():
    from fs_schema_validator_ray.stages.audio_features import TranscodeStage

    sr = 8000
    payload = audio.encode(tone(100, sr=sr, dur_s=0.2), sr, "pcm_s16le")
    batch = pa.table(
        {"clip_id": pa.array(["a"]), "bytes": pa.array([payload], pa.binary())}
    )
    r = TranscodeStage(codec_out="pcm_s16le")(batch).to_pylist()[0]
    # s16 -> s16 requantization is exact -> infinite SNR
    assert r["snr_db"] == float("inf")


def test_transcode_rejects_unknown_codec():
    from fs_schema_validator_ray.stages.audio_features import TranscodeStage

    with pytest.raises(ValueError, match="unknown target codec"):
        TranscodeStage(codec_out="mp3")


def test_silence_trim_edges():
    from fs_schema_validator_ray.stages.audio_features import SilenceTrimStage

    sr = 16000
    head = np.zeros(sr // 2)  # 500 ms silence
    body = tone(440, sr=sr, dur_s=0.5)  # 500 ms tone
    tail = np.zeros(sr // 4)  # 250 ms silence
    payload = audio.encode(np.concatenate([head, body, tail]), sr, "pcm_s16le")
    batch = pa.table(
        {"clip_id": pa.array(["t"]), "bytes": pa.array([payload], pa.binary())}
    )
    r = SilenceTrimStage(threshold_db=-40.0, frame_ms=25)(batch).to_pylist()[0]
    assert r["decode_ok"] and not r["all_silent"]
    assert r["dur_ms_in"] == pytest.approx(1250.0)
    # trim boundaries land on 25 ms frames
    assert r["trimmed_head_ms"] == pytest.approx(500.0, abs=25.0)
    assert r["trimmed_tail_ms"] == pytest.approx(250.0, abs=25.0)
    assert r["dur_ms_out"] == pytest.approx(500.0, abs=50.0)
    y, _, _ = audio.decode(r["bytes"])
    assert len(y) == pytest.approx(sr * r["dur_ms_out"] / 1000.0, abs=1)


def test_silence_trim_all_silent_and_garbage():
    from fs_schema_validator_ray.stages.audio_features import SilenceTrimStage

    sr = 8000
    silent = audio.encode(np.zeros(sr), sr, "pcm_s16le")
    batch = pa.table(
        {
            "clip_id": pa.array(["s", "g"]),
            "bytes": pa.array([silent, b"xx"], pa.binary()),
        }
    )
    out = {r["clip_id"]: r for r in SilenceTrimStage()(batch).to_pylist()}
    s = out["s"]
    assert s["decode_ok"] and s["all_silent"] and s["bytes"] is None
    assert s["dur_ms_out"] == 0.0 and s["trimmed_head_ms"] == pytest.approx(1000.0)
    g = out["g"]
    assert not g["decode_ok"] and g["bytes"] is None


def test_silence_trim_no_silence_is_identity_span():
    from fs_schema_validator_ray.stages.audio_features import SilenceTrimStage

    sr = 16000
    payload = audio.encode(tone(300, sr=sr, dur_s=0.3), sr, "pcm_s16le")
    batch = pa.table(
        {"clip_id": pa.array(["n"]), "bytes": pa.array([payload], pa.binary())}
    )
    r = SilenceTrimStage()(batch).to_pylist()[0]
    assert r["trimmed_head_ms"] == 0.0 and r["trimmed_tail_ms"] == 0.0
    assert r["dur_ms_out"] == pytest.approx(r["dur_ms_in"])


def test_speed_perturb_changes_length(ray_session):
    """factor f ⇒ n_samples ≈ n/f at the same sample rate; factor is a
    stable function of clip_id (rerun-identical); emit_all triples rows."""
    import ray.data

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import SpeedPerturbStage

    sr = 8000
    x = np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.5  # 1 s tone
    payload = audio.encode(x, sr, "pcm_s16le")
    t = pa.table(
        {
            "clip_id": pa.array([f"c{i}" for i in range(6)]),
            "bytes": pa.array([payload] * 6, pa.binary()),
        }
    )
    out = ray.data.from_arrow(t).map_batches(
        SpeedPerturbStage(), batch_format="pyarrow"
    ).take_all()
    assert len(out) == 6
    for r in out:
        assert r["decode_ok"]
        assert abs(r["n_samples"] - sr / r["factor"]) <= sr * 0.02
    # deterministic: same ids → same factors on a second run
    out2 = ray.data.from_arrow(t).map_batches(
        SpeedPerturbStage(), batch_format="pyarrow"
    ).take_all()
    assert {r["clip_id"]: r["factor"] for r in out} == \
           {r["clip_id"]: r["factor"] for r in out2}
    # emit_all: every factor per clip
    out3 = ray.data.from_arrow(t).map_batches(
        SpeedPerturbStage(emit_all=True), batch_format="pyarrow"
    ).take_all()
    assert len(out3) == 18


def test_quality_gate_filters(ray_session):
    """Gate keeps a healthy clip, drops silence / too-short / undecodable."""
    import ray.data

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import AudioQualityGateStage

    sr = 8000
    good = audio.encode(
        np.sin(2 * np.pi * 300 * np.arange(sr) / sr) * 0.3, sr, "pcm_s16le"
    )
    silent = audio.encode(np.zeros(sr), sr, "pcm_s16le")
    short = audio.encode(np.ones(100) * 0.3, sr, "pcm_s16le")
    t = pa.table(
        {
            "clip_id": pa.array(["good", "silent", "short", "garbage"]),
            "bytes": pa.array([good, silent, short, b"\x00\x01junk"], pa.binary()),
        }
    )
    out = ray.data.from_arrow(t).map_batches(
        AudioQualityGateStage(), batch_format="pyarrow"
    ).take_all()
    assert [r["clip_id"] for r in out] == ["good"]
    assert out[0]["bytes"] == good  # payload passes through untouched


# --- NoiseMixStage / ReverbStage (augmentation) ------------------------------


def _clip_batch(x, sr, clip_id="c1", codec="pcm_s16le"):
    return pa.table(
        {
            "clip_id": pa.array([clip_id], pa.string()),
            "bytes": pa.array([audio.encode(x, sr, codec)], pa.binary()),
        }
    )


def test_noise_mix_hits_target_snr_and_is_deterministic():
    from fs_schema_validator_ray.stages.audio_features import NoiseMixStage

    sr = 16000
    x = tone(440, sr=sr, dur_s=0.5, amp=0.5)
    batch = _clip_batch(x, sr)
    stage = NoiseMixStage(snr_db=20.0)
    out1, out2 = stage(batch), stage(batch)
    assert out1.column("bytes").to_pylist() == out2.column("bytes").to_pylist()
    row = out1.to_pylist()[0]
    assert row["decode_ok"] and row["n_samples"] == len(x)
    y, sr2, _ = audio.decode(row["bytes"])
    assert sr2 == sr
    # achieved SNR within ~0.5 dB of target (pcm16 quantization + limiter)
    noise = y - x[: len(y)]
    snr = 10 * np.log10(np.mean(x**2) / np.mean(noise**2))
    assert snr == pytest.approx(20.0, abs=0.5)


def test_noise_mix_different_clips_get_different_noise():
    from fs_schema_validator_ray.stages.audio_features import NoiseMixStage

    sr = 16000
    x = tone(300, sr=sr, dur_s=0.2, amp=0.4)
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([audio.encode(x, sr, "pcm_s16le")] * 2, pa.binary()),
        }
    )
    out = NoiseMixStage(snr_db=15.0)(batch).to_pylist()
    assert out[0]["bytes"] != out[1]["bytes"]  # per-clip-id noise


def test_noise_mix_silence_passthrough_and_bad_payload():
    from fs_schema_validator_ray.stages.audio_features import NoiseMixStage

    sr = 8000
    silent = np.zeros(400)
    batch = pa.table(
        {
            "clip_id": pa.array(["s", "bad"], pa.string()),
            "bytes": pa.array(
                [audio.encode(silent, sr, "pcm_s16le"), b"\x00garbage"],
                pa.binary(),
            ),
        }
    )
    rows = NoiseMixStage(snr_db=10.0)(batch).to_pylist()
    assert rows[0]["decode_ok"] and rows[0]["noise_rms_db"] is None
    y, _, _ = audio.decode(rows[0]["bytes"])
    assert np.all(y == 0.0)  # silence stays silence (SNR undefined)
    assert rows[1]["decode_ok"] is False and rows[1]["bytes"] is None


def test_reverb_preserves_length_and_is_deterministic():
    from fs_schema_validator_ray.stages.audio_features import ReverbStage

    sr = 16000
    x = tone(440, sr=sr, dur_s=0.3, amp=0.5)
    batch = _clip_batch(x, sr)
    s1, s2 = ReverbStage(rt60_ms=120.0, wet=0.6), ReverbStage(rt60_ms=120.0, wet=0.6)
    out1, out2 = s1(batch), s2(batch)
    assert out1.column("bytes").to_pylist() == out2.column("bytes").to_pylist()
    row = out1.to_pylist()[0]
    assert row["decode_ok"] and row["n_samples"] == len(x)
    y, _, _ = audio.decode(row["bytes"])
    assert len(y) == len(x)
    # wet signal differs from dry but keeps the dry peak bound
    assert not np.allclose(y, x, atol=1e-3)
    assert np.max(np.abs(y)) <= np.max(np.abs(x)) + 1e-3
    # direct path dominates: strong correlation with the dry signal
    corr = float(np.dot(y, x) / (np.linalg.norm(y) * np.linalg.norm(x)))
    assert corr > 0.7
    # per-sample-rate RIR memoized once on the instance (actor state)
    assert set(s1._rirs) == {sr}


def test_reverb_tail_energy_decays():
    """An impulse through the RIR must show the exponential tail: energy
    in the first half of the RT60 window ≫ energy in the second half."""
    from fs_schema_validator_ray.stages.audio_features import ReverbStage

    sr = 8000
    x = np.zeros(2400)
    x[0] = 0.9
    stage = ReverbStage(rt60_ms=120.0, wet=1.0)
    row = stage(_clip_batch(x, sr)).to_pylist()[0]
    y, _, _ = audio.decode(row["bytes"])
    n = int(sr * 0.120)
    e1 = float(np.sum(y[: n // 2] ** 2))
    e2 = float(np.sum(y[n // 2 : n] ** 2))
    assert e1 > 10 * e2


def test_reverb_validates_params():
    from fs_schema_validator_ray.stages.audio_features import ReverbStage

    with pytest.raises(ValueError):
        ReverbStage(rt60_ms=0)
    with pytest.raises(ValueError):
        ReverbStage(wet=1.5)


def test_compressor_attenuates_loud_preserves_quiet():
    from fs_schema_validator_ray.stages.audio_features import CompressorStage

    sr = 16000
    # quiet tone (-32 dB) then loud tone (-4 dB), threshold -20 dB
    quiet = tone(440, sr=sr, dur_s=0.2, amp=0.025)
    loud = tone(440, sr=sr, dur_s=0.2, amp=0.63)
    x = np.concatenate([quiet, loud])
    stage = CompressorStage(threshold_db=-20.0, ratio=4.0, alpha=0.05)
    row = stage(_clip_batch(x, sr)).to_pylist()[0]
    assert row["decode_ok"] and row["n_samples"] == len(x)
    assert row["gain_reduction_db"] < -5.0  # loud section squeezed
    y, _, _ = audio.decode(row["bytes"])
    n = len(quiet)
    # quiet half ~untouched (envelope below threshold)
    assert np.max(np.abs(y[: n // 2] - x[: n // 2])) < 0.01
    # loud half attenuated: peak drops toward threshold^((r-1)/r) law
    assert np.max(np.abs(y[n + n // 4 :])) < 0.8 * np.max(np.abs(x[n + n // 4 :]))
    # deterministic
    row2 = CompressorStage(threshold_db=-20.0, ratio=4.0, alpha=0.05)(
        _clip_batch(x, sr)
    ).to_pylist()[0]
    assert row2["bytes"] == row["bytes"]


def test_compressor_envelope_matches_recurrence():
    from fs_schema_validator_ray.stages.audio_features import _one_pole_envelope

    rng = np.random.default_rng(2)
    x = np.abs(rng.normal(0, 0.3, 700))
    alpha = 0.97  # high alpha stresses the overflow-capped chunking
    env = _one_pole_envelope(x, alpha)
    y = 0.0
    for i in range(len(x)):
        y = alpha * x[i] + (1 - alpha) * y
        assert env[i] == pytest.approx(y, rel=1e-10, abs=1e-14)


def test_compressor_validates_params():
    from fs_schema_validator_ray.stages.audio_features import CompressorStage

    with pytest.raises(ValueError):
        CompressorStage(ratio=0.5)
    with pytest.raises(ValueError):
        CompressorStage(alpha=0.0)


# --- MFCC --------------------------------------------------------------------


def test_mel_filterbank_geometry():
    from fs_schema_validator_ray.stages.audio_features import mel_filterbank

    sr, n_fft = 16000, 400
    fb = mel_filterbank(sr, n_fft, n_mels=26)
    assert fb.shape == (26, n_fft // 2 + 1)
    # every filter has mass; peaks move monotonically up in frequency
    assert (fb.max(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all() and peaks[-1] > peaks[0]
    # a pure tone's energy lands in the filter whose center is nearest
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    f0 = 1000.0
    bin_idx = int(np.argmin(np.abs(freqs - f0)))
    resp = fb[:, bin_idx]
    centers = freqs[peaks]
    assert abs(centers[int(resp.argmax())] - f0) < 200.0


def test_mfcc_amplitude_invariance_and_discrimination():
    """DCT-orthonormality closed form: scaling the waveform moves ONLY
    c0 (constant shift of every log-mel bin); different timbres separate
    in c1..c12."""
    from fs_schema_validator_ray.stages.audio_features import MfccStage, mfcc_features

    stage = MfccStage()
    sr = 16000
    fb, frame, hop = stage._geometry(sr)

    # broadband noise keeps every mel bin above the log floor — the
    # constant-shift property is exact only when no bin is floored
    rng = np.random.default_rng(4)
    x = 0.4 * rng.standard_normal(sr) + 0.3 * tone(880, sr=sr)
    _, c_full = mfcc_features(x, sr, fb, stage._dct, frame, hop)
    _, c_quiet = mfcc_features(0.25 * x, sr, fb, stage._dct, frame, hop)
    # c0 shifts by exactly n_mels-normalized log-power delta; c1.. equal
    assert abs(c_full[0] - c_quiet[0]) > 1.0
    np.testing.assert_allclose(c_full[1:], c_quiet[1:], atol=1e-8)

    _, c_other = mfcc_features(
        0.4 * rng.standard_normal(sr // 2) + tone(3000, sr=sr, dur_s=0.5),
        sr, fb, stage._dct, frame, hop,
    )
    assert np.linalg.norm(c_full[1:] - c_other[1:]) > 1.0


def test_mfcc_stage_batch(ray_session):
    from fs_schema_validator_ray.stages.audio_features import MfccStage

    sr = 16000
    good = audio.encode(tone(440, sr=sr), sr, "pcm_s16le")
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "bad", "b"]),
            "bytes": pa.array([good, b"notaudio", good], pa.binary()),
        }
    )
    out = MfccStage()(batch).to_pylist()
    by_id = {r["clip_id"]: r for r in out}
    assert by_id["bad"]["decode_ok"] is False and by_id["bad"]["mfcc0"] is None
    assert by_id["a"]["decode_ok"] and by_id["a"]["n_frames"] > 90
    # determinism: identical payloads → identical coefficients
    for i in range(13):
        assert by_id["a"][f"mfcc{i}"] == by_id["b"][f"mfcc{i}"]


# --- pitch -------------------------------------------------------------------


def test_pitch_f0_pure_tones():
    from fs_schema_validator_ray.stages.audio_features import pitch_f0

    sr = 16000
    for f in (110.0, 220.0, 440.0):
        n_frames, ratio, f0 = pitch_f0(tone(f, sr=sr), sr)
        assert n_frames > 40 and ratio > 0.9
        assert f0 == pytest.approx(f, rel=0.01), f

    # white noise: autocorrelation peak stays below the voicing threshold
    rng = np.random.default_rng(2)
    n_frames, ratio, f0 = pitch_f0(0.3 * rng.standard_normal(sr), sr)
    assert ratio < 0.2
    # silence: energy gate rejects every frame
    n_frames, ratio, f0 = pitch_f0(np.zeros(sr), sr)
    assert ratio == 0.0 and f0 is None


def test_pitch_stage_batch(ray_session):
    from fs_schema_validator_ray.stages.audio_features import PitchStage

    sr = 16000
    batch = pa.table(
        {
            "clip_id": pa.array(["tone", "bad"]),
            "bytes": pa.array(
                [audio.encode(tone(220, sr=sr), sr, "pcm_s16le"), b"junk"],
                pa.binary(),
            ),
        }
    )
    rows = {r["clip_id"]: r for r in PitchStage()(batch).to_pylist()}
    assert rows["bad"]["decode_ok"] is False and rows["bad"]["f0_hz"] is None
    assert rows["tone"]["decode_ok"] and abs(rows["tone"]["f0_hz"] - 220) < 3


def test_audio_dedup_clusters_recovers_plants(ray_session):
    """End-to-end cluster resolution: every planted cross-codec re-encode
    lands in a multi-member cluster keyed by a representative id (string
    node labels through connected components)."""
    from fs_schema_validator_ray.pipelines.queries import audio_dedup_clusters

    df = audio_dedup_clusters("/unused", n_rows=400, plant_mod=20).to_pandas()
    assert len(df) >= 10  # at least the planted clusters
    assert (df["n"] >= 2).all()  # singletons never emit
    # planted originals are the lexicographic minima of their clusters,
    # so each planted id appears as a representative
    reps = set(df["rep"])
    planted = 0
    for idx in range(0, 400, 20):
        cid = f"clip-{idx // 100:04d}-{idx % 100:06d}"
        if cid in reps:
            planted += 1
    assert planted >= 10


# --- DTW alignment -----------------------------------------------------------


def test_dtw_band_matches_full_dp():
    import numpy as np

    from fs_schema_validator_ray.stages.audio_features import dtw_band

    def brute(a, b):
        a = np.asarray(a, float).reshape(len(a), -1)
        b = np.asarray(b, float).reshape(len(b), -1)
        n, m = len(a), len(b)
        c = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(2))
        D = np.full((n, m), np.inf)
        for i in range(n):
            for j in range(m):
                if i == 0 and j == 0:
                    D[0, 0] = c[0, 0]
                    continue
                prev = min(
                    D[i - 1, j] if i else np.inf,
                    D[i, j - 1] if j else np.inf,
                    D[i - 1, j - 1] if i and j else np.inf,
                )
                D[i, j] = c[i, j] + prev
        return D[-1, -1] / (n + m)

    rng = np.random.default_rng(2)
    for _ in range(60):
        n, m = rng.integers(1, 14, 2)
        a, b = rng.normal(size=(int(n), 3)), rng.normal(size=(int(m), 3))
        assert abs(dtw_band(a, b, band_frac=10.0) - brute(a, b)) < 1e-12


def test_dtw_band_alignment_properties():
    import numpy as np

    from fs_schema_validator_ray.stages.audio_features import dtw_band

    x = np.sin(np.linspace(0, 12, 60))
    assert dtw_band(x, x) == 0.0
    warped = np.interp(np.linspace(0, 59, 54), np.arange(60), x)
    rng = np.random.default_rng(0)
    assert dtw_band(x, warped) < 0.05  # 10% time-compression aligns cheaply
    assert dtw_band(x, rng.normal(size=60)) > 0.2
    assert dtw_band(np.zeros(0), x) == float("inf")


def test_dtw_verify_separates_planted_pairs(ray_session):
    from fs_schema_validator_ray.pipelines.queries import audio_dtw_verify_clips

    out = audio_dtw_verify_clips("unused", n_rows=300, plant_mod=10).to_pandas()
    planted = out[out.b == out.a + "-re"]
    others = out[out.b != out.a + "-re"]
    assert len(planted) >= 20  # the LSH recovered the planted copies
    assert planted.dtw_cost.notna().all()
    # alignment cost separates true duplicates from hash-band collisions
    assert planted.dtw_cost.max() < 0.2
    if len(others):
        assert others.dtw_cost.dropna().min() > planted.dtw_cost.max()


# --- WSOLA time stretch -------------------------------------------------------


def _lag_f0(y, sr):
    import numpy as np

    y = np.asarray(y, float) - np.mean(y)
    ac = np.correlate(y, y, "full")[len(y) - 1 :]
    lo = int(sr / 1000)
    pk = lo + int(np.argmax(ac[lo : int(sr / 80)]))
    return sr / pk


def test_wsola_preserves_pitch_and_scales_duration():
    import numpy as np

    from fs_schema_validator_ray.stages.audio_features import wsola_stretch

    sr = 16000
    t = np.arange(2 * sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    f0_ref = _lag_f0(x, sr)
    for rate in (0.8, 0.9, 1.1, 1.25):
        y = wsola_stretch(x, sr, rate)
        assert abs(len(y) / len(x) - 1 / rate) < 0.01, rate
        # pitch preserved within 2% — the property a plain resample breaks
        assert abs(_lag_f0(y, sr) - f0_ref) / f0_ref < 0.02, rate
    # contrast: resampling to the same duration WOULD shift pitch by the rate
    resampled = np.interp(
        np.linspace(0, len(x) - 1, int(len(x) / 1.25)), np.arange(len(x)), x
    )
    assert abs(_lag_f0(resampled, sr) - 1.25 * f0_ref) / (1.25 * f0_ref) < 0.05
    # identity + degenerate inputs pass through
    assert np.array_equal(wsola_stretch(x, sr, 1.0), x)
    assert len(wsola_stretch(np.zeros(10), sr, 1.3)) == 10


def test_time_stretch_stage(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import TimeStretchStage

    sr = 16000
    t = np.arange(sr) / sr
    payload = audio.encode(0.4 * np.sin(2 * np.pi * 330 * t), sr, "pcm_s16le")
    tbl = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([payload, b"junk"], pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            TimeStretchStage(rates=(0.9, 1.1), emit_all=True), batch_format="pyarrow"
        )
        .take_all()
    )
    assert len(out) == 4
    by = {(r["clip_id"], r["rate"]): r for r in out}
    for rate in (0.9, 1.1):
        r = by[("a", rate)]
        assert r["decode_ok"] and abs(r["n_samples"] - sr / rate) < sr * 0.01
        y, sr2, _ = audio.decode(r["bytes"])
        assert sr2 == sr and len(y) == r["n_samples"]
        assert abs(_lag_f0(y, sr) - 330) / 330 < 0.03
        assert by[("b", rate)]["decode_ok"] is False
