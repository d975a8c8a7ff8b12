"""Round-4 quantitative gates promoting rows-only operators (VERDICT r3
item 7): grouped-HLL ε-bound vs exact distinct counts, resample SNR vs
the regenerated reference, and the two new corpus-contract queries."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def test_grouped_hll_epsilon_vs_exact(ray_session):
    """HLL(p=12) per-key estimates must sit within 5% of the exact
    per-key distinct counts (σ ≈ 1.04/√4096 ≈ 1.6%, so 5% ≈ 3σ)."""
    import duckdb

    from fs_schema_validator_ray.stages.unique import grouped_hll_distinct

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "user_id"]
    )
    got = grouped_hll_distinct(ds, "event_type", "user_id", p=12).to_pandas()
    exact = duckdb.sql(
        f"""SELECT event_type, COUNT(DISTINCT user_id) AS n
            FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"""
    ).df()
    exact_by_key = dict(zip(exact["event_type"], exact["n"]))
    assert set(got["event_type"]) == set(exact_by_key)
    for _, row in got.iterrows():
        true_n = exact_by_key[row["event_type"]]
        err = abs(row["distinct_estimate"] - true_n) / max(true_n, 1)
        assert err <= 0.05, (row["event_type"], row["distinct_estimate"], true_n)


def test_resample_snr_vs_reference():
    """Linear-interp resampling of the corpus reference signal must
    reconstruct the 16 kHz reference to ≥18 dB when the source rate has
    full bandwidth (≥16 kHz source; exact at same-rate). Upsampling from
    8 kHz cannot recreate the missing band and is exempt by design."""
    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import resample_linear

    for sr in (16_000, 22_050, 44_100, 48_000):
        for dur in (60, 240):
            cid = f"clip-0000-{sr % 997:06d}"
            x = audio.reference_signal(cid, sr, dur)
            y = resample_linear(x, sr, 16_000)
            ref = audio.reference_signal(cid, 16_000, dur)
            n = min(len(y), len(ref))
            err = y[:n] - ref[:n]
            p_err = float(np.mean(err**2))
            if p_err == 0:
                continue  # same-rate identity
            snr = 10 * np.log10(float(np.mean(ref[:n] ** 2)) / p_err)
            assert snr >= 18.0, (sr, dur, snr)
    # length law: n_out = max(1, round(n_in * ratio)); empty stays empty
    assert len(resample_linear(np.zeros(0), 8000, 16000)) == 0
    assert len(resample_linear(np.zeros(480), 8000, 16000)) == 960
    assert len(resample_linear(np.zeros(1323), 22050, 16000)) == 960


def test_resample_stage_emits_input_dims():
    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import ResampleStage

    sig = audio.reference_signal("clip-0000-000001", 22_050, 100)
    payload = audio.encode(sig, 22_050, "pcm_s16le")
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b"]),
            "bytes": pa.array([payload, b""], pa.binary()),
        }
    )
    out = ResampleStage(target_sr=16_000)(batch).to_pylist()
    good = next(r for r in out if r["clip_id"] == "a")
    assert good["decode_ok"] and good["sr_in"] == 22_050
    assert good["n_samples_in"] == len(sig)
    assert good["n_samples"] == round(len(sig) * 16_000 / 22_050)
    bad = next(r for r in out if r["clip_id"] == "b")
    assert not bad["decode_ok"] and bad["sr_in"] is None


def test_contract_queries_gate_planted_classes(ray_session):
    """The two new driver-checkable contract queries flag exactly the
    planted classes: dur_mismatch → count_ok=0, undecodable → 0/NULL."""
    from fs_schema_validator_ray.pipelines.queries import (
        audio_chunk_contract,
        audio_resample_contract,
    )

    res = audio_resample_contract("unused", n_rows=600).to_pandas()
    assert len(res) == 600
    bad = res[~res["decode_ok"]]
    # classes 17 (truncated) and 101 (empty) within 600 rows: idx 17, 526, 101
    assert len(bad) == 3
    assert res[res["decode_ok"]]["len_ok"].eq(1).all()
    assert res[res["decode_ok"]]["sr_hz"].eq(16_000).all()

    chunk = audio_chunk_contract("unused", n_rows=600).to_pandas()
    # 600 rows minus the dup pair (460, 461)
    assert len(chunk) == 598
    fails = chunk[chunk["count_ok"].eq(0)]["clip_id"].tolist()
    # 17, 526 (truncated), 101 (empty), 281 (dur_mismatch) — and idx 191
    # (sr_null) is NULL, not a failure
    assert sorted(fails) == [
        "clip-0000-000017",
        "clip-0000-000101",
        "clip-0001-000131",
        "clip-0003-000076",
    ]
    assert chunk["count_ok"].isna().sum() == 1
