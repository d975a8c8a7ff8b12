"""Generator determinism + decode-stage golden violations.

Mirrors the reference's tri-state (ok / corrupted / mismatched) fixture
tests (`/root/reference/tests/test_image.py:33-48`,
`tests/test_gltf.py:25-47`) against the synthetic clips corpus.
"""

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.rules import AudioRule
from fs_schema_validator_ray.sources.clips import (
    PLANTS,
    ClipsConfig,
    build_clips_table,
    build_manifest_table,
    generate_row,
)
from fs_schema_validator_ray.stages.decode import AudioValidateStage

CFG = ClipsConfig(n_rows=1200, rows_per_partition=300)
RULE = AudioRule(rule_id="audio_decode")


def table_for(indices):
    return build_clips_table(CFG, np.asarray(indices))


def reasons_for(idx):
    stage = AudioValidateStage(RULE)
    out = stage(table_for([idx]))
    return [r["reason"] for r in out.to_pylist()]


def test_generation_is_deterministic():
    t1 = table_for(range(50))
    t2 = table_for(range(50))
    assert t1.equals(t2)


def test_clean_rows_pass():
    # rows with no planted class produce zero decode violations
    clean = [i for i in range(100) if CFG.plant_class(i) is None][:20]
    stage = AudioValidateStage(RULE)
    out = stage(table_for(clean))
    assert out.num_rows == 0


def test_truncated_bytes():
    idx = PLANTS["truncated_bytes"]
    assert reasons_for(idx) == [
        "failed to deserialize: (AudioDecodeError) payload too short for a wave header (37 bytes)"
    ]


def test_codec_mismatch():
    idx = PLANTS["codec_mismatch"]
    (reason,) = reasons_for(idx)
    assert reason.startswith("payload is not in ")
    assert "format (got " in reason


def test_empty_bytes_decode():
    idx = PLANTS["empty_bytes"]
    assert reasons_for(idx) == [
        "failed to deserialize: (AudioDecodeError) payload too short for a wave header (0 bytes)"
    ]


def test_dur_zero():
    idx = PLANTS["dur_zero"]
    assert reasons_for(idx) == ["decoded audio contains no samples"]


def test_dur_mismatch():
    idx = PLANTS["dur_mismatch"]
    (reason,) = reasons_for(idx)
    assert "does not match declared dur_ms=" in reason


def test_garbled_transcript():
    idx = PLANTS["transcript_garbled"]
    assert reasons_for(idx) == ["transcript does not match reference"]


def test_codec_invalid_is_mismatch():
    idx = PLANTS["codec_invalid"]
    (reason,) = reasons_for(idx)
    assert reason.startswith("payload is not in mp3 format (got ")


def test_sr_plants_have_no_decode_violation():
    # sr_out_of_range / sr_null rows stay internally consistent — only the
    # scalar rules flag them
    assert reasons_for(PLANTS["sr_out_of_range"]) == []
    assert reasons_for(PLANTS["sr_null"]) == []


def test_duplicate_rows_are_exact_copies():
    idx = PLANTS["duplicate_clip_id"]
    t = table_for([idx - 1, idx])
    rows = t.to_pylist()
    assert rows[0]["clip_id"] == rows[1]["clip_id"]
    assert rows[0]["bytes"] == rows[1]["bytes"]
    assert reasons_for(idx) == []


def test_manifest_coverage():
    manifest = build_manifest_table(CFG)
    ids = set(manifest.column("clip_id").to_pylist())
    missing = CFG.planted_indices("missing_in_manifest")
    assert missing, "fixture must plant manifest gaps at this size"
    for i in missing:
        assert CFG.clip_id(i) not in ids
    # orphans exist only in the manifest
    assert sum(1 for x in ids if x.startswith("orphan-")) == CFG.n_orphan_manifest_rows
    clean = [i for i in range(CFG.n_rows) if CFG.plant_class(i) is None][:10]
    for i in clean:
        assert CFG.clip_id(i) in ids


def test_partition_column():
    t = table_for([0, 299, 300, 899])
    assert t.column("partition_id").to_pylist() == [0, 0, 1, 2]


def test_snr_violation_detected():
    # hand-build a corrupted payload: right header, noise payload
    from fs_schema_validator_ray import audio

    rng = np.random.default_rng(7)
    noise = rng.uniform(-1, 1, 3200)
    payload = audio.encode(noise, 16000, "pcm_s16le")
    batch = pa.table(
        {
            "clip_id": ["clip-0000-000000"],
            "bytes": pa.array([payload], pa.binary()),
            "sr_hz": pa.array([16000], pa.int32()),
            "dur_ms": pa.array([200], pa.int32()),
            "codec": ["pcm_s16le"],
            "transcript": [audio.reference_transcript("clip-0000-000000")],
        }
    )
    out = AudioValidateStage(RULE)(batch)
    reasons = [r["reason"] for r in out.to_pylist()]
    assert len(reasons) == 1 and "snr" in reasons[0] and "below threshold 30.0 dB" in reasons[0]


def test_wav_header_stage_verdicts():
    """Header conformance ground truth: matching declared codec, a
    mismatched tag, a corrupted byte_rate, an unknown declared codec,
    and an unparseable payload."""
    import pyarrow as pa

    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.decode import WavHeaderStage

    x = np.linspace(-0.5, 0.5, 800)
    good = audio.encode(x, 16_000, "pcm_s16le")
    as_ulaw = audio.encode(x, 16_000, "ulaw")
    # corrupt byte_rate in a valid header (offset 28 in the canonical
    # RIFF/fmt layout the encoder writes)
    bad_rate = bytearray(good)
    bad_rate[28:32] = (12345).to_bytes(4, "little")
    batch = pa.table(
        {
            "clip_id": ["ok", "mismatch", "badrate", "unknown", "junk"],
            "bytes": [good, as_ulaw, bytes(bad_rate), good, b"nope"],
            "codec": ["pcm_s16le", "pcm_s16le", "pcm_s16le", "mp3", "pcm_s16le"],
        }
    )
    out = {r["clip_id"]: r for r in WavHeaderStage()(batch).to_pylist()}
    assert out["ok"] == {"clip_id": "ok", "header_ok": True,
                         "declared_match": 1, "rate_ok": 1}
    assert out["mismatch"]["declared_match"] == 0
    assert out["mismatch"]["rate_ok"] == 1  # internally consistent
    assert out["badrate"]["declared_match"] == 1
    assert out["badrate"]["rate_ok"] == 0
    assert out["unknown"]["declared_match"] == 0
    assert out["junk"] == {"clip_id": "junk", "header_ok": False,
                           "declared_match": None, "rate_ok": None}
