"""From-scratch MJPEG-in-AVI codec + real frame-sample stage: container
round-trips, per-frame decode parity with the JPEG codec, malformed
rejection, planted-corpus contract counts."""

import numpy as np
import pyarrow as pa
import pytest

from fs_schema_validator_ray.functions.jpeg import decode_jpeg, encode_jpeg
from fs_schema_validator_ray.functions.video import (
    VideoError,
    avi_frames,
    decode_avi_frame,
    encode_avi,
    parse_avi,
)


def _frames(n=4, h=20, w=28):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [(xx * k + 3) % 256, (yy + 11 * k) % 256, (xx + yy + k) % 256], 2
        ).astype(np.uint8)
        for k in range(n)
    ]


def test_roundtrip_container_and_frames():
    frames = _frames(5)
    data = encode_avi(frames, fps=12, quality=90)
    info = parse_avi(data)
    assert (info.width, info.height) == (28, 20)
    assert info.total_frames == 5 and info.handler == "MJPG"
    assert info.us_per_frame == 1_000_000 // 12
    got = avi_frames(data)
    assert len(got) == 5
    for k, fb in enumerate(got):
        # the frame chunk IS the baseline jpeg: decode parity is exact
        assert np.array_equal(
            decode_avi_frame(fb), decode_jpeg(encode_jpeg(frames[k], quality=90))
        )


def test_single_frame_and_odd_sizes():
    f = _frames(1, 7, 9)
    data = encode_avi(f, fps=1)
    assert len(avi_frames(data)) == 1
    assert decode_avi_frame(avi_frames(data)[0]).shape == (7, 9, 3)


def test_malformed_containers():
    data = encode_avi(_frames(3))
    with pytest.raises(VideoError, match="signature"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(VideoError):
        parse_avi(data[:40])
    with pytest.raises(VideoError, match="no video frames"):
        # strip the movi list: keep RIFF + hdrl only
        movi = data.index(b"movi") - 8
        cut = bytearray(data[:movi])
        import struct

        struct.pack_into("<I", cut, 4, len(cut) - 8)
        parse_avi(bytes(cut))
    with pytest.raises(VideoError, match="Huffman"):
        decode_avi_frame(b"\xff\xd8\xff\xd9")  # DHT-less (Annex-K quirk)


def test_fuzz_totality():
    rng = np.random.default_rng(3)
    good = encode_avi(_frames(3))
    for _ in range(50):
        n = int(rng.integers(0, len(good)))
        try:
            parse_avi(good[:n])
        except VideoError:
            pass
    for _ in range(50):
        data = bytearray(good)
        for _ in range(4):
            data[int(rng.integers(0, len(data)))] ^= int(rng.integers(1, 256))
        try:
            frames = avi_frames(bytes(data))
            for fb in frames:
                try:
                    decode_avi_frame(fb)
                except VideoError:
                    pass
        except VideoError:
            pass


def test_frame_sample_stage_real_and_stub():
    from fs_schema_validator_ray.stages.multimodal import FrameSampleStage

    avi = encode_avi(_frames(6), fps=10)
    batch = pa.table(
        {
            "key": pa.array(["real", "stub"]),
            "bytes": pa.array([avi, b"\x00" * 70000], pa.binary()),
        }
    )
    out = FrameSampleStage(stride=2, max_frames=8, decode=True)(batch).to_pandas()
    real = out[out.key == "real"]
    assert list(real.frame_index) == [0, 1, 2]  # frames 0, 2, 4 sampled
    assert real.decode_ok.all()
    assert real.mean_luma.notna().all()
    stub = out[out.key == "stub"]
    assert len(stub) == 2 and not stub.decode_ok.any()  # stub slices can't decode


def test_corpus_contract_counts():
    from fs_schema_validator_ray.sources.videos import (
        build_videos_table,
        n_frames_of,
    )
    from fs_schema_validator_ray.stages.multimodal import FrameSampleStage

    n = 120
    t = build_videos_table(n)
    out = FrameSampleStage(stride=1, max_frames=8, decode=True)(t).to_pandas()
    expected_rows = sum(n_frames_of(i) for i in range(n) if i % 23 != 0)
    assert len(out) == expected_rows
    bad = {(r.key, r.frame_index) for r in out[~out.decode_ok].itertuples()}
    exp_bad = {
        (f"vid-{i:05d}", i % n_frames_of(i))
        for i in range(n)
        if i % 23 != 0 and i % 11 == 0
    }
    assert bad == exp_bad
