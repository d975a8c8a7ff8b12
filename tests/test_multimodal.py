"""Multimodal binary-column stages: real header sniffing, stubbed decode."""

import struct
import zlib

import pyarrow as pa
import pytest


def make_png(w=4, h=3):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def make_gif(w=5, h=7):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def make_jpeg(w=6, h=2):
    # SOI + SOF0 segment
    sof = struct.pack(">BHH", 8, h, w) + b"\x03"
    return b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof + b"\xff\xd9"


def test_sniff_and_dims():
    from fs_schema_validator_ray.stages.multimodal import (
        parse_image_dims,
        sniff_image_format,
    )

    assert sniff_image_format(make_png()) == "png"
    assert sniff_image_format(make_gif()) == "gif"
    assert sniff_image_format(make_jpeg()) == "jpeg"
    assert sniff_image_format(b"garbage") is None
    assert parse_image_dims(make_png(9, 11), "png") == (9, 11)
    assert parse_image_dims(make_gif(5, 7), "gif") == (5, 7)
    assert parse_image_dims(make_jpeg(6, 2), "jpeg") == (6, 2)


def test_image_validate_stage_golden():
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    batch = pa.table(
        {
            "key": pa.array(["ok", "mismatch", "corrupt", "empty", "toobig"]),
            "bytes": pa.array(
                [make_png(), make_png(), b"\x89PNG\r\n\x1a\nxx", b"", make_gif(900, 900)],
                pa.binary(),
            ),
            "format": pa.array(["png", "gif", "png", "png", "gif"]),
        }
    )
    stage = ImageValidateStage(max_width=100, max_height=100)
    out = stage(batch).to_pylist()
    got = {(r["key"], r["reason"]) for r in out}
    assert got == {
        ("mismatch", "payload is not in gif format (got png)"),
        ("corrupt", "failed to parse png header"),
        ("empty", "cannot be empty"),
        ("toobig", "image dimensions 900x900 outside bounds"),
    }


def test_pixel_decode_requires_decoder():
    from fs_schema_validator_ray.stages.multimodal import PixelDecodeStage

    with pytest.raises(NotImplementedError):
        PixelDecodeStage()


def test_pixel_decode_with_fake(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.multimodal import (
        FakePixelDecoder,
        PixelDecodeStage,
    )

    t = pa.table(
        {
            "key": pa.array(["a", "b", "bad"]),
            "bytes": pa.array([make_png(8, 8), make_gif(4, 4), b"junk"], pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            PixelDecodeStage,
            fn_constructor_kwargs={"decoder_factory": FakePixelDecoder},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=2,
        )
        .to_pandas()
        .sort_values("key")
    )
    assert list(out["key"]) == ["a", "b"]  # bad payload skipped
    assert list(out["width"]) == [8, 4]
    assert (out["entropy8"] > 0).all()
    # deterministic: same payload → same features
    again = PixelDecodeStage(decoder_factory=FakePixelDecoder)(t)
    assert again.column("mean_luma").to_pylist()[0] == out["mean_luma"].iloc[0]


def test_frame_sample_stage():
    from fs_schema_validator_ray.stages.multimodal import FrameSampleStage

    t = pa.table(
        {
            "key": pa.array(["v1", "v2"]),
            "bytes": pa.array([b"x" * 300_000, b""], pa.binary()),
        }
    )
    out = FrameSampleStage(every_n_bytes=100_000, max_frames=3)(t).to_pylist()
    assert [(r["key"], r["frame_index"], r["byte_offset"]) for r in out] == [
        ("v1", 0, 0),
        ("v1", 1, 100_000),
        ("v1", 2, 200_000),
    ]
    assert all(len(r["frame_bytes"]) == 256 for r in out)
