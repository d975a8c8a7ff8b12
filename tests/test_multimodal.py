"""Multimodal binary-column stages: real header sniffing, stubbed decode."""

import struct
import zlib

import pyarrow as pa
import pytest


def make_png(w=4, h=3):
    # REAL raster via the from-scratch codec (deep decode must pass)
    import numpy as np

    from fs_schema_validator_ray.functions.png import encode_png

    rng = np.random.default_rng(w * 100 + h)
    return encode_png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def make_header_only_png(w=4, h=3):
    # valid IHDR, no IDAT — sniffs + parses dims but fails deep decode
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


def test_image_validate_deep_decode():
    """Reference PIL-parity: valid header + corrupt pixel data emits
    "file does not contain a valid image" ONLY via the real decode."""
    from fs_schema_validator_ray.sources.images import corrupt_idat
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    batch = pa.table(
        {
            "key": pa.array(["good", "no_idat", "bad_idat"]),
            "bytes": pa.array(
                [make_png(6, 5), make_header_only_png(6, 5), corrupt_idat(make_png(6, 5))],
                pa.binary(),
            ),
            "format": pa.array(["png", "png", "png"]),
        }
    )
    got = {(r["key"], r["reason"]) for r in ImageValidateStage()(batch).to_pylist()}
    assert got == {
        ("no_idat", "file does not contain a valid image"),
        ("bad_idat", "file does not contain a valid image"),
    }
    # header-only mode (deep_decode=False) sees nothing wrong
    shallow = ImageValidateStage(deep_decode=False)(batch).to_pylist()
    assert shallow == []


def test_svg_deep_validate():
    """Full XML parse (reference svglib parity): well-formed svg passes,
    sniffable-but-malformed XML emits the reference's svg reason."""
    from fs_schema_validator_ray.stages.multimodal import (
        ImageValidateStage,
        validate_svg,
    )

    good = b'<?xml version="1.0"?><svg xmlns="http://www.w3.org/2000/svg" width="4" height="3"><rect/></svg>'
    bad = b'<svg xmlns="http://www.w3.org/2000/svg"><rect></svg>'  # mismatched tag
    not_svg_root = b"<html><body>x</body></html>"
    assert validate_svg(good)
    assert not validate_svg(bad)
    assert not validate_svg(not_svg_root)

    batch = pa.table(
        {
            "key": pa.array(["good", "bad"]),
            "bytes": pa.array([good, bad], pa.binary()),
            "format": pa.array(["svg", "svg"]),
        }
    )
    got = {(r["key"], r["reason"]) for r in ImageValidateStage()(batch).to_pylist()}
    assert got == {("bad", "file does not contain a valid svg")}


def test_pixel_decode_default_hybrid():
    """Default decoder: REAL pixels for png AND gif (codec parity);
    corrupt payloads drop instead of failing the batch."""
    import numpy as np

    from fs_schema_validator_ray.functions.gif import encode_gif
    from fs_schema_validator_ray.functions.png import decode_png, encode_png
    from fs_schema_validator_ray.sources.images import corrupt_idat
    from fs_schema_validator_ray.stages.multimodal import PixelDecodeStage

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    gidx = rng.integers(0, 16, size=(4, 4), dtype=np.uint8)
    gpal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    t = pa.table(
        {
            "key": pa.array(["png", "gif", "gif_hdr_only", "bad"]),
            "bytes": pa.array(
                [
                    encode_png(px),
                    encode_gif(gidx, gpal),
                    make_gif(4, 4),  # header-only: fails real gif decode
                    corrupt_idat(encode_png(px)),
                ],
                pa.binary(),
            ),
        }
    )
    out = PixelDecodeStage()(t)
    rows = {r["key"]: r for r in out.to_pylist()}
    assert set(rows) == {"png", "gif"}  # corrupt png + header-only gif drop
    assert rows["png"]["mean_luma"] == pytest.approx(
        float(decode_png(encode_png(px)).mean())
    )
    assert rows["gif"]["mean_luma"] == pytest.approx(
        float(gpal[gidx].astype(np.float64).mean())
    )  # exact: the stage reports the channel mean of the REAL gif pixels


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


# --- SVG / TIFF / AVIF (reference's remaining formats, image.py:15-22) ------


def make_tiff(w=10, h=20, endian="<"):
    if endian == "<":
        head = b"II*\x00" + struct.pack("<I", 8)
    else:
        head = b"MM\x00*" + struct.pack(">I", 8)
    # IFD with 2 entries: 256 (width, LONG), 257 (length, SHORT)
    e1 = struct.pack(endian + "HHI I".replace(" ", ""), 256, 4, 1, w)
    e2 = struct.pack(endian + "HHIHH", 257, 3, 1, h, 0)
    return head + struct.pack(endian + "H", 2) + e1 + e2 + struct.pack(endian + "I", 0)


def make_avif(w=30, h=40, brand=b"avif"):
    ftyp = struct.pack(">I", 16) + b"ftyp" + brand + b"mif1"
    ispe = struct.pack(">I", 20) + b"ispe" + b"\x00\x00\x00\x00" + struct.pack(">II", w, h)
    ipco = struct.pack(">I", 8 + len(ispe)) + b"ipco" + ispe
    iprp = struct.pack(">I", 8 + len(ipco)) + b"iprp" + ipco
    meta = struct.pack(">I", 12 + len(iprp)) + b"meta" + b"\x00\x00\x00\x00" + iprp
    return ftyp + meta


def make_svg(w=50, h=60):
    return (
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b"<!-- a comment -->\n"
        b'<!DOCTYPE svg PUBLIC "-//W3C//DTD SVG 1.1//EN" "x.dtd">\n'
        b'<svg xmlns="http://www.w3.org/2000/svg" width="%dpx" height="%d">'
        b"<rect/></svg>" % (w, h)
    )


def test_sniff_svg_tiff_avif():
    from fs_schema_validator_ray.stages.multimodal import (
        parse_image_dims,
        sniff_image_format,
    )

    assert sniff_image_format(make_tiff()) == "tiff"
    assert sniff_image_format(make_tiff(endian=">")) == "tiff"
    assert sniff_image_format(make_avif()) == "avif"
    assert sniff_image_format(make_avif(brand=b"avis")) == "avif"
    # mp4 ftyp is NOT avif
    assert sniff_image_format(struct.pack(">I", 16) + b"ftypisom" + b"mp41") is None
    assert sniff_image_format(make_svg()) == "svg"
    assert sniff_image_format(b"  <svg/>") == "svg"
    assert sniff_image_format(b"<html><svg/></html>") is None
    assert sniff_image_format(b"\xff\xfebinary") is None

    assert parse_image_dims(make_tiff(10, 20), "tiff") == (10, 20)
    assert parse_image_dims(make_tiff(11, 21, endian=">"), "tiff") == (11, 21)
    assert parse_image_dims(make_avif(30, 40), "avif") == (30, 40)
    assert parse_image_dims(make_svg(50, 60), "svg") == (50, 60)
    vb = b'<svg viewBox="0 0 120 80"><rect/></svg>'
    assert parse_image_dims(vb, "svg") == (120, 80)


def test_image_validate_stage_svg_tiff_avif_tristate():
    """Tri-state per new format: ok / declared-mismatch / corrupt — with
    the reference's exact reason strings (image.py:47-52, 64-69)."""
    import numpy as np

    from fs_schema_validator_ray.functions.bmp import encode_tiff
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    # tiff_ok must carry real pixel data: deep_decode now gates tiff strips
    # like every other raster (round-4 ADVICE fix)
    real_tiff = encode_tiff(np.zeros((20, 10, 3), dtype=np.uint8))
    # avif_ok likewise needs a REAL AV1 payload when libavif is present
    # (deep decode now gates avif through the system library); the
    # crafted ftyp-only header still passes when the library is absent
    from pathlib import Path

    from fs_schema_validator_ray.functions.avif import avif_available

    fx = Path("/root/reference/tests/fixtures/image.avif")
    avif_ok = (
        fx.read_bytes() if avif_available() and fx.exists() else make_avif()
    )
    batch = pa.table(
        {
            "key": pa.array(
                [
                    "tiff_ok", "tiff_mismatch", "tiff_corrupt",
                    "avif_ok", "avif_mismatch",
                    "svg_ok", "svg_no_dims", "svg_mismatch", "svg_invalid",
                ]
            ),
            "bytes": pa.array(
                [
                    real_tiff, make_png(), b"II*\x00\xff\xff\xff\xff",
                    avif_ok, make_tiff(),
                    make_svg(), b"<svg><rect/></svg>", make_png(), b"not xml at all",
                ],
                pa.binary(),
            ),
            "format": pa.array(
                ["tiff", "tiff", "tiff", "avif", "avif", "svg", "svg", "svg", "svg"]
            ),
        }
    )
    out = ImageValidateStage()(batch).to_pylist()
    got = {(r["key"], r["reason"]) for r in out}
    assert got == {
        ("tiff_mismatch", "payload is not in tiff format (got png)"),
        ("tiff_corrupt", "failed to parse tiff header"),
        ("avif_mismatch", "payload is not in avif format (got tiff)"),
        ("svg_mismatch", "payload is not in svg format (got png)"),
        ("svg_invalid", "file does not contain a valid svg"),
    }


def test_image_resize_stage(ray_session):
    """Nearest-neighbor resize emits a fixed-size raw RGB payload per
    decodable image; undecodable payloads drop; no factory → stub error."""
    import pytest
    import ray.data

    from fs_schema_validator_ray.stages.multimodal import (
        FakePixelDecoder,
        ImageResizeStage,
    )
    t = pa.table(
        {
            "key": pa.array(["a", "b"]),
            "bytes": pa.array([make_png(10, 7), b"not an image"], pa.binary()),
        }
    )
    out = ray.data.from_arrow(t).map_batches(
        ImageResizeStage(8, 6, decoder_factory=FakePixelDecoder),
        batch_format="pyarrow",
    ).take_all()
    assert [r["key"] for r in out] == ["a"]
    assert out[0]["width"] == 8 and out[0]["height"] == 6
    assert len(out[0]["rgb"]) == 8 * 6 * 3

    # default factory decodes real png pixels: resizing a constant-color
    # png must produce that exact color (nearest-neighbor invariant)
    import numpy as np

    from fs_schema_validator_ray.functions.png import encode_png

    flat = np.full((10, 10, 3), (7, 99, 201), dtype=np.uint8)
    t2 = pa.table(
        {"key": pa.array(["c"]), "bytes": pa.array([encode_png(flat)], pa.binary())}
    )
    r = ImageResizeStage(4, 4)(t2).to_pylist()[0]
    assert np.array_equal(
        np.frombuffer(r["rgb"], np.uint8).reshape(4, 4, 3),
        np.full((4, 4, 3), (7, 99, 201), dtype=np.uint8),
    )


# --- PHashStage --------------------------------------------------------------


def test_phash_properties():
    import numpy as np

    from fs_schema_validator_ray.stages.multimodal import (
        FakePixelDecoder,
        PHashStage,
    )

    stage = PHashStage(lambda: FakePixelDecoder(full_payload_hash=True))
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    h1 = stage.phash64(px)
    assert stage.phash64(px.copy()) == h1  # deterministic
    # small local edit moves few bits
    edited = px.copy()
    edited[:4, :4] = 255 - edited[:4, :4]
    d_small = bin(h1 ^ stage.phash64(edited)).count("1")
    assert d_small <= 10
    # unrelated image is far
    other = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    d_far = bin(h1 ^ stage.phash64(other)).count("1")
    assert d_far > 15


def test_phash_stage_batch_and_corrupt_payloads():
    import pyarrow as pa

    from fs_schema_validator_ray.sources.images import png_bytes
    from fs_schema_validator_ray.stages.multimodal import (
        FakePixelDecoder,
        PHashStage,
    )

    good = png_bytes(20, 12, salt=7)
    batch = pa.table(
        {
            "key": pa.array(["a", "a-copy", "bad"], pa.string()),
            "bytes": pa.array([good, good, b"\x00junk"], pa.binary()),
        }
    )
    out = PHashStage(lambda: FakePixelDecoder(full_payload_hash=True))(batch)
    rows = {r["key"]: r for r in out.to_pylist()}
    assert rows["a"]["decode_ok"] and rows["a-copy"]["decode_ok"]
    assert rows["a"]["fp"] == rows["a-copy"]["fp"]  # identical bytes
    assert rows["bad"]["decode_ok"] is False and rows["bad"]["fp"] is None


def test_phash_near_dup_pairs_finds_planted_copies(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.sources.images import build_images_table
    from fs_schema_validator_ray.stages.dedup import fingerprint64_near_dup_pairs
    from fs_schema_validator_ray.stages.multimodal import PHashStage

    t = build_images_table(200)
    keep = pa.array(np.arange(200) % 8 == 0)
    dup = t.filter(keep)
    import pyarrow.compute as pc

    dup = dup.set_column(
        0, "key", pc.binary_join_element_wise(dup.column("key"), "-copy", "")
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup])).repartition(4)
    # default decoder: REAL png pixels, deterministic fake gif pixels
    fps = ds.map_batches(PHashStage(), batch_format="pyarrow")
    pairs = fingerprint64_near_dup_pairs(
        fps, key_column="key", fp_column="fp", ok_column="decode_ok"
    ).take_all()
    got = {(r["a"], r["b"]) for r in pairs if r["hamming"] == 0}
    # every planted copy except the corrupted index 0 (0 % 97 == 0)
    want = {
        (f"img-{i:06d}", f"img-{i:06d}-copy")
        for i in range(0, 200, 8)
        if i % 97 != 0
    }
    assert want <= got


def test_corpus_golden_violation_counts():
    """Hard gate on the deterministic 4-format corpus at n=2000: exact
    per-class violation counts from ImageValidateStage (sniff failures,
    declared mismatches, deep-decode-only broken pixels)."""
    from collections import Counter

    from fs_schema_validator_ray.sources.images import build_images_table
    from fs_schema_validator_ray.stages.multimodal import ImageValidateStage

    t = build_images_table(2000)
    out = ImageValidateStage()(t).to_pylist()
    kinds = Counter()
    for r in out:
        if "failed to parse" in r["reason"]:
            kinds["parse"] += 1
        elif "not in" in r["reason"]:
            kinds["mismatch"] += 1
        elif "does not contain" in r["reason"]:
            kinds["broken_pixels_or_sniff"] += 1
        else:
            kinds["other"] += 1

    n = 2000
    n_trunc = len([i for i in range(0, n, 97)])
    n_mismatch = len([i for i in range(0, n, 89) if i % 97 != 0])
    n_deep = len([i for i in range(0, n, 101) if i % 97 != 0 and i % 89 != 0])
    # truncated png/webp fail SNIFF (magic cut short) → invalid-image;
    # truncated gif/jpeg still sniff but fail the header parse
    n_trunc_parse = len([i for i in range(0, n, 97) if i % 4 in (1, 2)])
    n_trunc_sniff = n_trunc - n_trunc_parse
    assert kinds["other"] == 0
    assert kinds["mismatch"] == n_mismatch
    assert kinds["parse"] == n_trunc_parse
    assert kinds["broken_pixels_or_sniff"] == n_deep + n_trunc_sniff
    assert len(out) == n_trunc + n_mismatch + n_deep
