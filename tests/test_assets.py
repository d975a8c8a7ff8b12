"""glTF/GLB + ZIP validators (literal F4/F5 parity): REAL reference
fixture interop with byte-identical reason strings, from-scratch ZIP
walk behaviors, and the corpus-contract stage."""

import io
import json
import struct
import zipfile
from pathlib import Path

import pyarrow as pa
import pytest

from fs_schema_validator_ray.functions.assets import validate_gltf, validate_zip
from fs_schema_validator_ray.sources.assets import (
    build_assets_table,
    build_glb,
    build_zip,
)
from fs_schema_validator_ray.stages.assets import AssetValidateStage

FIXTURES = Path("/root/reference/tests/fixtures")


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference checkout absent")
def test_reference_fixture_interop_exact_strings():
    """The reference validates these exact files via pygltflib
    (`schemas/gltf.py:35-37`); its test pins the corrupted-fixture
    messages (`tests/test_gltf.py:30-38`). Ours must match byte-for-byte."""
    assert validate_gltf((FIXTURES / "asset.glb").read_bytes(), "glb") == []
    assert validate_gltf((FIXTURES / "asset.gltf").read_bytes(), "gltf") == []
    assert validate_gltf((FIXTURES / "corrupted.glb").read_bytes(), "glb") == [
        "failed to deserialize: (<class 'struct.error'>) "
        "unpack requires a buffer of 8 bytes"
    ]
    assert validate_gltf((FIXTURES / "corrupted.gltf").read_bytes(), "gltf") == [
        "failed to deserialize: (<class 'json.decoder.JSONDecodeError'>) "
        "Unterminated string starting at: line 2 column 4 (char 5)"
    ]


def test_gltf_semantics():
    ok = {"asset": {"version": "2.0"}, "nodes": [{"name": "n"}]}
    assert validate_gltf(json.dumps(ok).encode(), "gltf") == []
    empty = {"asset": {"version": "2.0"}, "nodes": []}
    assert validate_gltf(json.dumps(empty).encode(), "gltf") == [
        "file does not contain nodes"
    ]
    assert validate_gltf(b"[1,2]", "gltf")[0].startswith("failed to deserialize")


def test_glb_container_paths():
    doc = {"asset": {"version": "2.0"}, "nodes": [{"name": "x"}]}
    glb = build_glb(doc)
    assert validate_gltf(glb, "glb") == []
    # bad magic
    bad = b"XXXX" + glb[4:]
    assert "bad glb magic" in validate_gltf(bad, "glb")[0]
    # wrong version
    v3 = glb[:4] + struct.pack("<I", 3) + glb[8:]
    assert "unsupported glb version" in validate_gltf(v3, "glb")[0]
    # truncated chunk
    cut = glb[: len(glb) - 5]
    assert validate_gltf(cut, "glb")[0].startswith("failed to deserialize")
    # no JSON chunk
    nojson = glb[:12] + struct.pack("<II", 0, 0x004E4942)
    nojson = nojson[:8] + struct.pack("<I", len(nojson)) + nojson[12:]
    nojson = b"glTF" + struct.pack("<II", 2, 20) + struct.pack("<II", 0, 0x004E4942)
    assert "no JSON chunk" in validate_gltf(nojson, "glb")[0]


def _zip_bytes(entries, method=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as z:
        for name, content in entries:
            z.writestr(name, content)
    return buf.getvalue()


def test_zip_walk_ok_and_failures():
    good = _zip_bytes([("a.txt", "hello " * 50), ("b.bin", b"\x00" * 100)])
    assert validate_zip(good) == []
    stored = _zip_bytes([("s.txt", "stored")], method=zipfile.ZIP_STORED)
    assert validate_zip(stored) == []
    assert validate_zip(b"lol") == ["File is not a zip file"]
    assert validate_zip(b"") == ["File is not a zip file"]
    # corrupt a compressed byte -> crc sweep fails
    bad = bytearray(good)
    name_len = struct.unpack("<H", bad[26:28])[0]
    bad[30 + name_len + 1] ^= 0xFF
    assert validate_zip(bytes(bad)) == ["crc checks failed"]
    # corrupt a STORED byte -> crc mismatch without a zlib error
    bads = bytearray(stored)
    name_len = struct.unpack("<H", bads[26:28])[0]
    bads[30 + name_len] ^= 0xFF
    assert validate_zip(bytes(bads)) == ["crc checks failed"]
    # empty archive is valid
    assert validate_zip(_zip_bytes([])) == []


def test_zip_never_raises_on_garbage():
    import numpy as np

    rng = np.random.default_rng(5)
    good = _zip_bytes([("x.txt", "payload " * 30)])
    for _ in range(60):
        b = bytearray(good)
        for _ in range(4):
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        out = validate_zip(bytes(b))
        assert isinstance(out, list)
    for n in range(0, len(good), 37):
        assert isinstance(validate_zip(good[:n]), list)


def test_corpus_contract_counts():
    t = build_assets_table(1200)
    out = AssetValidateStage()(t)
    reasons = out.column("reason").to_pylist()
    assert len(reasons) == 35
    assert reasons.count("cannot be empty") == 10
    assert reasons.count("file does not contain nodes") == 8
    assert reasons.count("crc checks failed") == 5
    assert reasons.count("File is not a zip file") == 4


def test_zip_builder_corruption_is_detected():
    assert validate_zip(build_zip(7)) == []
    assert validate_zip(build_zip(7, corrupt=True)) == ["crc checks failed"]


def test_query_registered(ray_session):
    from fs_schema_validator_ray.pipelines.queries import QUERIES

    out = QUERIES["asset_validate_corpus"]("/root/testdata/sf0.001")
    assert out.count() == 35


def test_declarative_asset_rules_end_to_end(ray_session, tmp_path):
    """Reference-YAML parity: `type: gltf` / `type: zip` / generic
    `type: asset` rules run inside the fused validation pipeline and
    emit the byte-identical reference reasons."""
    import json as _json
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from fs_schema_validator_ray.pipelines.validate import (
        ValidationRunConfig,
        run_validation,
    )
    from fs_schema_validator_ray.rules import RuleSet
    from fs_schema_validator_ray.sources.assets import _gltf_doc, build_glb, build_zip

    rows = []
    for i in range(24):
        glb = build_glb(_gltf_doc(i)) if i != 3 else b"lol"
        zp = build_zip(i) if i != 5 else build_zip(i, corrupt=True)
        gj = (
            _json.dumps(_gltf_doc(i)).encode()
            if i != 7
            else _json.dumps(_gltf_doc(i, empty_nodes=True)).encode()
        )
        rows.append((f"rec-{i:04d}", glb, zp, gj, "glb"))
    tbl = pa.table(
        {
            "clip_id": [r[0] for r in rows],
            "model": pa.array([r[1] for r in rows], pa.binary()),
            "archive": pa.array([r[2] for r in rows], pa.binary()),
            "scene_json": pa.array([r[3] for r in rows], pa.binary()),
            "model_fmt": [r[4] for r in rows],
        }
    )
    src = tmp_path / "assets_tbl"
    src.mkdir()
    pq.write_table(tbl, src / "part-0.parquet")

    rules = RuleSet.from_yaml(
        """
schema:
  - type: gltf
    bytes_column: model
    format: glb
  - type: zip
    bytes_column: archive
  - type: asset
    bytes_column: scene_json
    format: gltf
    rule: scene_check
"""
    )
    assert len(rules.asset_rules()) == 3
    cfg = ValidationRunConfig(
        input_path=str(src),
        rules=rules,
        output_dir=str(tmp_path / "run"),
    )
    res = run_validation(cfg)
    v = res.violations_dataset().to_pandas()
    got = {(r.key, r.rule_id, r.reason) for r in v.itertuples()}
    assert got == {
        (
            "rec-0003",
            "gltf_model",
            "failed to deserialize: (<class 'struct.error'>) "
            "unpack requires a buffer of 8 bytes",
        ),
        ("rec-0005", "zip_archive", "crc checks failed"),
        ("rec-0007", "scene_check", "file does not contain nodes"),
    }
    assert res.exit_code() == 1


def test_asset_rule_yaml_validation():
    from fs_schema_validator_ray.rules import RuleSet, RuleSetError

    with pytest.raises(RuleSetError, match="format"):
        RuleSet.from_yaml("schema:\n  - type: asset\n    bytes_column: b\n")
    with pytest.raises(RuleSetError, match="unknown asset format"):
        RuleSet.from_yaml("schema:\n  - type: gltf\n    format: obj\n")
    with pytest.raises(RuleSetError, match="cannot set format"):
        RuleSet.from_yaml("schema:\n  - type: zip\n    format: glb\n")
