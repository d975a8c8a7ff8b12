"""Deterministic synthetic 3-D-asset + archive corpus (gltf/glb/zip)
with planted corruption classes — the FIXTURES-style contract corpus
for the literal F4/F5 validators (``functions/assets.py``).

Index contract (key ``asset-{i:06d}``, format cycles gltf/glb/zip by
``i % 3``; precedence matches the oracle's CASE order):

* ``i % 101 == 0`` — structurally broken payload (``b"lol"``): gltf →
  the exact stdlib JSONDecodeError string, glb → the exact struct.error
  string (the reference's corrupted.glb message), zip → ``File is not
  a zip file``.
* else ``i % 113 == 0`` — empty payload → ``cannot be empty``.
* else ``i % 89 == 0`` — semantic violation: gltf/glb built with
  ``"nodes": []`` → ``file does not contain nodes``; zip with one
  corrupted compressed byte → ``crc checks failed``.
* everything else is valid and emits no violation row.

ZIP fixtures are CREATED with stdlib ``zipfile`` (fixed 1980 timestamp
for determinism — creation is test tooling, validation is the
from-scratch walk), glTF/GLB are built directly."""

from __future__ import annotations

import io
import json
import struct
import zipfile

import pyarrow as pa

ASSETS_CORPUS_VERSION = 1

_GLB_JSON = 0x4E4F534A


def _gltf_doc(i: int, empty_nodes: bool = False) -> dict:
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [] if empty_nodes else [0]}],
        "nodes": [] if empty_nodes else [{"name": f"node-{i}"}],
    }


def build_glb(doc: dict) -> bytes:
    body = json.dumps(doc, separators=(",", ":")).encode()
    if len(body) % 4:
        body += b" " * (4 - len(body) % 4)
    chunk = struct.pack("<II", len(body), _GLB_JSON) + body
    return b"glTF" + struct.pack("<II", 2, 12 + len(chunk)) + chunk


def build_zip(i: int, corrupt: bool = False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        info = zipfile.ZipInfo(f"f{i}.txt", date_time=(1980, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_DEFLATED
        z.writestr(info, f"asset payload {i} " * (i % 7 + 2))
    data = bytearray(buf.getvalue())
    if corrupt:
        # flip a byte inside the first entry's compressed data: local
        # header is 30 bytes + name; +2 lands mid-stream
        name_len = struct.unpack("<H", data[26:28])[0]
        data[30 + name_len + 2] ^= 0xFF
    return bytes(data)


def build_assets_table(n_rows: int = 1200) -> pa.Table:
    keys, payloads, fmts = [], [], []
    for i in range(n_rows):
        fmt = ("gltf", "glb", "zip")[i % 3]
        if i % 101 == 0:
            payload = b"lol"
        elif i % 113 == 0:
            payload = b""
        elif i % 89 == 0:
            if fmt == "gltf":
                payload = json.dumps(_gltf_doc(i, empty_nodes=True)).encode()
            elif fmt == "glb":
                payload = build_glb(_gltf_doc(i, empty_nodes=True))
            else:
                payload = build_zip(i, corrupt=True)
        else:
            if fmt == "gltf":
                payload = json.dumps(_gltf_doc(i)).encode()
            elif fmt == "glb":
                payload = build_glb(_gltf_doc(i))
            else:
                payload = build_zip(i)
        keys.append(f"asset-{i:06d}")
        payloads.append(payload)
        fmts.append(fmt)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
        }
    )
