"""glTF / GLB 3-D asset and ZIP archive validators — the reference's
F4/F5 payload kinds validated LITERALLY (beyond the audio analogues the
engine already ships).

Reference parity (`/root/reference/fs_schema_validator/schemas/gltf.py:29-46`,
`schemas/zip.py:19-32`):

* glTF (JSON) / GLB (binary container): deserialize, then assert the
  semantic non-emptiness ``len(nodes) > 0``. Violations:
  ``"failed to deserialize: ({type}) {msg}"`` and
  ``"file does not contain nodes"``. The GLB parse mirrors the
  reference's field order (length fields unpacked before the magic
  check) so the corrupted-fixture error strings match BYTE-FOR-BYTE —
  ``tests/fixtures/corrupted.glb`` yields the same
  ``struct.error`` message here as through pygltflib there, and
  ``corrupted.gltf`` the same ``json.decoder.JSONDecodeError`` text.
* ZIP: from-scratch container walk (EOCD scan → central directory →
  per-entry local headers) + the full-payload CRC32 sweep stdlib
  ``ZipFile.testzip()`` performs. Violations: ``"crc checks failed"``
  and the stdlib-compatible ``"File is not a zip file"``. Stored and
  DEFLATE entries (``zlib.decompress(raw, -15)``, same stdlib-zlib
  budget as the PNG codec); ZIP64 archives are out of scope and report
  as unreadable rather than silently passing.

All validators return a list of violation reason strings (empty =
valid) and never raise on malformed payloads (codec-totality
convention)."""

from __future__ import annotations

import json
import struct
import zlib

_GLB_JSON = 0x4E4F534A  # 'JSON'
_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def _gltf_nodes_check(doc) -> list[str]:
    if not isinstance(doc, dict):
        return ["failed to deserialize: (<class 'TypeError'>) gltf root is not an object"]
    nodes = doc.get("nodes") or []
    if len(nodes) == 0:
        return ["file does not contain nodes"]
    return []


def validate_gltf(data: bytes, fmt: str = "gltf") -> list[str]:
    """Violation reasons for a glTF (``fmt="gltf"``, JSON) or GLB
    (``fmt="glb"``, binary) payload; [] = valid."""
    if fmt == "gltf":
        try:
            doc = json.loads(data.decode("utf-8"))
        except Exception as e:  # json/unicode errors → reference reason shape
            return [f"failed to deserialize: ({type(e)}) {e}"]
        return _gltf_nodes_check(doc)
    if fmt != "glb":
        return [f"unknown gltf format {fmt!r}"]
    try:
        # reference field order: header ints unpack BEFORE the magic
        # check (pygltflib), so a truncated header raises struct.error
        # with the identical message
        version, length = struct.unpack("<II", data[4:12])
        magic = data[:4]
        if magic != b"glTF":
            raise ValueError(f"bad glb magic {magic!r}")
        if version != 2:
            raise ValueError(f"unsupported glb version {version}")
        pos = 12
        doc = None
        while pos + 8 <= min(length, len(data)):
            clen, ctype = struct.unpack("<II", data[pos : pos + 8])
            body = data[pos + 8 : pos + 8 + clen]
            if len(body) != clen:
                raise ValueError("truncated glb chunk")
            if ctype == _GLB_JSON:
                doc = json.loads(body.decode("utf-8"))
                break
            pos += 8 + clen
        if doc is None:
            raise ValueError("glb has no JSON chunk")
    except Exception as e:
        return [f"failed to deserialize: ({type(e)}) {e}"]
    return _gltf_nodes_check(doc)


def validate_zip(data: bytes) -> list[str]:
    """Violation reasons for a ZIP archive; [] = valid. The reference's
    two behaviors: structurally-not-a-zip → stdlib ``BadZipFile``
    message, any entry failing its CRC32 sweep → ``"crc checks
    failed"``."""
    # EOCD scan from the end (comment can be up to 64 KiB)
    tail = data[-(65_536 + 22):] if len(data) > 65_536 + 22 else data
    i = tail.rfind(_EOCD_SIG)
    if i < 0 or len(tail) - i < 22:
        return ["File is not a zip file"]
    eocd = tail[i : i + 22]
    n_entries, cd_size, cd_off = struct.unpack("<H", eocd[10:12])[0], *struct.unpack(
        "<II", eocd[12:20]
    )
    cd = data[cd_off : cd_off + cd_size]
    pos = 0
    try:
        for _ in range(n_entries):
            if cd[pos : pos + 4] != _CDIR_SIG:
                return ["Bad magic number for central directory"]
            (
                method,
                crc,
                csize,
                usize,
                name_len,
                extra_len,
                comment_len,
            ) = struct.unpack("<H4xIIIHHH", cd[pos + 10 : pos + 34])
            (local_off,) = struct.unpack("<I", cd[pos + 42 : pos + 46])
            pos += 46 + name_len + extra_len + comment_len
            if 0xFFFFFFFF in (csize, usize, local_off):
                return ["zip64 archives are not supported"]
            # local header: its OWN name/extra lengths (may differ)
            lh = data[local_off : local_off + 30]
            if lh[:4] != _LOCAL_SIG:
                return ["Bad magic number for file header"]
            lh_name, lh_extra = struct.unpack("<HH", lh[26:30])
            dstart = local_off + 30 + lh_name + lh_extra
            raw = data[dstart : dstart + csize]
            if len(raw) != csize:
                return ["Truncated file header"]
            if method == 0:
                out = raw
            elif method == 8:
                out = zlib.decompress(raw, -15)
            else:
                return [f"compression method {method} is not supported"]
            if len(out) != usize or (zlib.crc32(out) & 0xFFFFFFFF) != crc:
                return ["crc checks failed"]
    except (struct.error, zlib.error, IndexError):
        return ["crc checks failed"]
    return []
