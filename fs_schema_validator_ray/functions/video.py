"""From-scratch MJPEG-in-AVI video container codec (stdlib + numpy).

Upgrades the video frame-sample path from a marked stub to a REAL
format: AVI is a RIFF container (same framing as WAV/WebP, public
Microsoft spec) and Motion-JPEG frames are plain baseline JPEGs — which
``functions/jpeg.py`` already decodes. The reference has no video
analogue (SURVEY §2.6: "video frame-sample / pixel decode plumbing");
this makes the plumbing genuinely end-to-end for one real container:

* ``parse_avi(data) -> AviInfo`` — RIFF walk: ``hdrl`` (``avih`` main
  header: µs/frame, total frames, dims) + first ``strl`` video stream
  (``strh`` fourcc, ``strf`` BITMAPINFOHEADER), then the ``movi`` list's
  ``00dc``/``00db`` chunks as frame byte ranges. Malformed input raises
  :class:`VideoError` (codec-totality convention).
* ``avi_frames(data)`` — list of raw frame payloads (zero-copy slices).
* ``decode_avi_frame(frame)`` — MJPEG frame = baseline JPEG. Frames
  that omit DHT (a legal MJPEG quirk: some encoders rely on the Annex-K
  default tables) raise a typed error rather than guessing.
* ``encode_avi(frames, fps=10, quality=85)`` — minimal single-stream
  MJPEG writer for tests/corpus (every decoder path has an
  encoder-driven round-trip, like the image codecs).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fs_schema_validator_ray.functions.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


class VideoError(ValueError):
    """Malformed / unsupported video payload."""


@dataclass(frozen=True)
class AviInfo:
    width: int
    height: int
    us_per_frame: int
    total_frames: int
    handler: str  # video stream fourcc, e.g. "MJPG"
    frame_ranges: tuple  # ((offset, length), ...) into the payload


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_len, next_pos) in a RIFF region."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + ln > end:
            raise VideoError("truncated avi chunk")
        yield tag, body, ln
        pos = body + ln + (ln & 1)


def parse_avi(data: bytes) -> AviInfo:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoError("bad avi container signature")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_len, len(data))

    us_per_frame = 0
    total_frames = 0
    width = height = 0
    handler = ""
    frames: list[tuple[int, int]] = []
    saw_avih = False

    def walk_list(pos: int, stop: int) -> None:
        nonlocal us_per_frame, total_frames, width, height, handler, saw_avih
        for tag, body, ln in _chunks(data, pos, stop):
            if tag == b"LIST":
                if ln < 4:
                    raise VideoError("truncated LIST chunk")
                kind = data[body : body + 4]
                if kind == b"movi":
                    for ftag, fbody, fln in _chunks(data, body + 4, body + ln):
                        # ##dc = compressed video, ##db = uncompressed
                        if ftag[2:4] in (b"dc", b"db"):
                            frames.append((fbody, fln))
                else:
                    walk_list(body + 4, body + ln)
            elif tag == b"avih":
                if ln < 40:
                    raise VideoError("truncated avih header")
                us_per_frame, _rate, _pad, _flags, total_frames = struct.unpack(
                    "<IIIII", data[body : body + 20]
                )
                width, height = struct.unpack("<II", data[body + 32 : body + 40])
                saw_avih = True
            elif tag == b"strh":
                if ln < 8:
                    raise VideoError("truncated strh header")
                if data[body : body + 4] == b"vids" and not handler:
                    handler = data[body + 4 : body + 8].decode(
                        "ascii", errors="replace"
                    )

    walk_list(12, end)
    if not saw_avih:
        raise VideoError("missing avih main header")
    if width < 1 or height < 1:
        raise VideoError("zero video dimension")
    if not frames:
        raise VideoError("no video frames in movi list")
    return AviInfo(
        width=int(width),
        height=int(height),
        us_per_frame=int(us_per_frame),
        total_frames=int(total_frames) or len(frames),
        handler=handler,
        frame_ranges=tuple(frames),
    )


def avi_frames(data: bytes) -> list[bytes]:
    info = parse_avi(data)
    return [data[o : o + n] for o, n in info.frame_ranges]


def decode_avi_frame(frame: bytes) -> np.ndarray:
    """MJPEG frame → (h, w, 3) uint8 RGB. DHT-less frames (legal MJPEG
    relying on Annex-K default tables) are rejected with a typed error —
    injecting guessed tables would fake agreement."""
    if b"\xff\xc4" not in frame:
        raise VideoError(
            "MJPEG frame without Huffman tables (Annex-K defaults not bundled)"
        )
    try:
        return decode_jpeg(frame)
    except JpegError as exc:
        raise VideoError(f"undecodable MJPEG frame: {exc}") from exc


def encode_avi(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Single-stream MJPEG AVI for an iterable of (h, w, 3) uint8 RGB
    frames (all the same shape)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != frames[0].shape:
            raise ValueError("all frames must share one shape")
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0, 0x10,                   # padding, AVIF_HASINDEX off (no idx1)
        len(payloads),             # dwTotalFrames
        0, 1, 0,                   # initial frames, streams, buffer size
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1), 0,
                      len(payloads), max_bytes, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )  # BITMAPINFOHEADER, biCompression 'MJPG'
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
