"""From-scratch GIF decoder/encoder (stdlib-only — no imaging library).

Companion to ``functions/png.py``: GIF87a/GIF89a LZW decoding so the
image corpus's second container format also validates and decodes on
REAL pixels. Scope is validation-grade: the FIRST image frame decodes to
``(h, w, 3)`` uint8 RGB (animation frames beyond the first, disposal and
transparency compositing are out of scope — the reference's PIL
``verify`` equivalent is "the stream parses and the first frame's pixel
data is intact").

* ``decode_gif(data)`` — header + logical screen descriptor, global /
  local color tables, extension-block skipping, sub-block
  reassembly, variable-width LZW decompression (clear/EOI codes, 4096-
  entry table), 4-pass interlace. Malformed input raises
  :class:`GifError` with a human-readable reason.
* ``encode_gif(indices, palette, interlace=False)`` — the matching
  encoder used by the synthetic corpus and round-trip tests. Emits
  fixed-width LZW (literal codes with periodic CLEAR before the code
  width would grow) — valid per spec, simple, deterministic.

LZW decode is a per-code Python loop (inherently sequential); bounded
by OUTPUT pixels, and validation-corpus frames are small. The hot
full-corpus path stays PNG (vectorized inflate/unfilter).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Malformed / unsupported GIF payload."""


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _read_color_table(data: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    end = off + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    return np.frombuffer(data[off:end], np.uint8).reshape(n, 3), end


def _read_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    parts = []
    n = len(data)
    while True:
        if off >= n:
            raise GifError("truncated data sub-blocks")
        size = data[off]
        off += 1
        if size == 0:
            return b"".join(parts), off
        if off + size > n:
            raise GifError("truncated data sub-blocks")
        parts.append(data[off : off + size])
        off += size


def _lzw_decode(blob: bytes, min_code_size: int, max_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): codes start at
    ``min_code_size + 1`` bits, table grows to 4096 entries, CLEAR
    resets, EOI terminates. Returns palette indices."""
    # GIF palette indices are at most 8-bit, so the spec caps the LZW
    # minimum code size at 8; 9-11 would need >256 base entries and
    # cannot occur in a valid stream.
    if not (2 <= min_code_size <= 8):
        raise GifError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader state
    bits = 0
    acc = 0
    pos = 0
    blen = len(blob)

    out = np.empty(max_pixels, dtype=np.uint8)
    out_n = 0

    # code table: python list of bytes (index strings)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        while bits < width:
            if pos >= blen:
                raise GifError("LZW stream ended without EOI code")
            acc |= blob[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW code out of range")
        if out_n + len(entry) > max_pixels:
            raise GifError("LZW output exceeds frame size")
        out[out_n : out_n + len(entry)] = np.frombuffer(entry, np.uint8)
        out_n += len(entry)
        prev = table[code] if code < len(table) else entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if out_n != max_pixels:
        raise GifError(f"LZW produced {out_n} pixels, frame needs {max_pixels}")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF payload to ``(h, w, 3)`` uint8
    RGB (frame dims — the logical screen's first image descriptor)."""
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise GifError("bad gif signature")
    if len(data) < 13:
        raise GifError("truncated header")
    _sw, _sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    off = 13
    palette: np.ndarray | None = None
    if packed & 0x80:
        palette, off = _read_color_table(data, off, 2 << (packed & 0x07))

    n = len(data)
    while True:
        if off >= n:
            raise GifError("missing image descriptor")
        marker = data[off]
        off += 1
        if marker == 0x3B:  # trailer before any image
            raise GifError("no image data in gif")
        if marker == 0x21:  # extension: label + sub-blocks
            if off >= n:
                raise GifError("truncated extension")
            off += 1
            _, off = _read_subblocks(data, off)
            continue
        if marker == 0x2C:
            break
        raise GifError(f"unknown block marker 0x{marker:02x}")

    if off + 9 > n:
        raise GifError("truncated image descriptor")
    _left, _top, w, h, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
    off += 9
    if w < 1 or h < 1:
        raise GifError("zero frame dimension")
    if ipacked & 0x80:
        palette, off = _read_color_table(data, off, 2 << (ipacked & 0x07))
    if palette is None:
        raise GifError("no color table for frame")
    if off >= n:
        raise GifError("missing LZW minimum code size")
    min_code_size = data[off]
    off += 1
    blob, off = _read_subblocks(data, off)
    idx = _lzw_decode(blob, min_code_size, w * h)
    if int(idx.max(initial=0)) >= len(palette):
        raise GifError("palette index out of range")
    frame = idx.reshape(h, w)
    if ipacked & 0x40:  # 4-pass interlace: rows arrive pass-ordered
        out = np.empty_like(frame)
        src = 0
        for start, step in _INTERLACE_PASSES:
            rows = range(start, h, step)
            for r in rows:
                out[r] = frame[src]
                src += 1
        frame = out
    return palette[frame]


# --- encoding ---------------------------------------------------------------


def _lzw_encode_fixed(indices: np.ndarray, min_code_size: int) -> bytes:
    """Fixed-width LZW: every pixel emits as a literal code at
    ``min_code_size + 1`` bits, with a CLEAR code inserted before the
    decoder's table would force a width increase. Spec-valid, simple,
    deterministic (no compression)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # decoder table grows by 1 per literal after the first; reset before
    # it reaches 2^width (when the decoder would widen)
    budget = (1 << width) - clear - 3
    out = bytearray()
    acc = 0
    bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    since_clear = 0
    for v in indices:
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(int(v))
        since_clear += 1
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode one palette-indexed frame as GIF89a bytes. ``indices``:
    ``(h, w)`` uint8; ``palette``: ``(n, 3)`` uint8 with ``n`` a power
    of two ≥ 4."""
    idx = np.asarray(indices, np.uint8)
    pal = np.asarray(palette, np.uint8)
    h, w = idx.shape
    n_colors = len(pal)
    if n_colors < 4 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 4")
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("index out of palette range")
    pal_bits = n_colors.bit_length() - 1
    min_code_size = max(2, pal_bits)

    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.append(idx[start::step])
        stream = np.concatenate(rows).ravel()
    else:
        stream = idx.ravel()

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    blob = _lzw_encode_fixed(stream, min_code_size)
    for i in range(0, len(blob), 255):
        chunk = blob[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# --- animated GIF (GIF89a GCE/Netscape, public spec) -------------------------
#
# Same honesty model as functions/webp.py / png.py animation: frame PIXELS
# ride the gated LZW/interlace core above; the code here is only the
# multi-frame demux (Graphic Control Extension, NETSCAPE2.0 loop count,
# per-frame rects + local color tables) and canvas composition (disposal
# none/background/previous, binary transparency via the GCE transparent
# index). Disposal "restore to background" clears to TRANSPARENT (the
# behavior every modern renderer implements; the spec's background-color
# fill is unused in practice — documented determinism choice).


def decode_gif_anim(data: bytes) -> dict:
    """Decode an animated GIF to composited canvases.

    Returns ``{"canvas_w", "canvas_h", "loop_count", "frames":
    [{"rgba", "delay_cs", "rect", "disposal", "transparent_index"}]}`` —
    each ``rgba`` is the full canvas (h, w, 4) after that frame.
    Composition: canvas starts fully transparent; a frame's
    transparent-index pixels leave the canvas unchanged; disposal 2
    clears the rect to transparent, 3 restores its pre-render content.
    Raises :class:`GifError` on malformed input (totality
    convention)."""
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise GifError("bad gif signature")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw < 1 or sh < 1:
        raise GifError("zero canvas dimension")
    off = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        gct, off = _read_color_table(data, off, 2 << (packed & 0x07))

    n = len(data)
    loop_count = 0
    frames = []
    gce = None  # (disposal, transparent_index_or_None, delay_cs)
    canvas = np.zeros((sh, sw, 4), np.uint8)
    while True:
        if off >= n:
            raise GifError("missing trailer")
        marker = data[off]
        off += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            if off >= n:
                raise GifError("truncated extension")
            label = data[off]
            off += 1
            blob, off = _read_subblocks(data, off)
            if label == 0xF9:  # Graphic Control Extension
                if len(blob) != 4:
                    raise GifError("bad GCE length")
                flags = blob[0]
                delay = blob[1] | (blob[2] << 8)
                trans = blob[3] if flags & 0x01 else None
                gce = ((flags >> 2) & 0x07, trans, delay)
            elif label == 0xFF and blob[:11] == b"NETSCAPE2.0":
                if len(blob) >= 14 and blob[11] == 1:
                    loop_count = blob[12] | (blob[13] << 8)
            continue
        if marker != 0x2C:
            raise GifError(f"unknown block marker 0x{marker:02x}")
        if off + 9 > n:
            raise GifError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
        off += 9
        if w < 1 or h < 1:
            raise GifError("zero frame dimension")
        if left + w > sw or top + h > sh:
            raise GifError("frame rect outside logical screen")
        pal = gct
        if ipacked & 0x80:
            pal, off = _read_color_table(data, off, 2 << (ipacked & 0x07))
        if pal is None:
            raise GifError("no color table for frame")
        if off >= n:
            raise GifError("missing LZW minimum code size")
        min_code_size = data[off]
        off += 1
        blob, off = _read_subblocks(data, off)
        idx = _lzw_decode(blob, min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(pal):
            raise GifError("palette index out of range")
        frame = idx.reshape(h, w)
        if ipacked & 0x40:
            out = np.empty_like(frame)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    out[r] = frame[src]
                    src += 1
            frame = out
        disposal, trans, delay = gce if gce is not None else (0, None, 0)
        gce = None
        rect = canvas[top : top + h, left : left + w]
        saved = rect.copy() if disposal == 3 else None
        opaque = (
            np.ones((h, w), bool) if trans is None else frame != trans
        )
        rect[opaque, :3] = pal[frame][opaque]
        rect[opaque, 3] = 255
        frames.append(
            {
                "rgba": canvas.copy(),
                "delay_cs": delay,
                "rect": (left, top, w, h),
                "disposal": disposal,
                "transparent_index": trans,
            }
        )
        if disposal == 2:
            rect[:] = 0
        elif disposal == 3:
            rect[:] = saved
    if not frames:
        raise GifError("no image data in gif")
    return {
        "canvas_w": sw,
        "canvas_h": sh,
        "loop_count": loop_count,
        "frames": frames,
    }


def gif_is_animated(data: bytes) -> bool:
    """True when the payload is a GIF with more than one image
    descriptor (cheap block walk, no pixel decode)."""
    if not data.startswith((b"GIF87a", b"GIF89a")) or len(data) < 13:
        return False
    packed = data[10]
    off = 13
    if packed & 0x80:
        off += 3 * (2 << (packed & 0x07))
    n = len(data)
    images = 0
    try:
        while off < n:
            marker = data[off]
            off += 1
            if marker == 0x3B:
                break
            if marker == 0x21:
                off += 1
                _, off = _read_subblocks(data, off)
                continue
            if marker != 0x2C:
                return False
            if off + 9 > n:
                return False
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
            off += 9
            if ipacked & 0x80:
                off += 3 * (2 << (ipacked & 0x07))
            off += 1  # min code size
            _, off = _read_subblocks(data, off)
            images += 1
            if images > 1:
                return True
    except GifError:
        return False
    return False


def encode_gif_anim(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    *,
    palette: np.ndarray,
    loop_count: int = 0,
) -> bytes:
    """Assemble an animated GIF (fixture/test support — inverse of
    :func:`decode_gif_anim`). Each frame dict: ``indices`` (fh, fw)
    uint8 into the shared ``palette``, ``x``/``y``, ``delay_cs``,
    ``disposal``, optional ``transparent_index``."""
    pal = np.asarray(palette, np.uint8)
    n_colors = len(pal)
    if n_colors < 4 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 4")
    pal_bits = n_colors.bit_length() - 1
    min_code_size = max(2, pal_bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", canvas_w, canvas_h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 loop extension
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
    out += bytes([3, 1, loop_count & 0xFF, (loop_count >> 8) & 0xFF, 0])
    for f in frames:
        idx = np.asarray(f["indices"], np.uint8)
        fh, fw = idx.shape
        trans = f.get("transparent_index")
        flags = ((int(f.get("disposal", 0)) & 0x07) << 2) | (
            0x01 if trans is not None else 0
        )
        delay = int(f.get("delay_cs", 5))
        out += bytes([0x21, 0xF9, 4, flags, delay & 0xFF, (delay >> 8) & 0xFF,
                      trans if trans is not None else 0, 0])
        out += struct.pack(
            "<BHHHHB", 0x2C, int(f.get("x", 0)), int(f.get("y", 0)), fw, fh, 0
        )
        out.append(min_code_size)
        blob = _lzw_encode_fixed(idx.ravel(), min_code_size)
        for i in range(0, len(blob), 255):
            chunk = blob[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
