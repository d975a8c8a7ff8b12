"""AVIF decode via the system's libavif (ctypes), typed-error gated.

A from-scratch AV1 decoder is out of scope (it is a full video codec:
partition trees, CDF-adaptive entropy coding, restoration filters), so
this module takes the same route the reference itself does at runtime —
the reference validates avif through PIL + the pillow_avif plugin,
i.e. libavif (``/root/reference/fs_schema_validator/schemas/image.py:5``,
``tests/fixtures/image.avif``).  Here the binding is a direct ctypes
load of ``libavif.so`` with NO Python package dependency:

* :func:`avif_available` — True when the shared library loads.
* :func:`decode_avif` — bytes → (h, w, 3) RGB uint8.  The container is
  parsed and the AV1 payload decoded by libavif
  (``avifDecoderReadMemory``); the YUV→RGB step is OURS — we read the
  decoded planes straight out of the stable ``avifImage`` struct head
  (width/height/depth/format/range + plane pointers) and reuse the
  BT.601 fixed-point conversion from :mod:`vp8`, handling 4:0:0 /
  4:2:0 / 4:2:2 / 4:4:4 at 8/10/12-bit depth.  Reading planes directly
  sidesteps the version-fragile ``avifRGBImage`` ABI.
* malformed input raises :class:`AvifError`; a missing library raises
  :class:`AvifUnavailableError` (callers fall back to the marked fake
  decoder — corpus oracles never depend on the library, see
  ``stages/multimodal.py``).

The library plays the decoder role only — exactly the dependency the
reference runs with in production; every surrounding behavior
(dispatch, violations, totality) is this repo's own and is tested with
and without the library present (``tests/test_avif.py``).
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

__all__ = [
    "AvifError",
    "AvifUnavailableError",
    "avif_available",
    "decode_avif",
    "avif_dimensions",
]


class AvifError(ValueError):
    """Malformed / unsupported AVIF payload."""


class AvifUnavailableError(AvifError):
    """libavif shared library not present on this host."""


class _AvifImageHead(ctypes.Structure):
    """Leading fields of ``avifImage`` — stable across libavif 0.9-1.x
    (everything this module reads lives before any field that changed)."""

    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("depth", ctypes.c_uint32),
        ("yuvFormat", ctypes.c_int),  # 1=444 2=422 3=420 4=400
        ("yuvRange", ctypes.c_int),  # 0=limited 1=full
        ("yuvChromaSamplePosition", ctypes.c_int),
        ("yuvPlanes", ctypes.c_void_p * 3),
        ("yuvRowBytes", ctypes.c_uint32 * 3),
        ("imageOwnsYUVPlanes", ctypes.c_int),
        ("alphaPlane", ctypes.c_void_p),
        ("alphaRowBytes", ctypes.c_uint32),
    ]


_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = None  # None = not tried, False = absent


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is None:
            try:
                lib = ctypes.CDLL("libavif.so.15")
            except OSError:
                try:
                    lib = ctypes.CDLL("libavif.so")
                except OSError:
                    _lib = False
                    return None
            lib.avifDecoderCreate.restype = ctypes.c_void_p
            lib.avifImageCreateEmpty.restype = ctypes.c_void_p
            lib.avifDecoderReadMemory.restype = ctypes.c_int
            lib.avifResultToString.restype = ctypes.c_char_p
            _lib = lib
        return _lib or None


def avif_available() -> bool:
    return _load() is not None


def _plane(ptr: int, rows: int, cols: int, row_bytes: int, depth: int) -> np.ndarray:
    """Copy one decoded plane out of libavif memory, normalized to
    8-bit (10/12-bit planes are uint16, shifted down)."""
    if not ptr:
        raise AvifError("decoded avif image is missing a plane")
    nbytes = rows * row_bytes
    buf = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)), shape=(rows, row_bytes)
    )
    _ = nbytes
    if depth == 8:
        return buf[:, :cols].copy()
    wide = buf.view(np.uint16)[:, :cols]
    return (wide >> (depth - 8)).astype(np.uint8)


def decode_avif(data: bytes) -> np.ndarray:
    """Decode an AVIF payload to (h, w, 3) RGB uint8.  AV1 decode by
    libavif; plane extraction + BT.601 conversion ours.  Raises
    :class:`AvifUnavailableError` when the library is absent and
    :class:`AvifError` on malformed input — never an untyped error."""
    lib = _load()
    if lib is None:
        raise AvifUnavailableError("libavif not present")
    dec = lib.avifDecoderCreate()
    img = lib.avifImageCreateEmpty()
    if not dec or not img:  # pragma: no cover
        raise AvifError("libavif allocation failed")
    try:
        res = lib.avifDecoderReadMemory(
            ctypes.c_void_p(dec),
            ctypes.c_void_p(img),
            data,
            ctypes.c_size_t(len(data)),
        )
        if res != 0:
            msg = lib.avifResultToString(res)
            raise AvifError(
                f"libavif decode failed: {msg.decode() if msg else res}"
            )
        head = ctypes.cast(img, ctypes.POINTER(_AvifImageHead)).contents
        w, h, depth = int(head.width), int(head.height), int(head.depth)
        if w == 0 or h == 0 or depth not in (8, 10, 12):
            raise AvifError(f"bad avif geometry {w}x{h}@{depth}")
        fmt = int(head.yuvFormat)
        y = _plane(head.yuvPlanes[0], h, w, int(head.yuvRowBytes[0]), depth)
        if fmt == 4 or not head.yuvPlanes[1]:  # monochrome
            rgb = np.repeat(y[:, :, None], 3, axis=2)
            return _expand_range(rgb, int(head.yuvRange))
        if fmt == 1:  # 4:4:4
            cw, ch = w, h
        elif fmt == 2:  # 4:2:2
            cw, ch = (w + 1) >> 1, h
        elif fmt == 3:  # 4:2:0
            cw, ch = (w + 1) >> 1, (h + 1) >> 1
        else:
            raise AvifError(f"unsupported avif yuv format {fmt}")
        u = _plane(head.yuvPlanes[1], ch, cw, int(head.yuvRowBytes[1]), depth)
        v = _plane(head.yuvPlanes[2], ch, cw, int(head.yuvRowBytes[2]), depth)
        if fmt == 2:  # widen 4:2:2 chroma to 4:4:4 by sample repeat
            u = np.repeat(u, 2, axis=1)[:, :w]
            v = np.repeat(v, 2, axis=1)[:, :w]
            fmt = 1
        if fmt == 1:
            return _yuv444_to_rgb(y, u, v, int(head.yuvRange))
        from fs_schema_validator_ray.functions.vp8 import yuv_to_rgb

        if int(head.yuvRange) == 1:  # full-range: compress to limited first
            y = (16 + ((y.astype(np.int32) * 219 + 127) // 255)).astype(np.uint8)
            u = (16 + ((u.astype(np.int32) * 224 + 127) // 255)).astype(np.uint8)
            v = (16 + ((v.astype(np.int32) * 224 + 127) // 255)).astype(np.uint8)
        return yuv_to_rgb(y, u, v)
    finally:
        lib.avifImageDestroy(ctypes.c_void_p(img))
        lib.avifDecoderDestroy(ctypes.c_void_p(dec))


def _expand_range(rgb: np.ndarray, yuv_range: int) -> np.ndarray:
    if yuv_range == 1:
        return rgb
    x = rgb.astype(np.int32)
    return np.clip(((x - 16) * 255 + 110) // 219, 0, 255).astype(np.uint8)


def _yuv444_to_rgb(y, u, v, yuv_range: int) -> np.ndarray:
    """Integer BT.601 for full-res chroma (limited or full range)."""
    yy = y.astype(np.int32)
    uu = u.astype(np.int32) - 128
    vv = v.astype(np.int32) - 128
    if yuv_range == 0:  # limited → scale luma 219→255, chroma 224→255
        yy = ((yy - 16) * 255 + 110) // 219
        uu = (uu * 255 + 112) // 224
        vv = (vv * 255 + 112) // 224
    r = yy + ((vv * 91881 + 32768) >> 16)
    g = yy - ((uu * 22554 + vv * 46802 + 32768) >> 16)
    b = yy + ((uu * 116130 + 32768) >> 16)
    out = np.empty((*y.shape, 3), np.uint8)
    out[..., 0] = np.clip(r, 0, 255)
    out[..., 1] = np.clip(g, 0, 255)
    out[..., 2] = np.clip(b, 0, 255)
    return out


def avif_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) via a full parse when the library is present,
    None when it is not (callers keep their header-sniff fallback)."""
    if not avif_available():
        return None
    try:
        rgb = decode_avif(data)
    except AvifError:
        return None
    return rgb.shape[1], rgb.shape[0]
