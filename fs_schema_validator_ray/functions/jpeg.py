"""From-scratch baseline JPEG codec (stdlib + numpy — no imaging lib).

Completes the raster trio (``png.py``, ``gif.py``): SOF0 baseline
sequential JPEG, the reference's primary raster fixture format
(``/root/reference/tests/fixtures/image.jpg``).

* ``decode_jpeg(data) -> (h, w, 3) uint8 RGB`` — marker parse (DQT /
  SOF0 / DHT / DRI / SOS, APPn+COM skipped), byte-unstuffed entropy
  stream, canonical-Huffman block decode (DC predict + extend, AC
  run-length, EOB/ZRL), dequantize → dezigzag → 8×8 IDCT (orthonormal
  basis matmul, batched over all blocks per component), chroma
  upsampling for any h×v sampling factors, BT.601 YCbCr→RGB. Grayscale
  decodes replicated to RGB. Malformed input raises :class:`JpegError`.
* ``encode_jpeg(rgb, quality=90, subsample=False)`` — the matching
  baseline encoder for tests/corpus: forward DCT + quantization
  (quality-scaled tables), 4:4:4 or 4:2:0, and SELF-BUILT canonical
  Huffman tables from the actual symbol frequencies (JPEG carries its
  tables in DQT/DHT, so the encoder need not use the Annex K defaults —
  the decoder is fully table-driven either way).

Performance shape: per-block Huffman decoding is a Python loop
(inherently sequential bit stream — the format's nature); dequantize /
IDCT / color convert are batched numpy over all blocks. Validation-scale
images decode in milliseconds; the hot corpus path remains PNG.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed / unsupported JPEG payload."""


# zigzag scan order: index z -> (row, col) flat position
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# base luminance/chrominance quant tables (ITU T.81 Annex K examples —
# published reference tables; any table is legal, the stream carries it)
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _dct_basis() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    c[0] /= np.sqrt(2.0)
    return c  # orthonormal: X = C @ x @ C.T, x = C.T @ X @ C


_C = _dct_basis()


# --- bit I/O -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "acc", "bits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def read(self, n: int) -> int:
        while self.bits < n:
            if self.pos >= len(self.data):
                raise JpegError("entropy stream exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.bits += 8
        self.bits -= n
        out = (self.acc >> self.bits) & ((1 << n) - 1)
        self.acc &= (1 << self.bits) - 1
        return out

    def reset(self) -> None:
        self.acc = 0
        self.bits = 0


class _HuffTable:
    """Canonical Huffman: decode via (length, code) dict walk."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        if len(bits) != 16 or sum(bits) != len(values):
            raise JpegError("inconsistent huffman table")
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoding ---------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Totality guarantee: any malformed payload raises JpegError, never a
    bare IndexError/ValueError/struct.error — validation stages catch
    JpegError only, and one bad row must not kill a map_batches task."""
    try:
        return _decode_jpeg_impl(data)
    except JpegError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise JpegError(f"malformed jpeg ({type(exc).__name__}): {exc}") from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("bad jpeg signature (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None  # (h, w, components)
    restart_interval = 0
    pos = 2
    n = len(data)

    while True:
        if pos + 2 > n:
            raise JpegError("truncated marker stream")
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("no scan data in jpeg")
        if pos + 2 > n:
            raise JpegError("truncated marker stream")
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        if seg_len < 2 or pos + seg_len > n:
            raise JpegError("truncated segment")
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    if i + 64 > len(seg):
                        raise JpegError("truncated DQT")
                    tbl = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.float64)
                    i += 64
                else:
                    if i + 128 > len(seg):
                        raise JpegError("truncated DQT")
                    tbl = (
                        np.frombuffer(seg[i : i + 128], ">u2").astype(np.float64)
                    )
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if len(seg) < 6:
                raise JpegError("truncated SOF header")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            if h < 1 or w < 1:
                raise JpegError("zero image dimension")
            if len(seg) < 6 + 3 * nc:
                raise JpegError("truncated SOF component list")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xff{marker:02x} (baseline only)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise JpegError("truncated DHT header")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                if len(vals) != nv:
                    raise JpegError("truncated DHT")
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            break
        # APPn / COM / others: skipped

    if frame is None:
        raise JpegError("missing SOF0 frame header")
    h, w, comps = frame
    if len(seg) < 1:
        raise JpegError("truncated SOS header")
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise JpegError("truncated SOS component list")
    scan_sel = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        scan_sel.append((cs, tt >> 4, tt & 0x0F))
    if ns != len(comps):
        raise JpegError("progressive / multi-scan streams unsupported")

    # unstuff entropy bytes; collect restart boundaries
    entropy = bytearray()
    restarts = []
    i = pos
    while i < n:
        b = data[i]
        if b == 0xFF:
            if i + 1 >= n:
                raise JpegError("truncated entropy stream")
            m = data[i + 1]
            if m == 0x00:
                entropy.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                restarts.append(len(entropy))
                i += 2
                continue
            if m == 0xD9:
                break
            raise JpegError(f"unexpected marker 0xff{m:02x} in scan")
        entropy.append(b)
        i += 1
    else:
        raise JpegError("missing EOI marker")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # per-component block grids
    comp_info = []
    for (cid, ch, cv, tq), (scs, td, ta) in zip(comps, scan_sel):
        if cid != scs:
            raise JpegError("scan/frame component order mismatch")
        if tq not in qt:
            raise JpegError(f"missing quant table {tq}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise JpegError("missing huffman table")
        bw, bh = mcus_x * ch, mcus_y * cv
        comp_info.append(
            {
                "h": ch, "v": cv,
                "q": qt[tq][_np_argsort_zigzag()],
                "dc": huff[(0, td)], "ac": huff[(1, ta)],
                "coeff": np.zeros((bh * bw, 64), dtype=np.float64),
                "bw": bw,
            }
        )

    br = _BitReader(bytes(entropy))
    preds = [0] * len(comps)
    mcu_count = 0
    next_restart = iter(restarts)
    pending_restart = next(next_restart, None)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if pending_restart is None:
                    raise JpegError("missing restart marker")
                br.reset()
                br.pos = pending_restart
                pending_restart = next(next_restart, None)
                preds = [0] * len(comps)
            for ci, info in enumerate(comp_info):
                for by in range(info["v"]):
                    for bx in range(info["h"]):
                        blk = _decode_block(br, info["dc"], info["ac"], preds, ci)
                        gx = mx * info["h"] + bx
                        gy = my * info["v"] + by
                        info["coeff"][gy * info["bw"] + gx] = blk
            mcu_count += 1

    # dequantize + IDCT, batched per component
    planes = []
    for info in comp_info:
        coeffs = info["coeff"] * info["q"][None, :]
        blocks = coeffs.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        bw = info["bw"]
        bh = blocks.shape[0] // bw
        plane = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid resolution
        ry, rx = vmax // info["v"], hmax // info["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: mcus_y * mcu_h, : mcus_x * mcu_w])

    if len(planes) == 1:
        y = np.clip(planes[0][:h, :w], 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(planes) != 3:
        raise JpegError(f"unsupported component count {len(planes)}")
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


_ZIGZAG_TO_FLAT = None


def _np_argsort_zigzag() -> np.ndarray:
    """Quant tables arrive zigzag-ordered; reorder to flat block order."""
    global _ZIGZAG_TO_FLAT
    if _ZIGZAG_TO_FLAT is None:
        inv = np.empty(64, dtype=np.int64)
        inv[_ZIGZAG] = np.arange(64)
        _ZIGZAG_TO_FLAT = inv
    return _ZIGZAG_TO_FLAT


def _decode_block(br, dc_tbl, ac_tbl, preds, ci) -> np.ndarray:
    out = np.zeros(64)
    t = dc_tbl.decode(br)
    if t > 11:
        raise JpegError("invalid DC category")
    diff = _extend(br.read(t), t) if t else 0
    preds[ci] += diff
    out[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac_tbl.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 0:  # EOB
                break
            if r == 15:  # ZRL
                k += 16
                continue
            raise JpegError("invalid AC run/size symbol")
        k += r
        if k >= 64:
            raise JpegError("AC index overruns block")
        out[_ZIGZAG[k]] = _extend(br.read(s), s)
        k += 1
    return out


# --- encoding ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _canonical_from_freq(freq: dict[int, int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Fixed-length canonical Huffman over the USED symbols: every
    symbol gets length L = ceil(log2(n+1)) (n ≤ 2^L − 1 keeps the
    all-ones code unused, as the spec requires). Simple, valid, and the
    stream carries the table — no Annex K dependency."""
    syms = sorted(freq)
    if not syms:
        syms = [0]
    length = max(1, (len(syms) + 1 - 1).bit_length())
    while (1 << length) - 1 < len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    codes = {}
    code = 0 << 1
    # canonical: first code at this length is 0 shifted through shorter
    # (all-zero-count) lengths — i.e. just 0, incrementing per symbol
    code = 0
    for s in syms:
        codes[s] = (code, length)
        code += 1
    return bits, bytes(syms), codes


def _encode_plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzag-ordered quantized coefficients."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    coeffs = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T).reshape(-1, 64)
    qflat = q[_np_argsort_zigzag()]
    quant = np.round(coeffs / qflat[None, :])
    return quant[:, _ZIGZAG].astype(np.int64)  # zigzag order


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def encode_jpeg(rgb: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """Baseline JPEG bytes for an ``(h, w, 3)`` uint8 RGB array (or
    ``(h, w)`` grayscale). ``subsample=True`` emits 4:2:0 chroma (2×2 Y
    blocks per MCU); otherwise 4:4:4."""
    px = np.asarray(rgb)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")

    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
    else:
        x = px.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = 128.0 + (x[..., 2] - y) / 1.772
        cr = 128.0 + (x[..., 0] - y) / 1.402
        if subsample:
            # pad to even dims, then 2x2 mean
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]

    q0 = _scale_q(_Q_LUM, quality)
    q1 = _scale_q(_Q_CHROM, quality)
    qtabs = [q0, q1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comp_blocks = []
    for plane, (sh, sv), qid in zip(planes, samps, qids):
        tw, th = mcus_x * sh * 8, mcus_y * sv * 8
        padded = _pad_edge(plane, th, tw)
        comp_blocks.append(_encode_plane_blocks(padded, qtabs[qid]))

    # interleave block order per MCU; build symbol streams
    sym_stream = []  # (comp_kind 0=lum 1=chrom, is_dc, symbol, extra_bits_value, n_extra)
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, ((sh, sv), blocks) in enumerate(zip(samps, comp_blocks)):
                bw = mcus_x * sh
                for by in range(sv):
                    for bx in range(sh):
                        gx = mx * sh + bx
                        gy = my * sv + by
                        blk = blocks[gy * bw + gx]
                        kind = 0 if ci == 0 else 1
                        dc = int(blk[0])
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = _category(diff)
                        extra = diff if diff >= 0 else diff + (1 << t) - 1
                        sym_stream.append((kind, 1, t, extra, t))
                        nz = np.flatnonzero(blk[1:])
                        ac = blk[1:]
                        kpos = 0
                        for idx in nz:
                            run = int(idx) - kpos
                            while run > 15:
                                sym_stream.append((kind, 0, 0xF0, 0, 0))
                                run -= 16
                            v = int(ac[idx])
                            s = _category(v)
                            extra = v if v >= 0 else v + (1 << s) - 1
                            sym_stream.append((kind, 0, (run << 4) | s, extra, s))
                            kpos = int(idx) + 1
                        if kpos < 63:
                            sym_stream.append((kind, 0, 0x00, 0, 0))  # EOB

    # build per-(kind, dc/ac) canonical tables from the actual symbols
    freqs = {(k, d): {} for k in (0, 1) for d in (0, 1)}
    for kind, is_dc, sym, _e, _n in sym_stream:
        f = freqs[(kind, is_dc)]
        f[sym] = f.get(sym, 0) + 1
    tables = {}
    for key, f in freqs.items():
        tables[key] = _canonical_from_freq(f)

    bwtr = _BitWriter()
    for kind, is_dc, sym, extra, n_extra in sym_stream:
        code, length = tables[(kind, is_dc)][2][sym]
        bwtr.write(code, length)
        if n_extra:
            bwtr.write(extra, n_extra)
    bwtr.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    zz = _ZIGZAG  # quant tables are emitted in zigzag order
    for tid, q in enumerate(qtabs[: 1 if gray else 2]):
        seg(0xDB, bytes([tid]) + bytes(int(v) for v in q[zz]))
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    seg(0xC0, sof)
    for (kind, is_dc), (bits, vals, _codes) in sorted(tables.items()):
        if gray and kind == 1:
            continue
        tc = 0 if is_dc else 1
        seg(0xC4, bytes([(tc << 4) | kind]) + bytes(bits) + vals)
    sos = bytes([nc])
    for ci in range(nc):
        kind = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (kind << 4) | kind])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(bwtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    th, tw = -(-h // mult) * mult, -(-w // mult) * mult
    return _pad_edge(plane, th, tw)


def _pad_edge(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = plane.shape
    if th == h and tw == w:
        return plane
    return np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")
