"""From-scratch lossy-VP8 key-frame decoder (RFC 6386), stdlib + numpy.

This closes the last fake decode path in the image pipeline: the
reference validates lossy-webp payloads for real via PIL + libwebp
(``/root/reference/fs_schema_validator/schemas/image.py:15-22``,
``tests/fixtures/image.webp`` is VP8X + ALPH + VP8); this repo decodes
the same VP8 bitstream from scratch using only the published RFC 6386
semantics and the spec constants in :mod:`vp8_tables`.

Scope: key frames (intra-only) — which is every frame a still-image
WebP can contain.  Covered for real:

* boolean entropy decoder (RFC 6386 §7)
* frame / compressed headers: segmentation, quantizer deltas, loop
  filter params, token-partition layout (§9)
* key-frame intra mode parsing with the above/left sub-mode contexts
  (§11.5) and DCT token decoding with band / neighbour contexts and the
  no-EOB-after-zero rule (§13)
* dequantization with per-segment quantizer indices and the per-plane
  index clamps (§14.1), inverse WHT + inverse DCT with the exact
  fixed-point multipliers (§14.3)
* all 4x4 / 16x16 / chroma intra predictors including the 127/129
  boundary conventions and the top-right replication quirk (§12)
* both loop filters (simple + normal) with segment / delta-adjusted
  levels, interior limits and high-edge-variance logic (§15)

Conformance is gated bit-exactly in ``tests/test_vp8.py`` against
libwebp (via ctypes) as a decode oracle — the same pattern as the
DuckDB SQL oracles: the system library is test scaffolding only; the
decode path itself is pure Python/numpy.

Error contract: malformed payloads raise :class:`Vp8Error`, never an
untyped exception (same totality rule as ``functions/jpeg.py`` — every
header field is bounds-checked before use).
"""

from __future__ import annotations

import numpy as np

from fs_schema_validator_ray.functions.vp8_tables import (
    AC_Q,
    B_DC_PRED,
    B_HE_PRED,
    B_PRED,
    B_TM_PRED,
    B_VE_PRED,
    BMODE_TREE,
    CAT_BASE,
    CAT_PROBS,
    COEF_TREE,
    COEFF_BANDS,
    COEFF_DEFAULT,
    COEFF_UPDATE,
    DC_PRED,
    DC_Q,
    DCT_0,
    DCT_4,
    DCT_CAT1,
    DCT_EOB,
    H_PRED,
    KF_BMODE,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    MB_SEGMENT_TREE,
    TM_PRED,
    UV_MODE_TREE,
    V_PRED,
    ZIGZAG,
)

__all__ = ["Vp8Error", "decode_vp8", "decode_vp8_rgb", "vp8_dimensions"]


class Vp8Error(ValueError):
    """Malformed / unsupported VP8 payload."""


# --- boolean entropy decoder (RFC 6386 §7) -----------------------------------


class _Bool:
    """The VP8 boolean (binary arithmetic) decoder.  Reading past the
    end of the partition yields zero bits — the spec-sanctioned
    behaviour; gross truncation is caught by the partition-size checks
    in the container parse, not here."""

    __slots__ = ("data", "pos", "value", "range", "bit_count", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        b0 = data[0] if self.n > 0 else 0
        b1 = data[1] if self.n > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # renormalize
        r = self.range
        while r < 128:
            self.value <<= 1
            r <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < self.n:
                    self.value |= self.data[self.pos]
                self.pos += 1
        self.range = r
        return ret

    def read_literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read_literal(bits)
        return -v if self.read_bool(128) else v

    def read_flagged_signed(self, bits: int) -> int:
        if self.read_bool(128):
            return self.read_signed(bits)
        return 0

    def read_tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = tree[start + self.read_bool(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.read_bool(probs[i >> 1])]
        return -i


# --- header parsing (RFC 6386 §9) --------------------------------------------


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


class _Header:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_q", "seg_lf",
        "seg_probs", "filter_type", "filter_level", "sharpness",
        "lf_delta", "ref_lf_delta", "mode_lf_delta",
        "n_parts", "base_q", "q_deltas", "use_skip", "skip_prob",
        "coeff_probs",
    )


def _parse_frame_header(data: bytes) -> tuple[_Header, _Bool, int]:
    """Parse the uncompressed frame tag + the compressed header of the
    first partition.  Returns (header, first-partition bool decoder
    positioned at the MB-mode data, first_partition_end_offset)."""
    if len(data) < 10:
        raise Vp8Error("VP8 payload shorter than frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise Vp8Error("not a key frame (WebP stills are always key frames)")
    version = (tag >> 1) & 7
    if version > 3:
        raise Vp8Error(f"bad VP8 version {version}")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 key-frame start code")
    w16 = data[6] | (data[7] << 8)
    h16 = data[8] | (data[9] << 8)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if width == 0 or height == 0:
        raise Vp8Error("zero VP8 frame dimension")
    if 10 + first_part_size > len(data):
        raise Vp8Error("first partition extends past payload end")

    bd = _Bool(data[10 : 10 + first_part_size])
    h = _Header()
    h.width, h.height = width, height
    h.mb_w, h.mb_h = (width + 15) >> 4, (height + 15) >> 4

    bd.read_literal(2)  # color_space + clamping_type

    # segmentation (§9.3)
    h.seg_q = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_probs = [255, 255, 255]
    h.seg_abs = False
    h.seg_update_map = False
    h.seg_enabled = bool(bd.read_bool(128))
    if h.seg_enabled:
        h.seg_update_map = bool(bd.read_bool(128))
        update_data = bd.read_bool(128)
        if update_data:
            h.seg_abs = bool(bd.read_bool(128))
            for i in range(4):
                h.seg_q[i] = bd.read_flagged_signed(7)
            for i in range(4):
                h.seg_lf[i] = bd.read_flagged_signed(6)
        if h.seg_update_map:
            for i in range(3):
                if bd.read_bool(128):
                    h.seg_probs[i] = bd.read_literal(8)

    # loop filter (§9.4)
    h.filter_type = bd.read_bool(128)  # 0 = normal, 1 = simple
    h.filter_level = bd.read_literal(6)
    h.sharpness = bd.read_literal(3)
    h.lf_delta = bool(bd.read_bool(128))
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta and bd.read_bool(128):  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.read_bool(128):
                h.ref_lf_delta[i] = bd.read_signed(6)
        for i in range(4):
            if bd.read_bool(128):
                h.mode_lf_delta[i] = bd.read_signed(6)

    h.n_parts = 1 << bd.read_literal(2)  # §9.5

    # quantizer indices (§9.6)
    h.base_q = bd.read_literal(7)
    h.q_deltas = (
        bd.read_flagged_signed(4),  # y1 dc
        bd.read_flagged_signed(4),  # y2 dc
        bd.read_flagged_signed(4),  # y2 ac
        bd.read_flagged_signed(4),  # uv dc
        bd.read_flagged_signed(4),  # uv ac
    )

    bd.read_bool(128)  # refresh_entropy_probs (§9.7) — meaningless intra

    # token probability updates (§13.4)
    probs = [[[list(c3) for c3 in c2] for c2 in c1] for c1 in COEFF_DEFAULT]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                upd = COEFF_UPDATE[i][j][k]
                row = probs[i][j][k]
                for t in range(11):
                    if bd.read_bool(upd[t]):
                        row[t] = bd.read_literal(8)
    h.coeff_probs = probs

    h.use_skip = bool(bd.read_bool(128))  # §9.10
    h.skip_prob = bd.read_literal(8) if h.use_skip else 0
    return h, bd, 10 + first_part_size


# 16x16 mode → the implied 4x4 sub-mode used as context by neighbours
_YMODE_TO_BMODE = {
    DC_PRED: B_DC_PRED,
    V_PRED: B_VE_PRED,
    H_PRED: B_HE_PRED,
    TM_PRED: B_TM_PRED,
}


def _parse_modes(h: _Header, bd: _Bool):
    """Key-frame per-MB mode parse (§11.5).  Returns parallel lists
    indexed mb_y * mb_w + mb_x."""
    mb_w, mb_h = h.mb_w, h.mb_h
    n = mb_w * mb_h
    seg = [0] * n
    skip = [False] * n
    ymode = [0] * n
    uvmode = [0] * n
    bmodes: list[list[int] | None] = [None] * n
    above = [B_DC_PRED] * (4 * mb_w)
    for my in range(mb_h):
        left = [B_DC_PRED] * 4
        for mx in range(mb_w):
            i = my * mb_w + mx
            if h.seg_update_map:
                seg[i] = bd.read_tree(MB_SEGMENT_TREE, h.seg_probs)
            if h.use_skip:
                skip[i] = bool(bd.read_bool(h.skip_prob))
            ym = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymode[i] = ym
            if ym == B_PRED:
                modes = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above[4 * mx + sx] if sy == 0 else modes[(sy - 1) * 4 + sx]
                        l = left[sy] if sx == 0 else modes[sy * 4 + sx - 1]
                        modes[sy * 4 + sx] = bd.read_tree(
                            BMODE_TREE, KF_BMODE[a][l]
                        )
                bmodes[i] = modes
                above[4 * mx : 4 * mx + 4] = modes[12:16]
                left[:] = (modes[3], modes[7], modes[11], modes[15])
            else:
                b = _YMODE_TO_BMODE[ym]
                above[4 * mx : 4 * mx + 4] = (b, b, b, b)
                left[:] = (b, b, b, b)
            uvmode[i] = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
    return seg, skip, ymode, uvmode, bmodes


def _segment_dequant(h: _Header) -> list[tuple[int, ...]]:
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) factors with the
    §14.1 index clamps (uv-dc index capped at 117, y2-ac floor 8)."""
    out = []
    dy1, dy2dc, dy2ac, duvdc, duvac = h.q_deltas
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_q[s] if h.seg_abs else h.base_q + h.seg_q[s]
        else:
            q = h.base_q
        q = _clamp(q, 0, 127)
        y1dc = DC_Q[_clamp(q + dy1, 0, 127)]
        y1ac = AC_Q[q]
        y2dc = DC_Q[_clamp(q + dy2dc, 0, 127)] * 2
        y2ac = max(8, AC_Q[_clamp(q + dy2ac, 0, 127)] * 155 // 100)
        uvdc = DC_Q[_clamp(q + duvdc, 0, 117)]
        uvac = AC_Q[_clamp(q + duvac, 0, 127)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# --- residual (token) decoding (RFC 6386 §13) --------------------------------


def _decode_coeffs(
    bd: _Bool,
    probs,  # coeff_probs[plane]
    ctx: int,
    first: int,
    dq0: int,
    dq1: int,
    out: np.ndarray,  # int32[16], natural order — written in place
) -> int:
    """Decode one block's tokens; returns 1 if any coefficient is
    non-zero (the neighbour context / filter flag), else 0."""
    n = first
    skip_eob = False
    read_tree = bd.read_tree
    read_bool = bd.read_bool
    while n < 16:
        p = probs[COEFF_BANDS[n]][ctx]
        tok = read_tree(COEF_TREE, p, 2 if skip_eob else 0)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            skip_eob = True
            n += 1
            continue
        skip_eob = False
        if tok <= DCT_4:
            val = tok
        else:
            cat = tok - DCT_CAT1
            extra = 0
            for cp in CAT_PROBS[cat]:
                extra = (extra << 1) | read_bool(cp)
            val = CAT_BASE[cat] + extra
        ctx = 2 if val > 1 else 1
        if read_bool(128):
            val = -val
        out[ZIGZAG[n]] = val * (dq0 if n == 0 else dq1)
        n += 1
    return 1 if n > first else 0


# --- inverse transforms (RFC 6386 §14.3) --------------------------------------


def _idct4x4_many(b: np.ndarray) -> np.ndarray:
    """Exact integer 4x4 inverse DCT, batched over the leading axis
    ((n, 4, 4) → (n, 4, 4); int64 to dodge overflow; Python/numpy ``>>``
    on negatives floors, matching C arithmetic shift)."""
    ip = b.astype(np.int64)
    t = np.empty_like(ip)
    a1 = ip[:, 0] + ip[:, 2]
    b1 = ip[:, 0] - ip[:, 2]
    c1 = ((ip[:, 1] * 35468) >> 16) - (ip[:, 3] + ((ip[:, 3] * 20091) >> 16))
    d1 = (ip[:, 1] + ((ip[:, 1] * 20091) >> 16)) + ((ip[:, 3] * 35468) >> 16)
    t[:, 0] = a1 + d1
    t[:, 3] = a1 - d1
    t[:, 1] = b1 + c1
    t[:, 2] = b1 - c1
    tt = t.transpose(0, 2, 1)
    a1 = tt[:, 0] + tt[:, 2]
    b1 = tt[:, 0] - tt[:, 2]
    c1 = ((tt[:, 1] * 35468) >> 16) - (tt[:, 3] + ((tt[:, 3] * 20091) >> 16))
    d1 = (tt[:, 1] + ((tt[:, 1] * 20091) >> 16)) + ((tt[:, 3] * 35468) >> 16)
    out = np.empty_like(ip)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    return out


def _idct4x4(b: np.ndarray) -> np.ndarray:
    return _idct4x4_many(b[None])[0]


_Z4 = np.zeros((4, 4), np.int64)


def _iwht4x4(b: np.ndarray) -> np.ndarray:
    ip = b.astype(np.int64)
    t = np.empty((4, 4), np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    t[0] = a1 + b1
    t[1] = c1 + d1
    t[2] = a1 - b1
    t[3] = d1 - c1
    tt = t.T
    a1 = tt[0] + tt[3]
    b1 = tt[1] + tt[2]
    c1 = tt[1] - tt[2]
    d1 = tt[0] - tt[3]
    out = np.empty((4, 4), np.int64)
    out[:, 0] = (a1 + b1 + 3) >> 3
    out[:, 1] = (c1 + d1 + 3) >> 3
    out[:, 2] = (a1 - b1 + 3) >> 3
    out[:, 3] = (d1 - c1 + 3) >> 3
    return out


# --- intra prediction (RFC 6386 §12) ------------------------------------------


def _pred_block(
    buf: np.ndarray, r: int, c: int, size: int, mode: int,
    above_avail: bool, left_avail: bool,
) -> np.ndarray:
    """Whole-block prediction (16x16 luma / 8x8 chroma).  ``buf`` is the
    padded plane (boundary row/col baked in); (r, c) index the block's
    top-left inside it.  DC special-cases availability; V/H/TM use the
    synthesized 127/129 edges (§12.2)."""
    above = buf[r - 1, c : c + size].astype(np.int32)
    left = buf[r : r + size, c - 1].astype(np.int32)
    if mode == DC_PRED:
        if above_avail and left_avail:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif above_avail:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif left_avail:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.broadcast_to(above, (size, size)).copy()
    if mode == H_PRED:
        return np.broadcast_to(left[:, None], (size, size)).copy()
    # TM_PRED
    p = int(buf[r - 1, c - 1])
    return np.clip(left[:, None] + above[None, :] - p, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred4(mode: int, A: np.ndarray, L: np.ndarray, P: int) -> np.ndarray:
    """4x4 sub-block predictors (§12.3).  ``A`` = 8 above (incl. the 4
    above-right), ``L`` = 4 left, ``P`` = above-left.  All int32."""
    B = np.empty((4, 4), np.int32)
    if mode == B_DC_PRED:
        B[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        np.clip(L[:, None] + A[None, :4] - P, 0, 255, out=B)
    elif mode == B_VE_PRED:
        x = np.empty(6, np.int32)
        x[0] = P
        x[1:] = A[:5]
        B[:] = _avg3(x[0:4], x[1:5], x[2:6])[None, :]
    elif mode == B_HE_PRED:
        y = np.empty(6, np.int32)
        y[0] = P
        y[1:5] = L
        y[5] = L[3]
        B[:] = _avg3(y[0:4], y[1:5], y[2:6])[:, None]
    elif mode == 4:  # B_LD_PRED
        for r in range(4):
            for c in range(4):
                d = r + c
                if d < 6:
                    B[r, c] = _avg3(int(A[d]), int(A[d + 1]), int(A[d + 2]))
                else:
                    B[r, c] = _avg3(int(A[6]), int(A[7]), int(A[7]))
    elif mode == 5:  # B_RD_PRED
        e = np.empty(9, np.int32)
        e[0:4] = L[::-1]
        e[4] = P
        e[5:9] = A[:4]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                B[r, c] = _avg3(int(e[i - 1]), int(e[i]), int(e[i + 1]))
    elif mode == 6:  # B_VR_PRED
        e = np.empty(9, np.int32)
        e[0:4] = L[::-1]
        e[4] = P
        e[5:9] = A[:4]
        B[3, 0] = _avg3(int(e[1]), int(e[2]), int(e[3]))
        B[2, 0] = _avg3(int(e[2]), int(e[3]), int(e[4]))
        B[3, 1] = B[1, 0] = _avg3(int(e[3]), int(e[4]), int(e[5]))
        B[2, 1] = B[0, 0] = _avg2(int(e[4]), int(e[5]))
        B[3, 2] = B[1, 1] = _avg3(int(e[4]), int(e[5]), int(e[6]))
        B[2, 2] = B[0, 1] = _avg2(int(e[5]), int(e[6]))
        B[3, 3] = B[1, 2] = _avg3(int(e[5]), int(e[6]), int(e[7]))
        B[2, 3] = B[0, 2] = _avg2(int(e[6]), int(e[7]))
        B[1, 3] = _avg3(int(e[6]), int(e[7]), int(e[8]))
        B[0, 3] = _avg2(int(e[7]), int(e[8]))
    elif mode == 7:  # B_VL_PRED
        a = A.astype(np.int64)
        B[0, 0] = _avg2(int(a[0]), int(a[1]))
        B[1, 0] = _avg3(int(a[0]), int(a[1]), int(a[2]))
        B[2, 0] = B[0, 1] = _avg2(int(a[1]), int(a[2]))
        B[1, 1] = B[3, 0] = _avg3(int(a[1]), int(a[2]), int(a[3]))
        B[2, 1] = B[0, 2] = _avg2(int(a[2]), int(a[3]))
        B[3, 1] = B[1, 2] = _avg3(int(a[2]), int(a[3]), int(a[4]))
        B[2, 2] = B[0, 3] = _avg2(int(a[3]), int(a[4]))
        B[3, 2] = B[1, 3] = _avg3(int(a[3]), int(a[4]), int(a[5]))
        B[2, 3] = _avg3(int(a[4]), int(a[5]), int(a[6]))
        B[3, 3] = _avg3(int(a[5]), int(a[6]), int(a[7]))
    elif mode == 8:  # B_HD_PRED
        e = np.empty(8, np.int32)
        e[0:4] = L[::-1]
        e[4] = P
        e[5:8] = A[:3]
        B[3, 0] = _avg2(int(e[0]), int(e[1]))
        B[3, 1] = _avg3(int(e[0]), int(e[1]), int(e[2]))
        B[2, 0] = B[3, 2] = _avg2(int(e[1]), int(e[2]))
        B[2, 1] = B[3, 3] = _avg3(int(e[1]), int(e[2]), int(e[3]))
        B[2, 2] = B[1, 0] = _avg2(int(e[2]), int(e[3]))
        B[2, 3] = B[1, 1] = _avg3(int(e[2]), int(e[3]), int(e[4]))
        B[1, 2] = B[0, 0] = _avg2(int(e[3]), int(e[4]))
        B[1, 3] = B[0, 1] = _avg3(int(e[3]), int(e[4]), int(e[5]))
        B[0, 2] = _avg3(int(e[4]), int(e[5]), int(e[6]))
        B[0, 3] = _avg3(int(e[5]), int(e[6]), int(e[7]))
    elif mode == 9:  # B_HU_PRED
        l0, l1, l2, l3 = (int(v) for v in L)
        B[0, 0] = _avg2(l0, l1)
        B[0, 1] = _avg3(l0, l1, l2)
        B[0, 2] = B[1, 0] = _avg2(l1, l2)
        B[0, 3] = B[1, 1] = _avg3(l1, l2, l3)
        B[1, 2] = B[2, 0] = _avg2(l2, l3)
        B[1, 3] = B[2, 1] = _avg3(l2, l3, l3)
        B[2, 2] = B[2, 3] = B[3, 0] = B[3, 1] = B[3, 2] = B[3, 3] = l3
    else:  # pragma: no cover - the mode tree cannot yield anything else
        raise Vp8Error(f"bad 4x4 intra mode {mode}")
    return B


# --- loop filter (RFC 6386 §15) ------------------------------------------------
#
# All kernels operate on COLUMN-major edge windows: ``seg`` has shape
# (8, n) int32 rows [p3 p2 p1 p0 q0 q1 q2 q3], one column per filtered
# pixel line, values pre-shifted to signed (-128..127).  They mutate the
# window in place; the caller scatters it back.


def _c(x: np.ndarray) -> np.ndarray:
    # signed-char saturation; minimum/maximum dispatch faster than np.clip
    return np.minimum(np.maximum(x, -128), 127)


def _filter_mask(seg: np.ndarray, ilim: int, elim: int) -> np.ndarray:
    p3, p2, p1, p0, q0, q1, q2, q3 = seg
    m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elim
    m &= np.abs(p3 - p2) <= ilim
    m &= np.abs(p2 - p1) <= ilim
    m &= np.abs(p1 - p0) <= ilim
    m &= np.abs(q1 - q0) <= ilim
    m &= np.abs(q2 - q1) <= ilim
    m &= np.abs(q3 - q2) <= ilim
    return m


def _hev(seg: np.ndarray, thresh: int) -> np.ndarray:
    _, _, p1, p0, q0, q1, _, _ = seg
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _common_adjust(seg: np.ndarray, use_outer: np.ndarray, do: np.ndarray):
    """§15.2 common_adjust on the masked columns; returns the pre-shift
    ``a`` term (after the +4 >> 3) for the sub-block filter's p1/q1."""
    p1, p0, q0, q1 = seg[2], seg[3], seg[4], seg[5]
    a = _c(np.where(use_outer, _c(p1 - q1), 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    seg[4] = np.where(do, _c(q0 - f), q0)
    seg[3] = np.where(do, _c(p0 + e), p0)
    return f


def _subblock_filter(seg: np.ndarray, hev_t: int, ilim: int, elim: int):
    do = _filter_mask(seg, ilim, elim)
    if not do.any():
        return
    hv = _hev(seg, hev_t)
    f = _common_adjust(seg, hv, do)
    a = (f + 1) >> 1
    lo = do & ~hv
    seg[5] = np.where(lo, _c(seg[5] - a), seg[5])
    seg[2] = np.where(lo, _c(seg[2] + a), seg[2])


def _mbedge_filter(seg: np.ndarray, hev_t: int, ilim: int, elim: int):
    do = _filter_mask(seg, ilim, elim)
    if not do.any():
        return
    hv = _hev(seg, hev_t)
    _common_adjust(seg, hv, do & hv)
    lo = do & ~hv
    if not lo.any():
        return
    p2, p1, p0, q0, q1, q2 = seg[1], seg[2], seg[3], seg[4], seg[5], seg[6]
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    seg[4] = np.where(lo, _c(q0 - a), seg[4])
    seg[3] = np.where(lo, _c(p0 + a), seg[3])
    a = _c((18 * w + 63) >> 7)
    seg[5] = np.where(lo, _c(q1 - a), seg[5])
    seg[2] = np.where(lo, _c(p1 + a), seg[2])
    a = _c((9 * w + 63) >> 7)
    seg[6] = np.where(lo, _c(q2 - a), seg[6])
    seg[1] = np.where(lo, _c(p2 + a), seg[1])


def _simple_filter(seg: np.ndarray, elim: int):
    p1, p0, q0, q1 = seg[2], seg[3], seg[4], seg[5]
    do = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elim
    if not do.any():
        return
    _common_adjust(seg, np.ones_like(do), do)


def _edge_window_v(plane: np.ndarray, r0: int, n: int, c: int) -> np.ndarray:
    """Vertical edge at column boundary c: columns c-4..c+3, rows
    r0..r0+n → (8, n) signed window."""
    return plane[r0 : r0 + n, c - 4 : c + 4].astype(np.int32).T - 128


def _scatter_v(plane: np.ndarray, r0: int, n: int, c: int, seg: np.ndarray):
    plane[r0 : r0 + n, c - 4 : c + 4] = (seg.T + 128).astype(np.uint8)


def _edge_window_h(plane: np.ndarray, r: int, c0: int, n: int) -> np.ndarray:
    return plane[r - 4 : r + 4, c0 : c0 + n].astype(np.int32) - 128


def _scatter_h(plane: np.ndarray, r: int, c0: int, n: int, seg: np.ndarray):
    plane[r - 4 : r + 4, c0 : c0 + n] = (seg + 128).astype(np.uint8)


def _filter_uv_v(ubuf, vbuf, r0, n, c, fn, *args):
    """Both chroma planes' vertical edges in ONE kernel call (columns
    are independent, so the windows concatenate along the n axis)."""
    s = np.concatenate(
        [_edge_window_v(ubuf, r0, n, c), _edge_window_v(vbuf, r0, n, c)], axis=1
    )
    fn(s, *args)
    _scatter_v(ubuf, r0, n, c, s[:, :n])
    _scatter_v(vbuf, r0, n, c, s[:, n:])


def _filter_uv_h(ubuf, vbuf, r, c0, n, fn, *args):
    s = np.concatenate(
        [_edge_window_h(ubuf, r, c0, n), _edge_window_h(vbuf, r, c0, n)], axis=1
    )
    fn(s, *args)
    _scatter_h(ubuf, r, c0, n, s[:, :n])
    _scatter_h(vbuf, r, c0, n, s[:, n:])


def _loop_filter(
    h: _Header,
    ybuf: np.ndarray,
    ubuf: np.ndarray,
    vbuf: np.ndarray,
    seg: list[int],
    ymode: list[int],
    inner: list[bool],
) -> None:
    """Apply the frame loop filter in MB raster order (§15.1-15.4).
    Buffers are the padded planes; real pixels start at [1, 1]."""
    mb_w, mb_h = h.mb_w, h.mb_h
    # per-segment base level
    levels = []
    for s in range(4):
        if h.seg_enabled:
            lvl = h.seg_lf[s] if h.seg_abs else h.filter_level + h.seg_lf[s]
        else:
            lvl = h.filter_level
        levels.append(_clamp(lvl, 0, 63))
    simple = h.filter_type == 1
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            lvl = levels[seg[i]]
            if h.lf_delta:
                lvl += h.ref_lf_delta[0]  # intra frame
                if ymode[i] == B_PRED:
                    lvl += h.mode_lf_delta[0]
                lvl = _clamp(lvl, 0, 63)
            if lvl == 0:
                continue
            il = lvl
            if h.sharpness:
                il >>= 2 if h.sharpness > 4 else 1
                il = min(il, 9 - h.sharpness)
            il = max(il, 1)
            mb_lim = ((lvl + 2) * 2) + il
            sb_lim = (lvl * 2) + il
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            fi = inner[i]
            yr, yc = 1 + my * 16, 1 + mx * 16  # padded coords of MB
            cr, cc = 1 + my * 8, 1 + mx * 8
            if simple:
                if mx > 0:
                    s0 = _edge_window_v(ybuf, yr, 16, yc)
                    _simple_filter(s0, mb_lim)
                    _scatter_v(ybuf, yr, 16, yc, s0)
                if fi:
                    for dc in (4, 8, 12):
                        s0 = _edge_window_v(ybuf, yr, 16, yc + dc)
                        _simple_filter(s0, sb_lim)
                        _scatter_v(ybuf, yr, 16, yc + dc, s0)
                if my > 0:
                    s0 = _edge_window_h(ybuf, yr, yc, 16)
                    _simple_filter(s0, mb_lim)
                    _scatter_h(ybuf, yr, yc, 16, s0)
                if fi:
                    for dr in (4, 8, 12):
                        s0 = _edge_window_h(ybuf, yr + dr, yc, 16)
                        _simple_filter(s0, sb_lim)
                        _scatter_h(ybuf, yr + dr, yc, 16, s0)
                continue
            # normal filter: luma + chroma
            if mx > 0:
                s0 = _edge_window_v(ybuf, yr, 16, yc)
                _mbedge_filter(s0, hev_t, il, mb_lim)
                _scatter_v(ybuf, yr, 16, yc, s0)
                _filter_uv_v(ubuf, vbuf, cr, 8, cc, _mbedge_filter, hev_t, il, mb_lim)
            if fi:
                for dc in (4, 8, 12):
                    s0 = _edge_window_v(ybuf, yr, 16, yc + dc)
                    _subblock_filter(s0, hev_t, il, sb_lim)
                    _scatter_v(ybuf, yr, 16, yc + dc, s0)
                _filter_uv_v(
                    ubuf, vbuf, cr, 8, cc + 4, _subblock_filter, hev_t, il, sb_lim
                )
            if my > 0:
                s0 = _edge_window_h(ybuf, yr, yc, 16)
                _mbedge_filter(s0, hev_t, il, mb_lim)
                _scatter_h(ybuf, yr, yc, 16, s0)
                _filter_uv_h(ubuf, vbuf, cr, cc, 8, _mbedge_filter, hev_t, il, mb_lim)
            if fi:
                for dr in (4, 8, 12):
                    s0 = _edge_window_h(ybuf, yr + dr, yc, 16)
                    _subblock_filter(s0, hev_t, il, sb_lim)
                    _scatter_h(ybuf, yr + dr, yc, 16, s0)
                _filter_uv_h(
                    ubuf, vbuf, cr + 4, cc, 8, _subblock_filter, hev_t, il, sb_lim
                )


# --- frame reconstruction ------------------------------------------------------


def decode_vp8(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a VP8 key-frame payload (the body of a ``VP8 `` chunk) to
    (Y, U, V) uint8 planes, cropped to the frame size — bit-exact with
    libwebp's ``WebPDecodeYUV`` (gated in tests/test_vp8.py).  Raises
    :class:`Vp8Error` on malformed input, never an untyped exception."""
    try:
        return _decode_vp8_impl(data)
    except Vp8Error:
        raise
    except (IndexError, ValueError, OverflowError) as exc:
        raise Vp8Error(f"malformed VP8 ({type(exc).__name__}): {exc}") from exc


def _decode_vp8_impl(data: bytes):
    h, bd, part0_end = _parse_frame_header(data)
    mb_w, mb_h = h.mb_w, h.mb_h

    # token partition layout (§9.5): (n-1) 3-byte sizes, then the data
    n_parts = h.n_parts
    sizes_end = part0_end + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise Vp8Error("token partition size table truncated")
    offs = sizes_end
    parts: list[_Bool] = []
    for p in range(n_parts):
        if p < n_parts - 1:
            at = part0_end + 3 * p
            ln = data[at] | (data[at + 1] << 8) | (data[at + 2] << 16)
        else:
            ln = len(data) - offs
        if ln < 0 or offs + ln > len(data):
            raise Vp8Error("token partition extends past payload end")
        parts.append(_Bool(data[offs : offs + ln]))
        offs += ln

    seg, skip, ymode, uvmode, bmodes = _parse_modes(h, bd)
    dq = _segment_dequant(h)
    probs = h.coeff_probs

    # padded reconstruction planes: row 0 = 127 boundary, col 0 = 129
    # (§12.2), plus 4 right columns on Y for the 4x4 above-right reads
    W16, H16 = mb_w * 16, mb_h * 16
    ybuf = np.empty((H16 + 1, W16 + 5), np.uint8)
    ubuf = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    vbuf = np.empty_like(ubuf)
    for buf in (ybuf, ubuf, vbuf):
        buf[0, :] = 127
        buf[1:, 0] = 129

    # neighbour non-zero contexts (§13.4)
    above_ynz = np.zeros(4 * mb_w, np.int8)
    above_unz = np.zeros(2 * mb_w, np.int8)
    above_vnz = np.zeros(2 * mb_w, np.int8)
    above_y2nz = np.zeros(mb_w, np.int8)
    inner = [False] * (mb_w * mb_h)

    coeffs = np.zeros(16, np.int64)
    for my in range(mb_h):
        td = parts[my % n_parts]
        left_ynz = [0, 0, 0, 0]
        left_unz = [0, 0]
        left_vnz = [0, 0]
        left_y2nz = 0
        for mx in range(mb_w):
            i = my * mb_w + mx
            ym = ymode[i]
            is4 = ym == B_PRED
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[seg[i]]
            yblocks = None
            ublocks = None
            vblocks = None
            has = False
            if not skip[i]:
                pr = probs[3] if is4 else probs[0]
                first = 0 if is4 else 1
                ydcs = None
                if not is4:
                    coeffs[:] = 0
                    ctx = above_y2nz[mx] + left_y2nz
                    nz = _decode_coeffs(
                        td, probs[1], ctx, 0, y2dc, y2ac, coeffs
                    )
                    above_y2nz[mx] = left_y2nz = nz
                    has = has or bool(nz)
                    ydcs = _iwht4x4(coeffs.reshape(4, 4))
                yblocks = []
                for sy in range(4):
                    l = left_ynz[sy]
                    for sx in range(4):
                        coeffs[:] = 0
                        ctx = l + above_ynz[4 * mx + sx]
                        nz = _decode_coeffs(
                            td, pr, ctx, first, y1dc, y1ac, coeffs
                        )
                        l = nz
                        above_ynz[4 * mx + sx] = nz
                        has = has or bool(nz)
                        blk = coeffs.reshape(4, 4).copy()
                        if ydcs is not None:
                            blk[0, 0] = ydcs[sy, sx]
                        yblocks.append(blk)
                    left_ynz[sy] = l
                ublocks, vblocks = [], []
                for blocks, above_nz, left_nz in (
                    (ublocks, above_unz, left_unz),
                    (vblocks, above_vnz, left_vnz),
                ):
                    for sy in range(2):
                        l = left_nz[sy]
                        for sx in range(2):
                            coeffs[:] = 0
                            ctx = l + above_nz[2 * mx + sx]
                            nz = _decode_coeffs(
                                td, probs[2], ctx, 0, uvdc, uvac, coeffs
                            )
                            l = nz
                            above_nz[2 * mx + sx] = nz
                            has = has or bool(nz)
                            blocks.append(coeffs.reshape(4, 4).copy())
                        left_nz[sy] = l
            else:
                above_ynz[4 * mx : 4 * mx + 4] = 0
                above_unz[2 * mx : 2 * mx + 2] = 0
                above_vnz[2 * mx : 2 * mx + 2] = 0
                left_ynz = [0, 0, 0, 0]
                left_unz = [0, 0]
                left_vnz = [0, 0]
                if not is4:
                    above_y2nz[mx] = left_y2nz = 0
                if is4:
                    yblocks = [None] * 16
            inner[i] = is4 or has

            # --- reconstruct luma (residual IDCTs batched per MB) ---
            yr, yc = 1 + my * 16, 1 + mx * 16
            yres = None
            if yblocks is not None and any(b is not None for b in yblocks):
                zero = _Z4
                yres = _idct4x4_many(
                    np.stack([b if b is not None else zero for b in yblocks])
                )
            if is4:
                modes = bmodes[i]
                for sy in range(4):
                    for sx in range(4):
                        r, c = yr + sy * 4, yc + sx * 4
                        if sx == 3:
                            ar = ybuf[yr - 1, yc + 16 : yc + 20].astype(np.int32)
                        else:
                            ar = ybuf[r - 1, c + 4 : c + 8].astype(np.int32)
                        A = np.concatenate(
                            [ybuf[r - 1, c : c + 4].astype(np.int32), ar]
                        )
                        L = ybuf[r : r + 4, c - 1].astype(np.int32)
                        P = int(ybuf[r - 1, c - 1])
                        pred = _pred4(modes[sy * 4 + sx], A, L, P)
                        if yres is not None:
                            pred = pred + yres[sy * 4 + sx]
                        ybuf[r : r + 4, c : c + 4] = np.clip(
                            pred, 0, 255
                        ).astype(np.uint8)
            else:
                pred = _pred_block(ybuf, yr, yc, 16, ym, my > 0, mx > 0)
                out = pred.astype(np.int64)
                if yres is not None:
                    # (sy, row, sx, col) view += (block, row, col) scatter
                    out.reshape(4, 4, 4, 4)[:] += yres.reshape(
                        4, 4, 4, 4
                    ).transpose(0, 2, 1, 3)
                ybuf[yr : yr + 16, yc : yc + 16] = np.clip(out, 0, 255).astype(
                    np.uint8
                )
            # --- reconstruct chroma ---
            cr, cc = 1 + my * 8, 1 + mx * 8
            for buf, blocks in ((ubuf, ublocks), (vbuf, vblocks)):
                pred = _pred_block(buf, cr, cc, 8, uvmode[i], my > 0, mx > 0)
                out = pred.astype(np.int64)
                if blocks is not None:
                    cres = _idct4x4_many(np.stack(blocks))
                    out.reshape(2, 4, 2, 4)[:] += cres.reshape(
                        2, 2, 4, 4
                    ).transpose(0, 2, 1, 3)
                buf[cr : cr + 8, cc : cc + 8] = np.clip(out, 0, 255).astype(
                    np.uint8
                )
        # right-edge above-right extension for the next MB row (the
        # libwebp "replicate y[15] on the rightmost column" quirk)
        last = 1 + my * 16 + 15
        ybuf[last, W16 + 1 :] = ybuf[last, W16]

    if h.filter_level > 0 or h.seg_enabled:
        _loop_filter(h, ybuf, ubuf, vbuf, seg, ymode, inner)

    w, hh = h.width, h.height
    y = ybuf[1 : 1 + hh, 1 : 1 + w].copy()
    cw, ch = (w + 1) >> 1, (hh + 1) >> 1
    u = ubuf[1 : 1 + ch, 1 : 1 + cw].copy()
    v = vbuf[1 : 1 + ch, 1 : 1 + cw].copy()
    return y, u, v


def vp8_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the frame header only."""
    if len(data) < 10 or data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 key-frame header")
    return (
        (data[6] | (data[7] << 8)) & 0x3FFF,
        (data[8] | (data[9] << 8)) & 0x3FFF,
    )


# --- YUV → RGB (libwebp-compatible fixed-point, fancy upsampling) -------------


def _fancy_upsample(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """2x chroma upsampling with the (9a + 3b + 3c + d + 8) >> 4 kernel
    (edge-replicated), the default "fancy" scheme of libwebp."""
    ph, pw = p.shape
    pad = np.empty((ph + 2, pw + 2), np.int32)
    pad[1:-1, 1:-1] = p
    pad[0, 1:-1] = p[0]
    pad[-1, 1:-1] = p[-1]
    pad[:, 0] = pad[:, 1]
    pad[:, -1] = pad[:, -2]
    c = pad[1:-1, 1:-1]
    up = pad[:-2, 1:-1]
    dn = pad[2:, 1:-1]
    lf = pad[1:-1, :-2]
    rt = pad[1:-1, 2:]
    ul = pad[:-2, :-2]
    ur = pad[:-2, 2:]
    dl = pad[2:, :-2]
    dr = pad[2:, 2:]
    out = np.empty((2 * ph, 2 * pw), np.int32)
    out[0::2, 0::2] = (9 * c + 3 * (up + lf) + ul + 8) >> 4
    out[0::2, 1::2] = (9 * c + 3 * (up + rt) + ur + 8) >> 4
    out[1::2, 0::2] = (9 * c + 3 * (dn + lf) + dl + 8) >> 4
    out[1::2, 1::2] = (9 * c + 3 * (dn + rt) + dr + 8) >> 4
    return out[:h, :w]


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range fixed-point conversion (the libwebp integer
    coefficients) after fancy chroma upsampling."""
    h, w = y.shape
    yy = y.astype(np.int32)
    uu = _fancy_upsample(u.astype(np.int32), h, w)
    vv = _fancy_upsample(v.astype(np.int32), h, w)
    ybase = (yy * 19077) >> 8
    r = ybase + ((vv * 26149) >> 8) - 14234
    g = ybase - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708
    b = ybase + ((uu * 33050) >> 8) - 17685
    out = np.empty((h, w, 3), np.uint8)
    out[..., 0] = np.clip(r >> 6, 0, 255)
    out[..., 1] = np.clip(g >> 6, 0, 255)
    out[..., 2] = np.clip(b >> 6, 0, 255)
    return out


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    """Decode a VP8 key frame straight to (h, w, 3) RGB uint8."""
    y, u, v = decode_vp8(data)
    return yuv_to_rgb(y, u, v)


# --- minimal VP8 encoder (corpus / round-trip scaffolding) --------------------
#
# Deliberately small spec subset — enough to produce REAL lossy key
# frames for the synthetic corpus without any system library: 16x16
# DC/V/H/TM luma prediction (per-MB SAD pick), chroma DC, one token
# partition, default coefficient probabilities, no segmentation, loop
# filter level 0.  The decoder above is the ground truth: the encoder
# reconstructs through the SAME _pred_block/_iwht4x4/_idct4x4 helpers,
# so encode→decode is deterministic and libwebp decodes the streams
# identically (interop-gated in tests/test_vp8.py).


class _BoolEnc:
    """RFC 6386 §7.3 boolean encoder (with carry propagation)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def put_literal(self, value: int, bits: int) -> None:
        for shift in range(bits - 1, -1, -1):
            self.put(128, (value >> shift) & 1)

    def put_tree(self, tree: list[int], probs, value: int, start: int = 0):
        # walk the tree to the leaf, recording (prob, bit) decisions
        path = self._tree_path(tree, value, start)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    @staticmethod
    def _tree_path(tree, value, start):
        # DFS for the leaf encoding `value`, from `start`
        stack = [(start, [])]
        while stack:
            i, path = stack.pop()
            for bit in (0, 1):
                nxt = tree[i + bit]
                p = path + [(i, bit)]
                if nxt <= 0:
                    if -nxt == value:
                        return p
                else:
                    stack.append((nxt, p))
        raise Vp8Error(f"value {value} not in tree")  # pragma: no cover

    def finish(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _fdct4x4(b: np.ndarray) -> np.ndarray:
    """Forward 4x4 DCT paired with _idct4x4's scaling (the libvpx
    short-fdct constants)."""
    ip = b.astype(np.int64)
    t = np.empty((4, 4), np.int64)
    a1 = (ip[:, 0] + ip[:, 3]) * 8
    b1 = (ip[:, 1] + ip[:, 2]) * 8
    c1 = (ip[:, 1] - ip[:, 2]) * 8
    d1 = (ip[:, 0] - ip[:, 3]) * 8
    t[:, 0] = a1 + b1
    t[:, 2] = a1 - b1
    t[:, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
    t[:, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.empty((4, 4), np.int64)
    a1 = t[0] + t[3]
    b1 = t[1] + t[2]
    c1 = t[1] - t[2]
    d1 = t[0] - t[3]
    out[0] = (a1 + b1 + 7) >> 4
    out[2] = (a1 - b1 + 7) >> 4
    out[1] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0)
    out[3] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def _fwht4x4(b: np.ndarray) -> np.ndarray:
    """Forward WHT for the Y2 block (libvpx short-walsh pairing)."""
    ip = b.astype(np.int64)
    t = np.empty((4, 4), np.int64)
    a1 = (ip[:, 0] + ip[:, 2]) << 2
    d1 = (ip[:, 1] + ip[:, 3]) << 2
    c1 = (ip[:, 1] - ip[:, 3]) << 2
    b1 = (ip[:, 0] - ip[:, 2]) << 2
    t[:, 0] = a1 + d1 + (a1 != 0)
    t[:, 1] = b1 + c1
    t[:, 2] = b1 - c1
    t[:, 3] = a1 - d1
    out = np.empty((4, 4), np.int64)
    a1 = t[0] + t[2]
    d1 = t[1] + t[3]
    c1 = t[1] - t[3]
    b1 = t[0] - t[2]
    a2 = a1 + d1
    b2 = b1 + c1
    c2 = b1 - c1
    d2 = a1 - d1
    out[0] = (a2 + (a2 < 0) + 3) >> 3
    out[1] = (b2 + (b2 < 0) + 3) >> 3
    out[2] = (c2 + (c2 < 0) + 3) >> 3
    out[3] = (d2 + (d2 < 0) + 3) >> 3
    return out


_CAT_MAX = CAT_BASE[5] + (1 << len(CAT_PROBS[5])) - 1  # 2114


def _level_token(v: int) -> tuple[int, int, int]:
    """(token, extra_value, extra_bits) for |coefficient| v >= 1."""
    if v <= 4:
        return v, 0, 0
    for cat in range(5, -1, -1):
        if v >= CAT_BASE[cat]:
            return DCT_CAT1 + cat, v - CAT_BASE[cat], len(CAT_PROBS[cat])
    raise Vp8Error(f"bad level {v}")  # pragma: no cover


def _encode_coeffs(be: _BoolEnc, probs, ctx: int, first: int, lv: np.ndarray) -> int:
    """Mirror of _decode_coeffs: emit tokens for the (natural-order)
    level array; returns the nz flag."""
    nz_pos = [n for n in range(first, 16) if lv[ZIGZAG[n]] != 0]
    last = nz_pos[-1] if nz_pos else first - 1
    n = first
    skip_eob = False
    while n <= last:
        v = int(lv[ZIGZAG[n]])
        p = probs[COEFF_BANDS[n]][ctx]
        start = 2 if skip_eob else 0
        if v == 0:
            be.put_tree(COEF_TREE, p, DCT_0, start)
            ctx = 0
            skip_eob = True
        else:
            a = abs(v)
            tok, extra, ebits = _level_token(a)
            be.put_tree(COEF_TREE, p, tok, start)
            if ebits:
                cp = CAT_PROBS[tok - DCT_CAT1]
                for idx, pb in enumerate(cp):
                    be.put(pb, (extra >> (ebits - 1 - idx)) & 1)
            be.put(128, 1 if v < 0 else 0)
            ctx = 2 if a > 1 else 1
            skip_eob = False
        n += 1
    if n < 16:
        be.put_tree(COEF_TREE, probs[COEFF_BANDS[n]][ctx], DCT_EOB, 0)
    return 1 if nz_pos else 0


def rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 limited-range RGB→YUV with 2x2 box chroma subsampling."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = np.clip(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16, 0, 255)
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    ph, pw = (h + 1) & ~1, (w + 1) & ~1
    uu = np.empty((ph, pw), np.int32)
    vv = np.empty((ph, pw), np.int32)
    uu[:h, :w] = u
    vv[:h, :w] = v
    if pw > w:
        uu[:, w:] = uu[:, w - 1 : w]
        vv[:, w:] = vv[:, w - 1 : w]
    if ph > h:
        uu[h:, :] = uu[h - 1 : h, :]
        vv[h:, :] = vv[h - 1 : h, :]
    us = (uu[0::2, 0::2] + uu[0::2, 1::2] + uu[1::2, 0::2] + uu[1::2, 1::2] + 2) >> 2
    vs = (vv[0::2, 0::2] + vv[0::2, 1::2] + vv[1::2, 0::2] + vv[1::2, 1::2] + 2) >> 2
    return (
        y.astype(np.uint8),
        np.clip(us, 0, 255).astype(np.uint8),
        np.clip(vs, 0, 255).astype(np.uint8),
    )


def _quant(coefs: np.ndarray, dq0: int, dq1: int) -> np.ndarray:
    q = np.empty(16, np.int64)
    flat = coefs.reshape(16)
    q[0] = flat[0] // dq0 if flat[0] >= 0 else -((-flat[0]) // dq0)
    rest = flat[1:]
    q[1:] = np.where(rest >= 0, rest // dq1, -((-rest) // dq1))
    return np.clip(q, -_CAT_MAX, _CAT_MAX)


def encode_vp8(rgb: np.ndarray, q_index: int = 4) -> bytes:
    """Encode an (h, w, 3) RGB uint8 image as a VP8 key-frame payload
    (the body of a ``VP8 `` chunk).  16x16 intra modes picked by SAD,
    one token partition, default probabilities, loop filter off."""
    hh, w = rgb.shape[:2]
    if hh == 0 or w == 0 or hh > 0x3FFF or w > 0x3FFF:
        raise Vp8Error("bad encode dimensions")
    yP, uP, vP = rgb_to_yuv420(rgb)
    mb_w, mb_h = (w + 15) >> 4, (hh + 15) >> 4
    W16, H16 = mb_w * 16, mb_h * 16

    def pad(p, H, W):
        out = np.empty((H, W), np.uint8)
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[:ph, pw:] = p[:, pw - 1 : pw]
        out[ph:, :] = out[ph - 1 : ph, :]
        return out

    ysrc = pad(yP, H16, W16)
    usrc = pad(uP, mb_h * 8, mb_w * 8)
    vsrc = pad(vP, mb_h * 8, mb_w * 8)

    q = _clamp(q_index, 0, 127)
    y1dc, y1ac = DC_Q[q], AC_Q[q]
    y2dc, y2ac = DC_Q[q] * 2, max(8, AC_Q[q] * 155 // 100)
    uvdc, uvac = DC_Q[min(q, 117)], AC_Q[q]

    # reconstruction buffers with the decoder's boundary conventions
    ybuf = np.empty((H16 + 1, W16 + 5), np.uint8)
    ubuf = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    vbuf = np.empty_like(ubuf)
    for buf in (ybuf, ubuf, vbuf):
        buf[0, :] = 127
        buf[1:, 0] = 129

    mode_enc = _BoolEnc()
    # compressed header: no segmentation, normal filter level 0,
    # 1 partition, quantizer q with zero deltas, no prob updates
    mode_enc.put_literal(0, 2)  # color space + clamping
    mode_enc.put(128, 0)  # segmentation off
    mode_enc.put(128, 0)  # filter type normal
    mode_enc.put_literal(0, 6)  # level 0
    mode_enc.put_literal(0, 3)  # sharpness
    mode_enc.put(128, 0)  # lf deltas off
    mode_enc.put_literal(0, 2)  # log2 partitions = 0
    mode_enc.put_literal(q, 7)  # base quantizer
    for _ in range(5):
        mode_enc.put(128, 0)  # q delta flags
    mode_enc.put(128, 0)  # refresh entropy (ignored intra)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    mode_enc.put(COEFF_UPDATE[i][j][k][t], 0)
    mode_enc.put(128, 0)  # mb_no_skip_coeff off

    tok = _BoolEnc()
    above_ynz = np.zeros(4 * mb_w, np.int8)
    above_unz = np.zeros(2 * mb_w, np.int8)
    above_vnz = np.zeros(2 * mb_w, np.int8)
    above_y2nz = np.zeros(mb_w, np.int8)

    for my in range(mb_h):
        left_ynz = [0, 0, 0, 0]
        left_unz = [0, 0]
        left_vnz = [0, 0]
        left_y2nz = 0
        for mx in range(mb_w):
            yr, yc = 1 + my * 16, 1 + mx * 16
            cr, cc = 1 + my * 8, 1 + mx * 8
            src = ysrc[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].astype(np.int32)
            # pick the 16x16 mode by SAD over the candidate predictions
            best, best_sad, best_pred = DC_PRED, None, None
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pr = _pred_block(ybuf, yr, yc, 16, m, my > 0, mx > 0)
                sad = int(np.abs(src - pr).sum())
                if best_sad is None or sad < best_sad:
                    best, best_sad, best_pred = m, sad, pr
            ym, pred = best, best_pred
            mode_enc.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ym)
            mode_enc.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)

            res = src - pred
            blocks = []
            dcs = np.empty((4, 4), np.int64)
            for sy in range(4):
                for sx in range(4):
                    c4 = _fdct4x4(res[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4])
                    dcs[sy, sx] = c4[0, 0]
                    blocks.append(c4)
            y2lv = _quant(_fwht4x4(dcs), y2dc, y2ac)
            ctx = above_y2nz[mx] + left_y2nz
            nz = _encode_coeffs(tok, COEFF_DEFAULT[1], ctx, 0, y2lv)
            above_y2nz[mx] = left_y2nz = nz
            # reconstruct the Y2 DCs exactly as the decoder will
            y2deq = y2lv.reshape(4, 4) * y2ac
            y2deq[0, 0] = y2lv[0] * y2dc
            ydcs = _iwht4x4(y2deq)

            out = pred.astype(np.int64)
            for sy in range(4):
                for sx in range(4):
                    i4 = sy * 4 + sx
                    lv = _quant(blocks[i4], y1dc, y1ac)
                    lv[0] = 0  # DC rides in Y2
                    ctx = left_ynz[sy] + above_ynz[4 * mx + sx]
                    nz = _encode_coeffs(tok, COEFF_DEFAULT[0], ctx, 1, lv)
                    left_ynz[sy] = nz
                    above_ynz[4 * mx + sx] = nz
                    deq = lv.reshape(4, 4) * y1ac
                    deq[0, 0] = ydcs[sy, sx]
                    out[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += _idct4x4(deq)
            ybuf[yr : yr + 16, yc : yc + 16] = np.clip(out, 0, 255).astype(np.uint8)

            for plane, buf, a_nz, l_nz in (
                (usrc, ubuf, above_unz, left_unz),
                (vsrc, vbuf, above_vnz, left_vnz),
            ):
                csrc = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].astype(np.int32)
                cpred = _pred_block(buf, cr, cc, 8, DC_PRED, my > 0, mx > 0)
                cres = csrc - cpred
                cout = cpred.astype(np.int64)
                for sy in range(2):
                    for sx in range(2):
                        lv = _quant(
                            _fdct4x4(cres[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4]),
                            uvdc,
                            uvac,
                        )
                        ctx = l_nz[sy] + a_nz[2 * mx + sx]
                        nz = _encode_coeffs(tok, COEFF_DEFAULT[2], ctx, 0, lv)
                        l_nz[sy] = nz
                        a_nz[2 * mx + sx] = nz
                        deq = lv.reshape(4, 4) * uvac
                        deq[0, 0] = lv[0] * uvdc
                        cout[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += _idct4x4(deq)
                buf[cr : cr + 8, cc : cc + 8] = np.clip(cout, 0, 255).astype(np.uint8)
        last = 1 + my * 16 + 15
        ybuf[last, W16 + 1 :] = ybuf[last, W16]

    part1 = mode_enc.finish()
    part2 = tok.finish()
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF, 0x9D, 0x01, 0x2A]
    ) + w.to_bytes(2, "little") + hh.to_bytes(2, "little")
    return head + part1 + part2


def encode_webp_lossy(rgb: np.ndarray, q_index: int = 4) -> bytes:
    """Wrap :func:`encode_vp8` in a RIFF/WEBP container."""
    body = encode_vp8(rgb, q_index)
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
