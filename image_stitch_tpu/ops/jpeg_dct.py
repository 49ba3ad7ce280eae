"""Exact integer JPEG forward DCT + quantization (all tiers, one result).

Replaces the f32 matmul DCT whose round-half quantization ties could flip
between tiers (numpy vs XLA vs C++ FMA association) and between GSPMD
resharding layouts. Every operation here is exact int32 arithmetic or a
single IEEE-correctly-rounded f32 division whose floor is provably exact,
so the quantized coefficients — and therefore the JPEG *bytes* — are
bit-identical across numpy, XLA (any backend), the C++ host tier, and any
device-mesh sharding, by construction instead of by observation.

The algorithm is the classic fixed-point AAN/LLM scheme (T.81 informative
§A.3.3 flowgraph; the same 13-bit constants as libjpeg's jfdctint.c, a
public spec — reference being replaced: /root/reference's Rust
jpeg-encoder-wasm f32 path, SURVEY §2 native item 1):

- RGB -> YCbCr in 16-bit fixed point (19595/38470/7471 etc., rounded to
  integer samples — the standard JFIF integer pipeline).
- 8x8 FDCT as two butterfly passes in int32, CONST_BITS=13, PASS1_BITS=2;
  outputs are the DCT scaled by 8.
- Quantize: round-half-away((c/8)/q) computed as floor((|c| + 4q)/(8q)):
  an f32 divide followed by an exact integer floor-correction, because
  TPU divides via reciprocal approximation (see quantize_islow). The
  corrected result is the exact mathematical floor on every platform.

Every function is namespace-generic: pass ``numpy`` or ``jax.numpy`` as
``xp``. The same code path IS the cross-tier contract.
"""

from __future__ import annotations

import numpy as np

CONST_BITS = 13
PASS1_BITS = 2

# 13-bit fixed-point DCT constants (round(c * 8192); T.81 §A.3.3 / jfdctint).
FIX_0_298631336 = 2446
FIX_0_390180644 = 3196
FIX_0_541196100 = 4433
FIX_0_765366865 = 6270
FIX_0_899976223 = 7373
FIX_1_175875602 = 9633
FIX_1_501321110 = 12299
FIX_1_847759065 = 15137
FIX_1_961570560 = 16069
FIX_2_053119869 = 16819
FIX_2_562915447 = 20995
FIX_3_072711026 = 25172


def _descale(x, n: int):
    # (x + 2^(n-1)) >> n with arithmetic shift (int32 arrays).
    return (x + (1 << (n - 1))) >> n


def _fdct_pass(d, final: bool):
    """One 1-D 8-point fixed-point DCT butterfly pass over 8 parallel
    arrays. ``final=False``: row pass (outputs scaled << PASS1_BITS);
    ``final=True``: column pass (full descale). Returns 8 arrays."""
    d0, d1, d2, d3, d4, d5, d6, d7 = d
    t0 = d0 + d7
    t7 = d0 - d7
    t1 = d1 + d6
    t6 = d1 - d6
    t2 = d2 + d5
    t5 = d2 - d5
    t3 = d3 + d4
    t4 = d3 - d4

    t10 = t0 + t3
    t13 = t0 - t3
    t11 = t1 + t2
    t12 = t1 - t2

    if final:
        o0 = _descale(t10 + t11, PASS1_BITS)
        o4 = _descale(t10 - t11, PASS1_BITS)
        shift = CONST_BITS + PASS1_BITS
    else:
        o0 = (t10 + t11) << PASS1_BITS
        o4 = (t10 - t11) << PASS1_BITS
        shift = CONST_BITS - PASS1_BITS

    z1 = (t12 + t13) * FIX_0_541196100
    o2 = _descale(z1 + t13 * FIX_0_765366865, shift)
    o6 = _descale(z1 - t12 * FIX_1_847759065, shift)

    z1 = t4 + t7
    z2 = t5 + t6
    z3 = t4 + t6
    z4 = t5 + t7
    z5 = (z3 + z4) * FIX_1_175875602

    t4 = t4 * FIX_0_298631336
    t5 = t5 * FIX_2_053119869
    t6 = t6 * FIX_3_072711026
    t7 = t7 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560) + z5
    z4 = z4 * (-FIX_0_390180644) + z5

    o7 = _descale(t4 + z1 + z3, shift)
    o5 = _descale(t5 + z2 + z4, shift)
    o3 = _descale(t6 + z2 + z3, shift)
    o1 = _descale(t7 + z1 + z4, shift)
    return o0, o1, o2, o3, o4, o5, o6, o7


def fdct8_islow_plane(plane, xp):
    """(H, W) int32 level-shifted samples -> (H, W) int32 coefficients
    scaled x8, laid out per block (out[8i+u, 8j+v] = coef (u, v) of block
    (i, j)). H % 8 == 0 and W % 8 == 0."""
    # Row pass: along x. Slices plane[:, i::8] put the 8 in-block columns
    # in parallel arrays of shape (H, W/8).
    cols = [plane[:, i::8] for i in range(8)]
    r = _fdct_pass(cols, final=False)
    inter = xp.stack(r, axis=2).reshape(plane.shape[0], -1)
    # Column pass: along y.
    rows = [inter[i::8, :] for i in range(8)]
    o = _fdct_pass(rows, final=True)
    h, w = plane.shape
    return xp.stack(o, axis=1).reshape(h, w)


def ycbcr_int(band_rgba, xp):
    """(H, W, >=3) uint8 — or (H, W) uint32 byte-PACKED little-endian
    RGBA (r | g<<8 | b<<16 | a<<24, the device decode tier's zero-relayout
    band format) — -> three (H, W) int32 planes, integer YCbCr samples
    (16-bit fixed-point JFIF constants, rounded). Y is in [0, 255]; Cb/Cr
    reach 256 on saturated inputs (e.g. pure blue: (32768*255 + half +
    128<<16) >> 16 == 256 — round-half-up, no clamp). Every downstream
    range proof (notably the int16 value-range argument in
    stitchnative.cpp) must use [0, 256], not [0, 255]."""
    if band_rgba.ndim == 2:
        p = band_rgba.astype(xp.uint32)
        r = (p & xp.uint32(0xFF)).astype(xp.int32)
        g = ((p >> 8) & xp.uint32(0xFF)).astype(xp.int32)
        b = ((p >> 16) & xp.uint32(0xFF)).astype(xp.int32)
    else:
        r = band_rgba[:, :, 0].astype(xp.int32)
        g = band_rgba[:, :, 1].astype(xp.int32)
        b = band_rgba[:, :, 2].astype(xp.int32)
    half = 1 << 15
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = ((-11059) * r + (-21709) * g + 32768 * b + half + (128 << 16)) >> 16
    cr = (32768 * r + (-27439) * g + (-5329) * b + half + (128 << 16)) >> 16
    return y, cb, cr


def quantize_islow(coefs8, q, xp):
    """Quantize x8-scaled int32 DCT coefficients: round-half-away of
    (c/8)/q, i.e. sign * floor((|c| + 4q) / (8q)), exact on every backend.

    The division runs in f32 and is then floor-corrected with exact
    integer arithmetic: TPU lowers f32 divide to a reciprocal
    approximation (NOT IEEE-correctly-rounded — observed floor(264/264)
    == 0 on v5e), so the raw floor can be off by one at exact-quotient
    boundaries. The correction (rem = num - quot*den; step quot by the
    sign of the violation) restores the exact integer floor regardless of
    how the platform rounds the quotient — so every tier agrees bit for
    bit even though their division hardware differs.

    coefs8: (..., 8, 8)-laid-out int32 (any shape, last dim multiple of 8
    columns matching q's broadcast); q broadcastable int32."""
    mag = xp.abs(coefs8)
    num = mag + 4 * q
    den = 8 * q
    quot = xp.floor(
        num.astype(xp.float32) / den.astype(xp.float32)
    ).astype(xp.int32)
    rem = num - quot * den
    quot = xp.where(rem < 0, quot - 1, xp.where(rem >= den, quot + 1, quot))
    return xp.where(coefs8 < 0, -quot, quot)


def band_to_blocks_islow(band_rgba, luma_q, chroma_q, xp):
    """(8k, W, >=3) uint8 -> three (k*W/8, 64) int16 quantized
    natural-order blocks in strip-major order. 4:4:4."""
    h, w = band_rgba.shape[:2]
    y, cb, cr = ycbcr_int(band_rgba, xp)
    lq = xp.asarray(luma_q, dtype=xp.int32).reshape(8, 8)
    cq = xp.asarray(chroma_q, dtype=xp.int32).reshape(8, 8)
    out = []
    for plane, q in ((y, lq), (cb, cq), (cr, cq)):
        coefs = fdct8_islow_plane(plane - 128, xp)
        qt = xp.tile(q, (h // 8, w // 8))
        quant = quantize_islow(coefs, qt, xp)
        blocks = (
            quant.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 64)
        )
        out.append(blocks.astype(xp.int16))
    return out[0], out[1], out[2]


def band_to_blocks_islow_420(band_rgba, luma_q, chroma_q, xp):
    """4:2:0: full-res Y, 2x2 box-averaged integer chroma ((sum+2)>>2).

    band: (16k, W, >=3) uint8, W % 16 == 0. Returns (y (4n, 64) in MCU
    order [TL,TR,BL,BR], cb (n, 64), cr (n, 64)), n MCUs raster-major."""
    h, w = band_rgba.shape[:2]
    y, cb, cr = ycbcr_int(band_rgba, xp)
    lq = xp.asarray(luma_q, dtype=xp.int32).reshape(8, 8)
    cq = xp.asarray(chroma_q, dtype=xp.int32).reshape(8, 8)

    def quant_plane(plane, q):
        hh, ww = plane.shape
        coefs = fdct8_islow_plane(plane - 128, xp)
        qt = xp.tile(q, (hh // 8, ww // 8))
        quant = quantize_islow(coefs, qt, xp)
        return (
            quant.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(hh // 8, ww // 8, 64)
        )

    yq = quant_plane(y, lq).reshape(h // 8, w // 8, 64)
    yq = (
        yq.reshape(h // 16, 2, w // 16, 2, 64)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 64)
        .astype(xp.int16)
    )
    cb_s = (
        cb.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3)) + 2
    ) >> 2
    cr_s = (
        cr.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3)) + 2
    ) >> 2
    cbq = quant_plane(cb_s, cq).reshape(-1, 64).astype(xp.int16)
    crq = quant_plane(cr_s, cq).reshape(-1, 64).astype(xp.int16)
    return yq, cbq, crq
