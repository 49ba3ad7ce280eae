"""Pallas TPU kernels for the band hot ops.

The XLA versions (ops/device.py) materialize the 5-candidate tensor in HBM
between the elementwise pass and the argmin/select. These Pallas kernels
keep a row tile's candidates in VMEM: one HBM read of the band, one write of
the filtered bytes — the roofline for this op is pure HBM bandwidth.

Kernels:
- :func:`filter_select_pallas` — PNG filter selection over a band
  (semantics identical to png-filter.ts:148-183 / ops/device.py).
- :func:`dct8_pallas` — batched 8x8 DCT + quantize for JPEG strips, using
  MXU-shaped matmuls on (8, 128)-lane tiles.

Each kernel has an ``interpret=True`` path used by the CPU test suite; on
TPU they compile through Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8  # rows per grid step


def _filter_kernel(raw_ref, up_ref, out_ref, types_ref, *, bpp: int, n_valid: int):
    """One (ROW_TILE, N) tile: score 5 filters per row, write the winner."""
    raw = raw_ref[:].astype(jnp.int32)
    up = up_ref[:].astype(jnp.int32)

    left = jnp.pad(raw[:, :-bpp], ((0, 0), (bpp, 0)))
    upleft = jnp.pad(up[:, :-bpp], ((0, 0), (bpp, 0)))

    p = left + up - upleft
    pa = jnp.abs(p - left)
    pb = jnp.abs(p - up)
    pc = jnp.abs(p - upleft)
    paeth = jnp.where((pa <= pb) & (pa <= pc), left, jnp.where(pb <= pc, up, upleft))

    c0 = raw
    c1 = (raw - left) & 0xFF
    c2 = (raw - up) & 0xFF
    c3 = (raw - ((left + up) >> 1)) & 0xFF
    c4 = (raw - paeth) & 0xFF

    # Mask out padded lanes so they don't affect scores.
    lane = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    valid = lane < n_valid

    def score(c):
        signed = jnp.where(c > 127, c - 256, c)
        return jnp.sum(jnp.where(valid, jnp.abs(signed), 0), axis=1)

    # First-min selection unrolled over the 5 candidates (strict < keeps the
    # earlier filter on ties, png-filter.ts:166-178). Mosaic has no integer
    # argmin lowering; the unrolled compare chain is equivalent and cheap.
    best = score(c0)
    choice = jnp.zeros_like(best)
    for k, c in enumerate((c1, c2, c3, c4), start=1):
        s = score(c)
        better = s < best
        choice = jnp.where(better, k, choice)
        best = jnp.where(better, s, best)

    ch = choice[:, None]
    out = jnp.where(
        ch == 0,
        c0,
        jnp.where(ch == 1, c1, jnp.where(ch == 2, c2, jnp.where(ch == 3, c3, c4))),
    )
    out_ref[:] = out.astype(jnp.uint8)
    types_ref[:] = choice[:, None]


@functools.partial(jax.jit, static_argnames=("bpp", "n_valid", "interpret"))
def _filter_select_call(raw_p, up_p, bpp: int, n_valid: int, interpret: bool):
    h, n_pad = raw_p.shape
    grid = (h // ROW_TILE,)
    return pl.pallas_call(
        functools.partial(_filter_kernel, bpp=bpp, n_valid=n_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, n_pad), jnp.uint8),
            jax.ShapeDtypeStruct((h, 1), jnp.int32),
        ),
        interpret=interpret,
    )(raw_p, up_p)


def filter_select_pallas(
    raw: jax.Array | np.ndarray,
    prev_row: jax.Array | np.ndarray | None,
    bpp: int,
    interpret: bool = False,
):
    """PNG filter selection over a band via the Pallas kernel.

    raw: (H, N) uint8. Returns (types (H,) uint8, filtered (H, N) uint8,
    last raw row (N,)). Pads rows to ROW_TILE and lanes to 128 internally.
    """
    raw = jnp.asarray(raw, dtype=jnp.uint8)
    h, n = raw.shape
    prev = (
        jnp.zeros((n,), jnp.uint8)
        if prev_row is None
        else jnp.asarray(prev_row, dtype=jnp.uint8)
    )
    up = jnp.concatenate([prev[None, :], raw[:-1]], axis=0)

    h_pad = -(-h // ROW_TILE) * ROW_TILE
    n_pad = max(128, -(-n // 128) * 128)
    raw_p = jnp.pad(raw, ((0, h_pad - h), (0, n_pad - n)))
    up_p = jnp.pad(up, ((0, h_pad - h), (0, n_pad - n)))

    out, types = _filter_select_call(raw_p, up_p, bpp, int(n), interpret)
    return (
        types[:h, 0].astype(jnp.uint8),
        out[:h, :n],
        raw[-1],
    )


# --------------------------------------------------------------------------- #
# Batched 8x8 DCT + quantize
# --------------------------------------------------------------------------- #


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m.astype(np.float32)


def _dct_kernel(plane_ref, dctm_ref, mtbd_ref, qtile_ref, out_ref):
    """One (8, 128) tile = 16 blocks side by side: DCT columns via one
    (8,8)@(8,128) matmul, DCT rows via one (8,128)@(128,128) matmul against
    a block-diagonal stack of 16 copies of M^T (Mosaic has no lane-dim 3D
    reshape, and adding exact f32 zeros never changes a sum, so the
    block-diagonal contraction is both legal and value-identical).

    Bit-exactness: full-f32 matmuls (precision=HIGHEST, same association as
    ops/device.jpeg_quantize_trace) and DIVISION by the quant table with the
    same round-half-away — so pallas output == XLA trace == host numpy."""
    x = plane_ref[:].astype(jnp.float32)  # (8, 128): 16 blocks of (8, 8)
    m = dctm_ref[:]  # (8, 8)
    cx = jnp.dot(
        m, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # (8, 128)
    coefs = jnp.dot(
        cx,
        mtbd_ref[:],  # (128, 128) block-diag of M^T
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, 128)
    scaled = coefs / qtile_ref[:]  # (8, 128) q tiled 16x along lanes
    rounded = jnp.where(scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5))
    out_ref[:] = rounded.astype(jnp.int16)


@functools.lru_cache(maxsize=1)
def _mt_block_diag() -> np.ndarray:
    m = _dct_matrix()
    bd = np.zeros((128, 128), dtype=np.float32)
    for j in range(16):
        bd[j * 8 : (j + 1) * 8, j * 8 : (j + 1) * 8] = m.T
    return bd


@functools.partial(jax.jit, static_argnames=("interpret",))
def dct8_pallas(plane: jax.Array, qtable: jax.Array, interpret: bool = False):
    """plane: (H, W) float32 level-shifted samples, H%8==0, W%128==0.
    Returns (H/8 * W/8, 64) int16 quantized blocks in strip-major order."""
    h, w = plane.shape
    dctm = jnp.asarray(_dct_matrix())
    mtbd = jnp.asarray(_mt_block_diag())
    q8 = qtable.reshape(8, 8).astype(jnp.float32)
    qtile = jnp.tile(q8, (1, 16))  # (8, 128)
    grid = (h // 8, w // 128)
    out = pl.pallas_call(
        _dct_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int16),
        interpret=interpret,
    )(plane, dctm, mtbd, qtile)
    # (H, W) coefficient layout -> strip-major (H/8 * W/8, 64) natural-order
    # blocks (an XLA reshape outside the kernel, fused into the consumer).
    return (
        out.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    )


# --------------------------------------------------------------------------- #
# Full JPEG quantize stage (YCbCr + DCT + quantize) via the pallas DCT
# --------------------------------------------------------------------------- #


def jpeg_quantize_pallas(
    band: jax.Array, luma_q: jax.Array, chroma_q: jax.Array, interpret: bool = False
):
    """Drop-in for ops/device.jpeg_quantize_trace using dct8_pallas.

    band: (H, W, 4) uint8, H%8 == 0, W%8 == 0. Width is padded to the
    128-lane tile internally; the padded blocks are sliced away, so block
    order and values match the XLA trace exactly.
    """
    h, w, _ = band.shape
    r = band[:, :, 0].astype(jnp.float32)
    g = band[:, :, 1].astype(jnp.float32)
    b = band[:, :, 2].astype(jnp.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b

    w_pad = max(128, -(-w // 128) * 128)

    def one(plane, q):
        if w_pad != w:
            plane = jnp.pad(plane, ((0, 0), (0, w_pad - w)))
        blocks = dct8_pallas(plane, q, interpret=interpret)
        if w_pad != w:
            blocks = blocks.reshape(h // 8, w_pad // 8, 64)[:, : w // 8].reshape(
                -1, 64
            )
        return blocks

    return one(y, luma_q), one(cb, chroma_q), one(cr, chroma_q)


def pallas_enabled() -> bool:
    """Production gate for the pallas kernels: explicitly requested AND a
    real TPU backend is active (on CPU pallas only runs in interpret mode,
    which is for tests)."""
    import os

    if os.environ.get("STITCH_TPU_PALLAS") != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
