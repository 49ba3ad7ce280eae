"""Pallas TPU kernels for the band hot ops.

The XLA versions (ops/device.py) materialize the 5-candidate tensor in HBM
between the elementwise pass and the argmin/select. These Pallas kernels
keep a row tile's candidates in VMEM: one HBM read of the band, one write of
the filtered bytes — the roofline for this op is pure HBM bandwidth.

Kernels:
- :func:`filter_select_pallas` — PNG filter selection over a band
  (semantics identical to png-filter.ts:148-183 / ops/device.py).
(The round-2 f32 DCT+quantize kernel is gone: the JPEG quantize stage is
now the exact integer pipeline in ops/jpeg_dct — pure elementwise int32
butterflies that XLA fuses as well as a hand kernel would, with no MXU
matmul left to tile.)

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
    mesh=None,
):
    """PNG filter selection over a band via the Pallas kernel.

    raw: (H, N) uint8. Returns (types (H,) uint8, filtered (H, N) uint8,
    last raw row (N,)). Pads rows to ROW_TILE and lanes to 128 internally.

    With ``mesh`` (axes ('band', 'x')) the kernel runs SPMD via shard_map
    over the 'band' axis (VERDICT r2 item 5): the one-row filter halo is
    materialized by the global ``up`` shift BEFORE the shard boundary (XLA
    inserts the collective-permute there), so each shard's kernel is
    purely local — bit-identical to the single-device kernel by
    construction. Lanes stay unsharded in the pallas path (the in-kernel
    left-neighbor shift would need a bpp-byte halo per lane shard).
    """
    raw = jnp.asarray(raw, dtype=jnp.uint8)
    h, n = raw.shape
    prev = (
        jnp.zeros((n,), jnp.uint8)
        if prev_row is None
        else jnp.asarray(prev_row, dtype=jnp.uint8)
    )
    up = jnp.concatenate([prev[None, :], raw[:-1]], axis=0)

    row_quant = ROW_TILE
    if mesh is not None:
        row_quant = ROW_TILE * mesh.shape["band"]
    h_pad = -(-h // row_quant) * row_quant
    n_pad = max(128, -(-n // 128) * 128)
    raw_p = jnp.pad(raw, ((0, h_pad - h), (0, n_pad - n)))
    up_p = jnp.pad(up, ((0, h_pad - h), (0, n_pad - n)))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = jax.shard_map(
            functools.partial(
                _filter_select_call, bpp=bpp, n_valid=int(n),
                interpret=interpret,
            ),
            mesh=mesh,
            in_specs=(P("band", None), P("band", None)),
            out_specs=(P("band", None), P("band", None)),
            # pallas_call's ShapeDtypeStructs carry no replication/vma
            # metadata; the kernel is manifestly per-shard local.
            check_vma=False,
        )
        raw_p = jax.device_put(raw_p, NamedSharding(mesh, P("band", None)))
        up_p = jax.device_put(up_p, NamedSharding(mesh, P("band", None)))
        out, types = fn(raw_p, up_p)
    else:
        out, types = _filter_select_call(raw_p, up_p, bpp, int(n), interpret)
    return (
        types[:h, 0].astype(jnp.uint8),
        out[:h, :n],
        raw[-1],
    )


PACK_TILE = 512  # block lanes per grid step of the pack kernel


def _pack_kernel(codes_ref, lens_ref, off_ref, out_ref, *, n_pairs: int,
                 n_aw: int):
    """Phase-1 symbol packing for one (AW_pad, PACK_TILE) block tile.

    Same math as ops/jpeg_entropy_device._pack_blocks_aligned's step(),
    but the accumulator lives in VMEM/VREGs for the whole 33-step chain:
    the XLA fori_loop re-reads and re-writes the (AW, nb) buffer from HBM
    every step (33x2 full-buffer round trips ~ 0.8 GB per 4 MP band —
    the bulk of the measured 2.7 ms); here HBM sees the symbol stream
    once and the packed buffer once, and the roofline is the read of
    codes+lens.
    """
    aw_pad = out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (aw_pad, codes_ref.shape[1]), 0)
    local = jnp.zeros((aw_pad, codes_ref.shape[1]), jnp.uint32)
    off = off_ref[0, :].astype(jnp.int32)
    for s in range(n_pairs):
        c1 = codes_ref[2 * s, :]
        c2 = codes_ref[2 * s + 1, :]
        l1 = lens_ref[2 * s, :]
        l2 = lens_ref[2 * s + 1, :]
        tl = l1 + l2
        l2u = l2.astype(jnp.uint32)
        v_lo = (c1 << l2u) | c2
        v_hi = jnp.where(
            l2 == 0,
            jnp.uint32(0),
            c1 >> jnp.clip(32 - l2, 0, 31).astype(jnp.uint32),
        )
        end = off + tl
        sh = ((32 - (end & 31)) & 31).astype(jnp.uint32)
        inv = jnp.clip(32 - sh.astype(jnp.int32), 0, 31).astype(jnp.uint32)
        lo_spill = jnp.where(sh == 0, jnp.uint32(0), v_lo >> inv)
        hi_spill = jnp.where(sh == 0, jnp.uint32(0), v_hi >> inv)
        d_lo = v_lo << sh
        d_mid = (v_hi << sh) | lo_spill
        d_hi = hi_spill
        w_e = (end - 1) >> 5
        w0c = jnp.clip(w_e, 0, n_aw - 1)
        w1c = jnp.clip(w_e - 1, 0, n_aw - 1)
        w2c = jnp.clip(w_e - 2, 0, n_aw - 1)
        local = local | (
            jnp.where(lane == w0c[None, :], d_lo[None, :], 0)
            | jnp.where(lane == w1c[None, :], d_mid[None, :], 0)
            | jnp.where(lane == w2c[None, :], d_hi[None, :], 0)
        )
        off = end
    out_ref[:] = local


@functools.partial(
    jax.jit, static_argnames=("n_pairs", "n_aw", "aw_pad", "interpret")
)
def _pack_call(codes_t, lens_t, off0, n_pairs: int, n_aw: int, aw_pad: int,
               interpret: bool):
    n_sym_pad, nb_pad = codes_t.shape
    grid = (nb_pad // PACK_TILE,)
    return pl.pallas_call(
        functools.partial(_pack_kernel, n_pairs=n_pairs, n_aw=n_aw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_sym_pad, PACK_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sym_pad, PACK_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PACK_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((aw_pad, PACK_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((aw_pad, nb_pad), jnp.uint32),
        interpret=interpret,
    )(codes_t, lens_t, off0)


def pack_blocks_aligned_pallas(codes, lens, starts, local_words: int,
                               interpret: bool = False):
    """Pallas phase-1 pack: (nb, n_sym) symbol streams -> (AW, nb) uint32
    pre-aligned local buffers, bit-identical to the XLA
    ``_pack_blocks_aligned(..., transpose=False)`` path."""
    nb, n_sym = codes.shape
    if n_sym % 2:
        codes = jnp.pad(codes, ((0, 0), (0, 1)))
        lens = jnp.pad(lens, ((0, 0), (0, 1)))
        n_sym += 1
    n_aw = local_words + 2
    aw_pad = -(-n_aw // 8) * 8
    nb_pad = -(-nb // PACK_TILE) * PACK_TILE
    n_sym_pad = -(-n_sym // 8) * 8
    codes_t = jnp.pad(
        codes.T.astype(jnp.uint32), ((0, n_sym_pad - n_sym), (0, nb_pad - nb))
    )
    lens_t = jnp.pad(
        lens.T.astype(jnp.int32), ((0, n_sym_pad - n_sym), (0, nb_pad - nb))
    )
    off0 = jnp.pad((starts & 31).astype(jnp.int32)[None, :], ((0, 0), (0, nb_pad - nb)))
    local = _pack_call(
        codes_t, lens_t, off0, n_sym // 2, n_aw, aw_pad, interpret
    )
    return local[:n_aw, :nb]


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
