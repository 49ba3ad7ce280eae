#!/usr/bin/env python
"""Variant sweep for the device decode program: which axis carries the
cost? Times the FULL fused trace (one program per variant, pipelined
marginal, single dependent scalar fetch) at several k (dezigzag/transport
width), samplings (420 has upsample+quarter chroma; 444 none), and band
heights. Variants compile once each — budget minutes per variant on a
degraded tunnel.

Usage: python scripts/sweep_device_decode.py [variants...]
Variants: k8 k32 k64 s444 s420 h256 (default: k8 k32 k64 s444)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = sys.argv[1:] or ["k8", "k32", "k64", "s444"]


def geom_for(band_h, w, sampling):
    if sampling == "420":
        return [
            (band_h // 8, w // 8, w, band_h, 1, 1),
            (band_h // 16, w // 16, w // 2, band_h // 2, 2, 2),
            (band_h // 16, w // 16, w // 2, band_h // 2, 2, 2),
        ]
    return [(band_h // 8, w // 8, w, band_h, 1, 1)] * 3


def run(band_h, w, k, sampling, out_fmt="rgb"):
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
    from image_stitch_tpu.ops import jpeg_idct_device as D

    lq, cq = quality_scaled_tables(85)
    geom = geom_for(band_h, w, sampling)
    qtabs = [jnp.asarray(lq, jnp.int32), jnp.asarray(cq, jnp.int32),
             jnp.asarray(cq, jnp.int32)]

    def decode_planes(comp_blocks):
        planes = []
        for blocks, q, (by, bx, comp_w, comp_h, h_exp, v_exp) in zip(
            comp_blocks, qtabs, geom
        ):
            plane = D.decode_plane_trace(blocks, q, by, bx, k, jnp)
            plane = plane[:comp_h, :comp_w]
            plane = D.upsample_plane_x(plane, h_exp, v_exp, jnp)
            planes.append(plane[:band_h, :w])
        return planes

    def decode_variant(comp_blocks):
        if out_fmt == "rgb":
            return D.decode_rgb_trace(
                comp_blocks, qtabs, geom, k, w, band_h, jnp
            )
        y, cb, cr = decode_planes(comp_blocks)
        if out_fmt == "planar":
            # Color convert per channel, NO final interleave: three (H, W)
            # uint8 planes out.
            yi = y.astype(jnp.int32)
            cbi = cb.astype(jnp.int32) - 128
            cri = cr.astype(jnp.int32) - 128
            half = 1 << 15
            r = yi + ((91881 * cri + half) >> 16)
            b = yi + ((116130 * cbi + half) >> 16)
            g = yi + (((-22554) * cbi + half + (-46802) * cri) >> 16)
            return tuple(
                jnp.clip(c, 0, 255).astype(jnp.uint8) for c in (r, g, b)
            )
        if out_fmt == "packed":
            # RGBA as one (H, W) uint32: interleave via shifts/ORs
            # (bitcast-equivalent to the (H, W, 4) uint8 layout on LE).
            yi = y.astype(jnp.int32)
            cbi = cb.astype(jnp.int32) - 128
            cri = cr.astype(jnp.int32) - 128
            half = 1 << 15
            r = jnp.clip(yi + ((91881 * cri + half) >> 16), 0, 255)
            b = jnp.clip(yi + ((116130 * cbi + half) >> 16), 0, 255)
            g = jnp.clip(
                yi + (((-22554) * cbi + half + (-46802) * cri) >> 16), 0, 255
            )
            packed = (
                r.astype(jnp.uint32)
                | (g.astype(jnp.uint32) << 8)
                | (b.astype(jnp.uint32) << 16)
                | jnp.uint32(0xFF000000)
            )
            return packed
        raise ValueError(out_fmt)

    @jax.jit
    def synth(seed):
        key = jax.random.PRNGKey(seed)
        outs = []
        decay = 8.0 / (8.0 + jnp.arange(k, dtype=jnp.float32))
        for by, bx, *_r in geom:
            key, sub = jax.random.split(key)
            mag = jax.random.normal(sub, (by * bx, k)) * 40.0 * decay[None, :]
            outs.append(jnp.clip(mag, -1023, 1023).astype(jnp.int32))
        return outs

    decode = jax.jit(decode_variant)

    def touch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])

    def delete(out):
        jax.tree_util.tree_map(lambda a: a.delete(), out)

    blocks = [b.block_until_ready() for b in synth(0)]
    out = decode(blocks)
    touch(out)
    delete(out)
    t0 = time.perf_counter()
    out = decode(blocks)
    touch(out)
    single = time.perf_counter() - t0
    delete(out)
    # One dependent fetch on the LAST output only: in-order device
    # execution makes it imply the rest; per-output fetches serialize
    # ~25 ms round trips and floor everything at ~28 ms/band (the
    # r5-s4 "scale-invariant base" artifact).
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [decode(blocks) for _ in range(8)]
        touch(outs[-1])
        t1 = time.perf_counter()
        for o in outs:
            delete(o)
        m = (t1 - t0 - single) / 7
        best = m if best is None else min(best, m)
    mp = band_h * w / 1e6
    return best * 1e3, mp / best


def main():
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401

    for v in VARIANTS:
        os.environ["STITCH_TPU_DECODE_PADASM"] = "0"
        band_h, w, k, sampling, fmt = 512, 8192, 32, "420", "rgb"
        if v.startswith("k"):
            k = int(v[1:])
        elif v.startswith("s"):
            sampling = v[1:]
        elif v.startswith("h"):
            band_h = int(v[1:])
        elif v in ("planar", "packed", "rgb"):
            fmt = v
        elif v == "padasm":
            os.environ["STITCH_TPU_DECODE_PADASM"] = "1"
            v = "padasm(rgb)"
        t0 = time.perf_counter()
        ms, mpps = run(band_h, w, k, sampling, fmt)
        print(
            f"{v:7s} band {band_h}x{w} k={k} {sampling} {fmt}: "
            f"{ms:7.2f} ms/band ({mpps:6.1f} MP/s) "
            f"[wall {time.perf_counter() - t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
