#!/usr/bin/env python
"""Checksummed-prefix stage attribution for the device decode trace.

Each stage-prefix program reduces its outputs to ONE scalar (sum), so no
prefix pays 100+ MB of output materialization that the full program would
have fused away — the confound that made the cumulative profiler print
prefix > full in r5-s4. Differences between consecutive prefixes are the
marginal compute of the added stage (XLA may fuse across the boundary, so
read them as attribution hints, not exact costs).

Usage: python scripts/profile_decode_checksum.py [band_h] [canvas_w] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TIME_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BAND_H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CANVAS_W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
K = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def pipelined_ms(fn, args, n=8):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    # ONE dependent fetch (in-order execution implies the rest done);
    # per-output fetches serialize ~25 ms round trips each and floor the
    # marginal at ~28 ms regardless of the program (the r5-s4 artifact).
    np.asarray(outs[-1])
    t1 = time.perf_counter()
    return (t1 - t0 - single) / (n - 1), single


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
    from image_stitch_tpu.ops import jpeg_idct_device as D

    lq, cq = quality_scaled_tables(85)
    by_y, bx_y = BAND_H // 8, CANVAS_W // 8
    by_c, bx_c = BAND_H // 16, CANVAS_W // 16
    geom = [
        (by_y, bx_y, CANVAS_W, BAND_H, 1, 1),
        (by_c, bx_c, CANVAS_W // 2, BAND_H // 2, 2, 2),
        (by_c, bx_c, CANVAS_W // 2, BAND_H // 2, 2, 2),
    ]
    qtabs = [jnp.asarray(lq, jnp.int32), jnp.asarray(cq, jnp.int32),
             jnp.asarray(cq, jnp.int32)]

    @jax.jit
    def synth(seed):
        key = jax.random.PRNGKey(seed)
        outs = []
        decay = 8.0 / (8.0 + jnp.arange(K, dtype=jnp.float32))
        for by, bx, *_r in geom:
            key, sub = jax.random.split(key)
            mag = jax.random.normal(sub, (by * bx, K)) * 40.0 * decay[None, :]
            outs.append(jnp.clip(mag, -1023, 1023).astype(jnp.int32))
        return outs

    blocks = [b.block_until_ready() for b in synth(0)]
    mp = BAND_H * CANVAS_W / 1e6

    def cs(arrs):
        return sum(jnp.sum(a.astype(jnp.int32) & 0xFFFF) for a in arrs)

    def dequant(bl):
        outs = []
        for b, q, (by, bx, *_r) in zip(bl, qtabs, geom):
            nat_t = D.dezigzag_pad_t(b, K, jnp)
            outs.append(nat_t * q[:, None].astype(jnp.int32))
        return outs

    def idct(bl):
        return [D.idct_islow_exact_t(c.reshape(8, 8, -1), jnp)
                for c in dequant(bl)]

    def planes(bl):
        outs = []
        for pix, (by, bx, *_r) in zip(idct(bl), geom):
            outs.append(jnp.transpose(
                pix.reshape(8, 8, by, bx), (2, 0, 3, 1)
            ).reshape(by * 8, bx * 8))
        return outs

    def ups(bl):
        outs = []
        for plane, (by, bx, comp_w, comp_h, h_exp, v_exp) in zip(
            planes(bl), geom
        ):
            plane = plane[:comp_h, :comp_w]
            plane = D.upsample_plane_x(plane, h_exp, v_exp, jnp)
            outs.append(plane[:BAND_H, :CANVAS_W])
        return outs

    def color(bl):
        y, cb, cr = ups(bl)
        return [D.ycc_to_rgb_x(y, cb, cr, jnp)]

    stages = (
        ("dz+dequant", lambda bl: cs(dequant(bl))),
        ("+idct", lambda bl: cs(idct(bl))),
        ("+planes", lambda bl: cs(planes(bl))),
        ("+upsample", lambda bl: cs(ups(bl))),
        ("+color", lambda bl: cs(color(bl))),
        ("full(rgb out)", lambda bl: jnp.sum(
            D.decode_rgb_trace(bl, qtabs, geom, K, CANVAS_W, BAND_H, jnp)
            .astype(jnp.int32)
        )),
    )
    prev = 0.0
    for name, fn in stages:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        ms, single = pipelined_ms(jfn, (blocks,))
        ms *= 1e3
        print(
            f"{name:14s} cum {ms:7.2f} ms  stage {ms - prev:7.2f} ms  "
            f"({mp / ms * 1e3:6.1f} MP/s cum)  single {single * 1e3:6.1f} "
            f"[wall {time.perf_counter() - t0:.0f}s]", flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
