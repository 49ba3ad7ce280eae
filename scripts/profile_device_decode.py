#!/usr/bin/env python
"""Cumulative stage attribution for the device JPEG decode trace
(dezigzag -> dequant -> exact islow IDCT -> plane assembly -> upsample +
color). Device-resident protocol: on-device synthesized coefficients,
pipelined marginals (8 back-to-back dispatches, dependent scalar fetch),
outputs deleted after wait.

Usage: python scripts/profile_device_decode.py [band_h] [canvas_w] [k]
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


def _touch(out):
    # ONE dependent scalar fetch per call: an XLA executable materializes
    # all outputs before any is readable, so fetching the first leaf
    # proves completion. Fetching every leaf skews multi-output stages by
    # (n_outputs - 1) tunnel round trips — observed as a NEGATIVE stage
    # marginal in the r5-s4 window.
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[0])


def pipelined_ms(fn, args, n=8):
    out = fn(*args)
    _touch(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _touch(out)
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        _touch(o)
    t1 = time.perf_counter()
    for o in outs:
        jax.tree_util.tree_map(lambda a: a.delete(), o)
    return (t1 - t0 - single) / (n - 1)


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
        decay = (8.0 / (8.0 + jnp.arange(K, dtype=jnp.float32)))
        for by, bx, *_r in geom:
            key, sub = jax.random.split(key)
            mag = jax.random.normal(sub, (by * bx, K)) * 40.0 * decay[None, :]
            outs.append(jnp.clip(mag, -1023, 1023).astype(jnp.int32))
        return outs

    blocks = [b.block_until_ready() for b in synth(0)]
    mp = BAND_H * CANVAS_W / 1e6

    def s_dequant(bl):
        outs = []
        for b, q, (by, bx, *_r) in zip(bl, qtabs, geom):
            nat_t = D.dezigzag_pad_t(b, K, jnp)
            outs.append(nat_t * q[:, None].astype(jnp.int32))
        return outs

    def s_idct(bl):
        return [D.idct_islow_exact_t(c.reshape(8, 8, -1), jnp)
                for c in s_dequant(bl)]

    def s_planes(bl):
        outs = []
        for pix, (by, bx, *_r) in zip(s_idct(bl), geom):
            outs.append(jnp.transpose(
                pix.reshape(8, 8, by, bx), (2, 0, 3, 1)
            ).reshape(by * 8, bx * 8))
        return outs

    def s_full(bl):
        return D.decode_rgb_trace(bl, qtabs, geom, K, CANVAS_W, BAND_H, jnp)

    prev = 0.0
    for name, fn in (("dezigzag+dequant", s_dequant), ("+idct", s_idct),
                     ("+planes", s_planes), ("full(+ups+color)", s_full)):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        ms = pipelined_ms(jfn, (blocks,)) * 1e3
        print(f"{name:18s} cum {ms:7.2f} ms  stage {ms - prev:7.2f} ms  "
              f"({mp / ms * 1e3:6.1f} MP/s cum)  "
              f"[wall {time.perf_counter() - t0:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
