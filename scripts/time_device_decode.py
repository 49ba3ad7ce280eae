#!/usr/bin/env python
"""Device-side timing of the JPEG decode compute (dequant + exact islow
IDCT + fancy upsample + fixed-point color): device-resident coefficients,
pipelined marginal with a dependent scalar fetch per call (the tunnel's
block_until_ready is ack-only). The jpeg_tiles device row VERDICT r4
item 2 asks for — measurable on any link (KB-scale transfers only: the
coefficient blocks are synthesized ON device).

Usage: python scripts/time_device_decode.py [band_h] [canvas_w] [k] [reps]
Env: TIME_JSON=1 for the machine-readable line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TIME_CPU") == "1":
    # sitecustomize force-registers the axon backend; env vars alone are
    # overridden — pin via config before any backend-initializing call.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BAND_H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CANVAS_W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
K = int(sys.argv[3]) if len(sys.argv) > 3 else 32  # zigzag-prefix length
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 5


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401  (compile cache dir)
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
    from image_stitch_tpu.ops.jpeg_idct_device import decode_rgb_trace

    lq, cq = quality_scaled_tables(85)
    # 4:2:0 band geometry: Y full-res, Cb/Cr quarter.
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
        """Photo-plausible quantized zigzag-prefix blocks, on device.

        Decode runtime is content-INSENSITIVE at fixed k (every pass is a
        dense static-shape program — BENCHMARKS.md synth-vs-real); the
        magnitudes just need to stay in the legal baseline range.
        """
        key = jax.random.PRNGKey(seed)
        outs = []
        decay = (8.0 / (8.0 + jnp.arange(K, dtype=jnp.float32)))
        for i, (by, bx, *_rest) in enumerate(geom):
            key, sub = jax.random.split(key)
            mag = jax.random.normal(sub, (by * bx, K)) * 40.0 * decay[None, :]
            outs.append(jnp.clip(mag, -1023, 1023).astype(jnp.int32))
        return outs

    @jax.jit
    def decode(comp_blocks):
        return decode_rgb_trace(comp_blocks, qtabs, geom, K, CANVAS_W,
                                BAND_H, jnp)

    blocks = [b.block_until_ready() for b in synth(0)]
    mp = BAND_H * CANVAS_W / 1e6

    t0 = time.perf_counter()
    out = decode(blocks)
    _ = np.asarray(out[0, 0])  # dependent scalar fetch
    compile_s = time.perf_counter() - t0
    out.delete()
    print(f"compile+first: {compile_s:.1f} s", flush=True)

    t0 = time.perf_counter()
    out = decode(blocks)
    _ = np.asarray(out[0, 0])
    single = time.perf_counter() - t0
    out.delete()

    # Pipelined marginal: N back-to-back dispatches, ONE dependent fetch
    # on the LAST output — the device executes dispatches in order, so the
    # last completion implies the rest. Fetching every output serializes
    # one ~25 ms tunnel round trip PER CALL and floors any program at
    # ~25-30 ms/band (this polluted every decode number through r5-s4:
    # the "scale-invariant 28 ms base" was the fetch chain, not compute).
    best_marg = None
    for _ in range(max(1, REPS - 1)):
        t0 = time.perf_counter()
        outs = [decode(blocks) for _ in range(8)]
        _ = np.asarray(outs[-1][0, 0])
        t1 = time.perf_counter()
        for o in outs:
            o.delete()
        marg = (t1 - t0 - single) / 7
        best_marg = marg if best_marg is None else min(best_marg, marg)

    res = {
        "single_ms_per_band": round(single * 1e3, 2),
        "single_mpps": round(mp / single, 1),
        "pipelined_ms_per_band": round(best_marg * 1e3, 2),
        "pipelined_mpps": round(mp / best_marg, 1),
        "band": [BAND_H, CANVAS_W],
        "k": K,
        "platform": jax.default_backend(),
    }
    print(
        f"decode pipelined: {res['pipelined_ms_per_band']} ms/band "
        f"({res['pipelined_mpps']} MP/s device-side), "
        f"single {res['single_ms_per_band']} ms", flush=True,
    )
    if os.environ.get("TIME_JSON"):
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
