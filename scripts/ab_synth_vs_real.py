#!/usr/bin/env python
"""Synth-band vs REAL-bench-content A/B for the device-side row (VERDICT
r4 item 5): entropy-coding cost is content-dependent, so the artifact's
device-side number (which times an on-device synthesized band so it
survives dead d2h windows) must be validated against a band of the
actual bench content at identical shape — bits/px AND ms/band.

The real band is produced by the production pipeline itself: bench.py's
grid_jpeg tiles (8x8 grid of 1024px photo-like PNG tiles) through
``CoreStreamingConcatenator.stream_bands()`` — the exact canvas rows the
host headline encodes. Needs h2d only (one 16 MB upload); the dependent
bit-count fetch is scalar, so this runs in d2h-dead windows too.

Usage: python scripts/ab_synth_vs_real.py [band_h] [canvas_w] [band_idx]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

BAND_H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CANVAS_W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
BAND_IDX = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def real_band() -> np.ndarray:
    """One (BAND_H, CANVAS_W, 4) band of the bench grid's real content."""
    import bench  # repo-root bench: reuse its exact tile generator
    from image_stitch_tpu.core import CoreStreamingConcatenator

    tile = 1024
    grid = CANVAS_W // tile
    inputs = [bench.make_tile_png(s, tile) for s in range(grid * grid)]
    core = CoreStreamingConcatenator(
        {"inputs": inputs, "layout": {"columns": grid},
         "band_height": BAND_H, "backend": "numpy"}
    )
    for i, band in enumerate(core.stream_bands()):
        if i == BAND_IDX:
            return np.ascontiguousarray(band[:BAND_H])
    raise SystemExit(f"band {BAND_IDX} out of range")


def measure(band_dev, label: str) -> dict:
    from image_stitch_tpu.codecs.jpeg.tables import (
        STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS, STD_AC_LUMA_BITS,
        STD_AC_LUMA_VALS, STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS,
        STD_DC_LUMA_BITS, STD_DC_LUMA_VALS, build_huffman_codes,
        quality_scaled_tables,
    )
    from image_stitch_tpu.ops.jpeg_entropy_device import (
        build_entropy_luts, jpeg_encode_band_groups_trace,
    )

    dev = jax.devices()[0]
    lq, cq = quality_scaled_tables(85)
    luts = build_entropy_luts(
        build_huffman_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS),
        build_huffman_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS),
        build_huffman_codes(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS),
        build_huffman_codes(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS),
    )
    lqd = jax.device_put(jnp.asarray(lq, jnp.int32), dev)
    cqd = jax.device_put(jnp.asarray(cq, jnp.int32), dev)
    lutsd = {k: jax.device_put(v, dev) for k, v in luts.items()}
    n_groups = BAND_H // 8
    cap_g = max(64, (8 * CANVAS_W * 24 // 8 + 31) // 32)
    fn = jax.jit(
        lambda *a: jpeg_encode_band_groups_trace(*a, local_words=12),
        static_argnums=(4, 5),
    )

    def run_once() -> float:
        out = fn(band_dev, lqd, cqd, lutsd, n_groups, cap_g)
        return float(jnp.sum(out[1]))  # dependent scalar fetch

    t0 = time.perf_counter()
    total_bits = run_once()
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    bpp = total_bits / (BAND_H * CANVAS_W)
    singles = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        singles.append(time.perf_counter() - t0)
    t1 = min(singles)

    def run_n(n: int) -> None:
        out = None
        for _ in range(n):
            out = fn(band_dev, lqd, cqd, lutsd, n_groups, cap_g)
        float(jnp.sum(out[1]))

    n_pipe = 8
    tn = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(n_pipe)
        tn.append(time.perf_counter() - t0)
    marg = (min(tn) - t1) / (n_pipe - 1)
    mp = BAND_H * CANVAS_W / 1e6
    row = {
        "label": label,
        "bits_per_px": round(bpp, 3),
        "pipelined_ms_per_band": round(marg * 1e3, 2),
        "pipelined_mpps": round(mp / marg, 1),
        "single_ms_per_band": round(t1 * 1e3, 2),
    }
    print(f"[{label}] {row}", flush=True)
    return row


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401  (compile cache dir)
    from _device_bench_common import make_bench_band

    dev = jax.devices()[0]
    rb = real_band()
    print(f"real band {BAND_IDX} assembled: {rb.shape} {rb.dtype}",
          flush=True)
    t0 = time.perf_counter()
    rbd = jax.device_put(rb, dev)
    rbd.block_until_ready()
    print(f"upload: {time.perf_counter() - t0:.1f}s", flush=True)
    rows = [
        measure(rbd, "real"),
        measure(make_bench_band(BAND_H, CANVAS_W), "synth"),
    ]
    print(json.dumps({"band": [BAND_H, CANVAS_W], "rows": rows}),
          flush=True)


if __name__ == "__main__":
    main()
