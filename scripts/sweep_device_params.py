#!/usr/bin/env python
"""Interleaved same-window sweep of the device groups program's static
parameters (local_words x cap bits/px x merge). The tunnel's speed drifts
tens of percent between minutes (CLAUDE.md), so A/Bs are only valid when
the variants alternate within one window: each round times every variant
once (pipelined x8 marginal), and the report takes the best round per
variant plus the per-round ratios vs the first variant.

Usage: python scripts/sweep_device_params.py [rounds]
Env: SWEEP_VARIANTS="lw:capbits:merge,..." (default compares the
production q85 settings against tighter budgets).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BAND_H, CANVAS_W = 512, 8192
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_PIPE = 8


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401  (compile cache dir)
    from image_stitch_tpu.codecs.jpeg.tables import (
        STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS, STD_AC_LUMA_BITS,
        STD_AC_LUMA_VALS, STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS,
        STD_DC_LUMA_BITS, STD_DC_LUMA_VALS, build_huffman_codes,
        quality_scaled_tables,
    )
    from image_stitch_tpu.ops.jpeg_entropy_device import (
        build_entropy_luts, jpeg_encode_band_groups_trace,
    )

    lq, cq = quality_scaled_tables(85)
    dc_l = build_huffman_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_l = build_huffman_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    dc_c = build_huffman_codes(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS)
    ac_c = build_huffman_codes(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS)
    luts = build_entropy_luts(dc_l, ac_l, dc_c, ac_c)

    from _device_bench_common import make_bench_band

    dev = jax.devices()[0]
    band = make_bench_band(
        BAND_H, CANVAS_W, host=os.environ.get("TIME_HOST_BAND") == "1"
    )
    lqd = jax.device_put(jnp.asarray(lq, jnp.int32), dev)
    cqd = jax.device_put(jnp.asarray(cq, jnp.int32), dev)
    lutsd = {k: jax.device_put(v, dev) for k, v in luts.items()}
    n_groups = BAND_H // 8

    spec = os.environ.get(
        "SWEEP_VARIANTS", "12:24:gather,12:16:gather,6:24:gather,6:16:gather"
    )
    variants = []
    for item in spec.split(","):
        parts = item.split(":")
        lw, capb, merge = int(parts[0]), int(parts[1]), parts[2]
        k = int(parts[3]) if len(parts) > 3 else 4
        cap_g = max(64, (8 * CANVAS_W * capb // 8 + 31) // 32)
        fn = jax.jit(
            lambda band, lq_, cq_, luts_, ng, cg, _lw=lw, _m=merge, _k=k: (
                jpeg_encode_band_groups_trace(
                    band, lq_, cq_, luts_, ng, cg,
                    local_words=_lw, merge=_m, k_overlap=_k,
                )
            ),
            static_argnums=(4, 5),
        )
        variants.append((item, fn, cap_g))

    def run_n(fn, cap_g, n):
        out = None
        for _ in range(n):
            out = fn(band, lqd, cqd, lutsd, n_groups, cap_g)
        float(jnp.sum(out[1]))

    # Compile + warm every variant first.
    for name, fn, cap_g in variants:
        t0 = time.perf_counter()
        run_n(fn, cap_g, 1)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {name: [] for name, _, _ in variants}
    for r in range(ROUNDS):
        for name, fn, cap_g in variants:
            t0 = time.perf_counter()
            run_n(fn, cap_g, 1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n(fn, cap_g, N_PIPE)
            tn = time.perf_counter() - t0
            marg = (tn - t1) / (N_PIPE - 1)
            results[name].append(marg)
            print(f"r{r} {name}: {marg*1000:.1f} ms/band", flush=True)

    mp = BAND_H * CANVAS_W / 1e6
    base_name = variants[0][0]
    print("\n== summary (best-of rounds) ==")
    for name, _, _ in variants:
        best = min(results[name])
        ratios = [
            results[name][i] / results[base_name][i] for i in range(ROUNDS)
        ]
        print(
            f"{name}: best {best*1000:.1f} ms/band ({mp/best:.1f} MP/s)  "
            f"per-round vs {base_name}: "
            + " ".join(f"{x:.2f}" for x in ratios)
        )


if __name__ == "__main__":
    main()
