#!/usr/bin/env python
"""Device-side timing of the restart-groups entropy program: device-resident
input, best-of-N wall time of the jitted call (compile excluded). Use to
A/B kernel-level changes without the link noise that dominates e2e numbers.

Usage: python scripts/time_device_groups.py [band_h] [canvas_w] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BAND_H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CANVAS_W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


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
    # On-device synthesis by default (KB-scale transfers — survives any
    # link window); TIME_HOST_BAND=1 restores the legacy 16 MB upload for
    # A/B against numbers archived with the host-RNG content.
    band = make_bench_band(
        BAND_H, CANVAS_W, host=os.environ.get("TIME_HOST_BAND") == "1"
    )
    lqd = jax.device_put(jnp.asarray(lq, jnp.int32), dev)
    cqd = jax.device_put(jnp.asarray(cq, jnp.int32), dev)
    lutsd = {k: jax.device_put(v, dev) for k, v in luts.items()}

    ri = 1
    n_groups = (BAND_H // 8) // ri
    # TIME_CAP_BITS: per-pixel bit budget (x8 fixed-point, e.g. 16 = 2.0
    # bits/px) — the merge scans the whole allocated output, so a tighter
    # budget is a first-order lever (adaptive-cap experiments).
    cap_bits_x8 = int(os.environ.get("TIME_CAP_BITS", "24"))
    cap_g = max(64, (ri * 8 * CANVAS_W * cap_bits_x8 // 8 + 31) // 32)
    # Mirror the encoder's quality-scaled block budget (q85 -> 12 words).
    local_words = int(os.environ.get("TIME_LOCAL_WORDS", "12"))
    merge = os.environ.get("TIME_MERGE", "hybrid")
    fn = jax.jit(
        lambda *a: jpeg_encode_band_groups_trace(
            *a, local_words=local_words, merge=merge
        ),
        static_argnums=(4, 5),
    )
    def run_once() -> None:
        out = fn(band, lqd, cqd, lutsd, n_groups, cap_g)
        # block_until_ready only waits for the dispatch ack on the tunneled
        # backend; force completion with a dependent scalar fetch (costs one
        # ~25 ms link round trip, constant across A/B runs).
        float(jnp.sum(out[1]))

    t0 = time.perf_counter()
    run_once()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    # Content check for the synth-vs-real A/B (VERDICT r4 item 5): entropy
    # cost is content-dependent, so the band's actual bits/px is part of
    # the record, not just ms/band.
    out = fn(band, lqd, cqd, lutsd, n_groups, cap_g)
    total_bits = float(jnp.sum(out[1]))
    print(f"content: {total_bits / (BAND_H * CANVAS_W):.3f} bits/px", flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    mp = BAND_H * CANVAS_W / 1e6
    best = min(times)
    print(f"all: {[f'{t*1000:.0f}ms' for t in times]}")
    print(f"best: {best*1000:.0f} ms/band ({mp/best:.1f} MP/s device-side)")

    # Pipelined marginal: N back-to-back dispatches, ONE dependent fetch —
    # the streaming encoder's shape (submit keeps the device busy; the
    # fetch latency amortizes over bands in flight). Marginal per band =
    # (t(N) - t(1)) / (N - 1) cancels the fixed ~25 ms tunnel round trip.
    def run_n(n: int) -> None:
        out = None
        for _ in range(n):
            out = fn(band, lqd, cqd, lutsd, n_groups, cap_g)
        float(jnp.sum(out[1]))

    n_pipe = 8
    t1 = min(times)
    tn = []
    for _ in range(max(2, REPS - 2)):
        t0 = time.perf_counter()
        run_n(n_pipe)
        tn.append(time.perf_counter() - t0)
    marg = (min(tn) - t1) / (n_pipe - 1)
    print(
        f"pipelined x{n_pipe}: {min(tn)*1000:.0f} ms total -> "
        f"{marg*1000:.1f} ms/band marginal ({mp/marg:.1f} MP/s device-side)"
    )
    if os.environ.get("TIME_JSON") == "1":
        # Machine-readable last line for bench.py's device-resident row
        # (VERDICT r3 item 1a: a device number must reach the artifact
        # whenever the chip answers, even when the link blocks e2e).
        import json

        print(json.dumps({
            "single_ms_per_band": round(t1 * 1e3, 2),
            "single_mpps": round(mp / t1, 1),
            "pipelined_ms_per_band": round(marg * 1e3, 2),
            "pipelined_mpps": round(mp / marg, 1),
            "band": [BAND_H, CANVAS_W],
            "platform": dev.platform,
        }), flush=True)


if __name__ == "__main__":
    main()
