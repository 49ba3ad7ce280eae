#!/usr/bin/env python
"""Stage-by-stage device timing of the FLAT restart-groups entropy program.

Times cumulative prefixes (quantize -> symbols -> starts -> phase1 ->
merge) so each stage's marginal cost is the difference of adjacent rows.
Each prefix is measured as a PIPELINED marginal (1 dispatch vs N
back-to-back dispatches, one dependent fetch each): the tunnel's ~25 ms
round trip exceeds the whole program at 10-15 ms/band, so single-call
timings are all latency (observed: negative stage marginals).

Usage: python scripts/profile_device_stages.py [band_h] [canvas_w] [reps]
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
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device as device  # noqa: F401
    from image_stitch_tpu.codecs.jpeg.tables import (
        STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS, STD_AC_LUMA_BITS,
        STD_AC_LUMA_VALS, STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS,
        STD_DC_LUMA_BITS, STD_DC_LUMA_VALS, build_huffman_codes,
        quality_scaled_tables,
    )
    import image_stitch_tpu.ops.jpeg_entropy_device as ed

    lq, cq = quality_scaled_tables(85)
    dc_l = build_huffman_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_l = build_huffman_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    dc_c = build_huffman_codes(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS)
    ac_c = build_huffman_codes(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS)
    luts = ed.build_entropy_luts(dc_l, ac_l, dc_c, ac_c)

    from _device_bench_common import make_bench_band

    dev = jax.devices()[0]
    band = make_bench_band(
        BAND_H, CANVAS_W, host=os.environ.get("TIME_HOST_BAND") == "1"
    )
    lqd = jax.device_put(jnp.asarray(lq, jnp.int32), dev)
    cqd = jax.device_put(jnp.asarray(cq, jnp.int32), dev)
    lutsd = {k: jax.device_put(v, dev) for k, v in luts.items()}

    n_groups = BAND_H // 8
    cap_g = max(64, (8 * CANVAS_W * 3 + 31) // 32)
    local_words = int(os.environ.get("TIME_LOCAL_WORDS", "12"))
    merge = os.environ.get("TIME_MERGE", "hybrid")
    mp = BAND_H * CANVAS_W / 1e6

    def upto_starts(band):
        yb, cbb, crb = device.jpeg_quantize_trace(band, lqd, cqd)
        codes, lens = ed._symbol_streams_flat(yb, cbb, crb, lutsd, n_groups)
        block_bits = jnp.sum(lens, axis=1)
        nb_g = block_bits.shape[0] // n_groups
        per_group = block_bits.reshape(n_groups, nb_g)
        group_bits = jnp.sum(per_group, axis=1)
        used = (group_bits + 31) >> 5
        dense_base = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(used)[:-1]])
        in_group = jnp.cumsum(per_group, axis=1) - per_group
        starts = ((dense_base[:, None] << 5) + in_group).reshape(-1).astype(jnp.int32)
        return codes, lens, block_bits, starts

    def p_quant(band):
        yb, cbb, crb = device.jpeg_quantize_trace(band, lqd, cqd)
        return jnp.sum(yb.astype(jnp.int32)) + jnp.sum(cbb.astype(jnp.int32))

    def p_symbols(band):
        yb, cbb, crb = device.jpeg_quantize_trace(band, lqd, cqd)
        codes, lens = ed._symbol_streams_flat(yb, cbb, crb, lutsd, n_groups)
        return jnp.sum(codes) + jnp.sum(lens.astype(jnp.uint32))

    def p_starts(band):
        codes, lens, block_bits, starts = upto_starts(band)
        return jnp.sum(codes) + jnp.sum(starts.astype(jnp.uint32))

    def p_phase1(band):
        codes, lens, block_bits, starts = upto_starts(band)
        aligned = ed._pack_blocks_aligned(codes, lens, starts, local_words)
        return jnp.sum(aligned)

    def p_full(band):
        out = ed.jpeg_encode_band_groups_trace(
            band, lqd, cqd, lutsd, n_groups, cap_g, local_words=local_words,
            merge=merge)
        return jnp.sum(out[0]) + jnp.sum(out[1].astype(jnp.uint32))

    stages = [
        ("quantize", p_quant),
        ("symbols", p_symbols),
        ("starts", p_starts),
        ("phase1", p_phase1),
        (f"full({merge})", p_full),
    ]
    n_pipe = int(os.environ.get("TIME_PIPE", "8"))

    def run_n(jf, n):
        out = None
        for _ in range(n):
            out = jf(band)
        float(out)

    prev = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        float(jf(band))
        compile_t = time.perf_counter() - t0
        margs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run_n(jf, 1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n(jf, n_pipe)
            tn = time.perf_counter() - t0
            margs.append((tn - t1) / (n_pipe - 1))
        best = min(margs)
        print(
            f"{name:14s} cum {best * 1e3:7.1f} ms  stage {(best - prev) * 1e3:7.1f} ms"
            f"  ({mp / best:6.1f} MP/s cum)  [compile {compile_t:.1f}s]",
            flush=True,
        )
        prev = best


if __name__ == "__main__":
    main()
