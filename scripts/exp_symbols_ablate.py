#!/usr/bin/env python
"""Ablation timing of the device symbols stage (_symbol_streams_flat):
time the full stage against variants with one sub-computation replaced by
a shape-compatible stub (WRONG bytes — timing only), interleaved in one
window. The marginal of each ablation bounds that sub-computation's cost.

Usage: python scripts/exp_symbols_ablate.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BAND_H, CANVAS_W = 512, 8192
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_PIPE = 8


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device as device
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

    def symbols_variant(band, ablate: str):
        yb, cbb, crb = device.jpeg_quantize_trace(band, lqd, cqd)
        n = cbb.shape[0]
        comps = (yb, cbb, crb)
        seq = jnp.concatenate(
            [c.reshape(n, 1, 64) for c in comps], axis=1
        ).reshape(-1, 64).astype(jnp.int32)
        zz = seq if ablate == "zz" else ed._zz_permute(seq)
        tsel = jnp.tile(jnp.asarray([0, 1, 1], dtype=jnp.int32), n)

        if ablate == "dc":
            dc_codes = zz[:, 0].astype(jnp.uint32)
            dc_lens = jnp.full(dc_codes.shape, 8, jnp.int32)
        else:
            diff_parts = []
            for c in comps:
                dc_c = c[:, 0].astype(jnp.int32).reshape(n_groups, -1)
                prev_c = jnp.pad(dc_c[:, :-1], ((0, 0), (1, 0)))
                diff_parts.append((dc_c - prev_c).reshape(n, 1))
            diffs = jnp.concatenate(diff_parts, axis=1).reshape(-1)
            dsz = ed._bit_size(diffs, 12)
            dval = (
                jnp.where(diffs < 0, diffs + (1 << dsz) - 1, diffs)
                & ((1 << dsz) - 1)
            )
            dpacked = lutsd["dc_packed"][tsel * 16 + dsz]
            dcode = dpacked & jnp.uint32(0xFFFF)
            dlen = (dpacked >> 16).astype(jnp.int32)
            dc_codes = ((dcode << dsz) | dval.astype(jnp.uint32)).astype(
                jnp.uint32
            )
            dc_lens = (dlen + dsz).astype(jnp.int32)

        v = zz[:, 1:]
        nz = v != 0
        pos = jnp.broadcast_to(jnp.arange(1, 64, dtype=jnp.int32), v.shape)
        if ablate == "cummax":
            # Stub: no scan at all (bounds the whole scan's cost).
            prev_nz = pos - 1
            last_nz = jnp.full((v.shape[0],), 63, jnp.int32)
        elif ablate == "oldcummax":
            # The pre-round-4 lax.cummax form (measured 3.06 ms of the
            # 5.63 ms stage); production is the log-step scan below.
            marked = jnp.where(nz, pos, 0)
            incl_cummax = jax.lax.cummax(marked, axis=1)
            prev_nz = jnp.concatenate(
                [jnp.zeros((v.shape[0], 1), jnp.int32), incl_cummax[:, :-1]],
                axis=1,
            )
            last_nz = incl_cummax[:, -1]
        else:
            _, prev_nz, last_nz = ed._prev_nonzero_scan(nz, pos)

        run = pos - prev_nz - 1
        asz = ed._bit_size(v, 11)
        aval = jnp.where(v < 0, v + (1 << asz) - 1, v) & ((1 << asz) - 1)
        sym = ((run % 16) << 4) | asz
        if ablate == "aclut":
            apacked = (sym.astype(jnp.uint32) << 4) | jnp.uint32(5)
        else:
            apacked = ed._ac_lut_lookup(lutsd["ac_packed"], tsel, sym)
        acode = apacked & jnp.uint32(0xFFFF)
        alen = (apacked >> 16).astype(jnp.int32)
        main_codes = ((acode << asz) | aval.astype(jnp.uint32)).astype(
            jnp.uint32
        )
        main_lens = jnp.where(nz, alen + asz, 0).astype(jnp.int32)

        zrl_here = (
            (~nz) & ((pos - prev_nz) % 16 == 0) & (pos < last_nz[:, None])
        )
        zrl_codes = jnp.broadcast_to(
            lutsd["zrl_code"][tsel][:, None], v.shape
        ).astype(jnp.uint32)
        zrl_lens = jnp.where(
            zrl_here, lutsd["zrl_len"][tsel][:, None], 0
        ).astype(jnp.int32)
        ac_codes = jnp.where(nz, main_codes, zrl_codes)
        ac_lens = jnp.where(nz, main_lens, zrl_lens)

        need_eob = last_nz != 63
        eob_codes = lutsd["eob_code"][tsel].astype(jnp.uint32)
        eob_lens = jnp.where(need_eob, lutsd["eob_len"][tsel], 0).astype(
            jnp.int32
        )

        codes = jnp.concatenate(
            [dc_codes[:, None], ac_codes, eob_codes[:, None]], axis=1
        )
        lens = jnp.concatenate(
            [dc_lens[:, None], ac_lens, eob_lens[:, None]], axis=1
        )
        codes = jnp.where(lens > 0, codes, jnp.uint32(0))
        return jnp.sum(codes) + jnp.sum(lens.astype(jnp.uint32))

    variants = ["none", "aclut", "zz", "cummax", "oldcummax", "dc"]
    fns = {
        a: jax.jit(lambda b, _a=a: symbols_variant(b, _a)) for a in variants
    }
    for a in variants:
        t0 = time.perf_counter()
        float(fns[a](band))
        print(f"warm {a}: {time.perf_counter() - t0:.1f}s", flush=True)

    def run_n(fn, n):
        out = None
        for _ in range(n):
            out = fn(band)
        float(out)

    results = {a: [] for a in variants}
    for r in range(ROUNDS):
        for a in variants:
            t0 = time.perf_counter()
            run_n(fns[a], 1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n(fns[a], N_PIPE)
            tn = time.perf_counter() - t0
            marg = (tn - t1) / (N_PIPE - 1)
            results[a].append(marg)
            print(f"r{r} {a}: {marg*1000:.2f} ms", flush=True)

    print("\n== summary (best-of rounds; ablation saving vs none) ==")
    base_best = min(results["none"])
    for a in variants:
        best = min(results[a])
        print(
            f"{a:8s}: {best*1000:6.2f} ms  saving {(base_best-best)*1000:+.2f} ms"
        )


if __name__ == "__main__":
    main()
