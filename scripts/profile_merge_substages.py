#!/usr/bin/env python
"""Sub-stage ablation of the HYBRID merge (the largest device stage at
~4.3 ms of the 9.4-10.4 ms band: scripts/profile_device_stages.py).

Times cumulative prefixes of _merge_aligned_hybrid's body — j_lo
(histogram+cumsum), + coverer row gather, + masked OR column select,
+ starters segment_sum — as pipelined marginals on top of the shared
phase-1 prefix, so each line's delta is that sub-stage's device cost.

Usage: python scripts/profile_merge_substages.py [band_h] [canvas_w] [reps]
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
    mp = BAND_H * CANVAS_W / 1e6
    total = n_groups * cap_g

    def prefix(band):
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
        starts = (
            (dense_base[:, None] << 5) + in_group
        ).reshape(-1).astype(jnp.int32)
        local = ed._pack_blocks_aligned(
            codes, lens, starts, local_words, transpose=False
        )
        return local, starts, block_bits

    def m_jlo(band):
        local, starts, block_bits = prefix(band)
        ends = starts + block_bits
        end_word = jnp.clip((ends - 1) >> 5, 0, total - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(end_word), end_word, num_segments=total,
            indices_are_sorted=True,
        )
        j_lo = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        return jnp.sum(local) + jnp.sum(j_lo.astype(jnp.uint32))

    def m_gather(band):
        local, starts, block_bits = prefix(band)
        n_aw = local.shape[0]
        ends = starts + block_bits
        end_word = jnp.clip((ends - 1) >> 5, 0, total - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(end_word), end_word, num_segments=total,
            indices_are_sorted=True,
        )
        j_lo = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        wstart = (starts >> 5).astype(jnp.int32)
        rec = jnp.concatenate(
            [
                jnp.concatenate(
                    [wstart[:, None].astype(jnp.uint32), local.T], axis=1
                ),
                jnp.full((1, n_aw + 1), 0x7FFFFFFF, jnp.uint32),
            ],
            axis=0,
        )
        dn_row = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        rows = jax.lax.gather(
            rec, j_lo[:, None], dn_row, slice_sizes=(1, n_aw + 1),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return jnp.sum(rows)

    def m_select(band):
        local, starts, block_bits = prefix(band)
        n_aw = local.shape[0]
        ends = starts + block_bits
        word_ids = jnp.arange(total, dtype=jnp.int32)
        end_word = jnp.clip((ends - 1) >> 5, 0, total - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(end_word), end_word, num_segments=total,
            indices_are_sorted=True,
        )
        j_lo = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        wstart = (starts >> 5).astype(jnp.int32)
        rec = jnp.concatenate(
            [
                jnp.concatenate(
                    [wstart[:, None].astype(jnp.uint32), local.T], axis=1
                ),
                jnp.full((1, n_aw + 1), 0x7FFFFFFF, jnp.uint32),
            ],
            axis=0,
        )
        dn_row = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        rows = jax.lax.gather(
            rec, j_lo[:, None], dn_row, slice_sizes=(1, n_aw + 1),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        ws = rows[:, 0].astype(jnp.int32)
        rel = word_ids - ws
        valid = (ws <= word_ids) & (rel < n_aw)
        mask = rel[:, None] == jnp.arange(n_aw, dtype=jnp.int32)[None, :]
        val2d = jnp.where(mask, rows[:, 1:], jnp.uint32(0))
        cover = jax.lax.reduce(
            val2d, jnp.uint32(0), jax.lax.bitwise_or, (1,)
        )
        cover = jnp.where(valid, cover, jnp.uint32(0))
        return jnp.sum(cover)

    def m_full(band):
        local, starts, block_bits = prefix(band)
        dense = ed._merge_aligned_hybrid(local, starts, block_bits, total)
        return jnp.sum(dense)

    stages = [
        ("prefix(p1)", lambda b: jnp.sum(prefix(b)[0])),
        ("+jlo", m_jlo),
        ("+gather", m_gather),
        ("+select", m_select),
        ("+starters=full", m_full),
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
            f"{name:16s} cum {best * 1e3:7.1f} ms  stage {(best - prev) * 1e3:7.1f} ms"
            f"  ({mp / best:6.1f} MP/s cum)  [compile {compile_t:.1f}s]",
            flush=True,
        )
        prev = best


if __name__ == "__main__":
    main()
