#!/usr/bin/env python
"""Microbench: which gather/scatter formulations are fast on this TPU?

Feeds the phase-2-shaped problem (393K output rows gathering from 196K
source rows) through different lowerings to find the fast path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_WORDS = 64 * 6144   # output rows (393K)
NB = 64 * 3072        # source rows (196K)


def timeit(name, fn, *args, reps=4):
    jf = jax.jit(fn)
    t0 = time.perf_counter()
    float(jf(*args))
    ct = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jf(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(times)*1e3:8.2f} ms   [compile {ct:.1f}s]", flush=True)


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    # Monotone-ish indices like j_lo (sorted, mostly +0/+1 steps).
    idx = np.minimum(
        np.sort(rng.integers(0, NB, N_WORDS)), NB - 1).astype(np.int32)
    idx_d = jax.device_put(jnp.asarray(idx), dev)
    src13 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (NB, 13), dtype=np.uint32)), dev)
    src16 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (NB, 16), dtype=np.uint32)), dev)
    src128 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (NB, 128), dtype=np.uint32)), dev)
    src1 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, NB, dtype=np.uint32)), dev)

    dn_row = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def g_slice2_col(src, idx):
        # current pattern: (1,2) slice with a column index too
        li = (idx % 11).astype(jnp.int32)
        pair = jax.lax.gather(
            src, jnp.stack([idx, li], axis=-1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0, 1)),
            slice_sizes=(1, 2), mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(pair)

    def g_row13(src, idx):
        rows = jax.lax.gather(
            src, idx[:, None], dn_row, slice_sizes=(1, 13),
            mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(rows)

    def g_row16(src, idx):
        rows = jax.lax.gather(
            src, idx[:, None], dn_row, slice_sizes=(1, 16),
            mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(rows)

    def g_row128(src, idx):
        rows = jax.lax.gather(
            src, idx[:, None], dn_row, slice_sizes=(1, 128),
            mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(rows)

    def g_take_flat(src, idx):
        return jnp.sum(src[idx])

    def g_take_axis0_16(src, idx):
        return jnp.sum(jnp.take(src, idx, axis=0))

    def g_4rows_slice(src, idx):
        rows = jax.lax.gather(
            src, idx[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(4, 16), mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(rows)

    def s_segsum(src1, idx):
        # histogram-style scatter-add: 196K sorted keys into 393K segments
        return jnp.sum(jax.ops.segment_sum(
            jnp.ones_like(src1[: NB], jnp.int32),
            jnp.clip(idx[:NB] * 2, 0, N_WORDS - 1),
            num_segments=N_WORDS, indices_are_sorted=True))

    def h_matmul_hist(src1, idx):
        # 2D-factored one-hot histogram via MXU (coarse x fine)
        keys = jnp.clip(idx[:NB] * 2, 0, N_WORDS - 1)
        # vmap over 64 groups of 3072 keys into 6144 bins each
        k2 = keys.reshape(64, 3072) % 6144
        coarse = k2 >> 6   # 96 classes
        fine = k2 & 63     # 64 classes
        oc = jax.nn.one_hot(coarse, 96, dtype=jnp.float32)
        of = jax.nn.one_hot(fine, 64, dtype=jnp.float32)
        counts = jax.lax.dot_general(
            oc, of, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)  # (64, 96, 64)
        return jnp.sum(counts.astype(jnp.int32))

    def g_sorted_cummax(src1, idx):
        # "gather of sorted indices" alternative: dense compare-free scan
        return jnp.sum(jax.lax.cummax(src1))

    timeit("slice(1,2)+col (current)", g_slice2_col, src13, idx_d)
    timeit("row slice 13 from (nb,13)", g_row13, src13, idx_d)
    timeit("row slice 16 from (nb,16)", g_row16, src16, idx_d)
    timeit("row slice 128 from (nb,128)", g_row128, src128, idx_d)
    timeit("src[idx] flat 1-word", g_take_flat, src1, idx_d)
    timeit("take axis0 (nb,16)", g_take_axis0_16, src16, idx_d)
    timeit("slice (4,16) block", g_4rows_slice, src16, idx_d)
    timeit("segment_sum hist (196K->393K)", s_segsum, src1, idx_d)
    timeit("matmul 2D hist", h_matmul_hist, src1, idx_d)
    timeit("cummax baseline", g_sorted_cummax, src1, idx_d)


if __name__ == "__main__":
    main()
