#!/usr/bin/env python
"""A/B variants of the flat aligned merge on synthetic data.

Isolates _merge_aligned's cost drivers: histogram/cumsum, row gathers,
column-select extraction, lane-padding of the record array.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

NB = 196608          # blocks
CAP = 393216         # output words
AW = 14              # aligned words per block
K = 4


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
    print(f"{name:34s} {min(times)*1e3:8.2f} ms   [compile {ct:.1f}s]", flush=True)


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import image_stitch_tpu.ops.device  # noqa: F401

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    bits = np.clip(rng.normal(100, 50, NB), 6, 380).astype(np.int64)
    starts_np = np.concatenate([[0], np.cumsum(bits)[:-1]]).astype(np.int32)
    bits = bits.astype(np.int32)
    aligned_np = rng.integers(0, 2**32, (NB, AW), dtype=np.uint32)

    aligned = jax.device_put(jnp.asarray(aligned_np), dev)
    starts = jax.device_put(jnp.asarray(starts_np), dev)
    block_bits = jax.device_put(jnp.asarray(bits), dev)

    word_ids_np = np.arange(CAP, dtype=np.int32)

    def hist_jlo(starts, block_bits):
        ends = starts + block_bits
        end_word = jnp.clip((ends - 1) >> 5, 0, CAP - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(end_word), end_word, num_segments=CAP,
            indices_are_sorted=True)
        j_lo = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        return j_lo

    def p_hist(starts, block_bits):
        return jnp.sum(hist_jlo(starts, block_bits))

    def merge(aligned, starts, block_bits, pad_to: int, onehot_extract: bool):
        j_lo = hist_jlo(starts, block_bits)
        word_ids = jnp.asarray(word_ids_np)
        wstart = (starts >> 5).astype(jnp.int32)
        n_aw = aligned.shape[1]
        width = 1 + n_aw
        rec = jnp.concatenate(
            [wstart[:, None].astype(jnp.uint32), aligned], axis=1)
        if pad_to > width:
            rec = jnp.pad(rec, ((0, 0), (0, pad_to - width)))
            width = pad_to
        rec = jnp.concatenate(
            [rec, jnp.full((K, width), 0xFFFFFFFF, jnp.uint32)], axis=0)
        dn_row = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

        def gather_k(k):
            rows = jax.lax.gather(
                rec, (j_lo + k)[:, None], dn_row, slice_sizes=(1, width),
                mode=jax.lax.GatherScatterMode.CLIP)
            ws = rows[:, 0].astype(jnp.int32)
            rel = word_ids - ws
            valid = (ws <= word_ids) & (rel < n_aw)
            if onehot_extract == "reduce":
                mask = rel[:, None] == jnp.arange(n_aw, dtype=jnp.int32)[None, :]
                val2d = jnp.where(mask, rows[:, 1:1 + n_aw], jnp.uint32(0))
                val = jax.lax.reduce(
                    val2d, jnp.uint32(0), jax.lax.bitwise_or, (1,))
            elif onehot_extract:
                oh = jax.nn.one_hot(
                    jnp.clip(rel, 0, n_aw - 1), n_aw, dtype=jnp.float32)
                lo = jnp.sum(
                    oh * (rows[:, 1:1 + n_aw] & 0xFFFF).astype(jnp.float32), axis=1)
                hi = jnp.sum(
                    oh * (rows[:, 1:1 + n_aw] >> 16).astype(jnp.float32), axis=1)
                val = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
            else:
                val = jnp.zeros_like(rows[:, 0])
                for c in range(n_aw):
                    val = val | jnp.where(rel == c, rows[:, 1 + c], 0)
            return jnp.where(valid, val, jnp.uint32(0))

        return functools.reduce(
            jnp.bitwise_or, [gather_k(k) for k in range(K)])

    def p_merge(pad_to, onehot):
        def f(aligned, starts, block_bits):
            return jnp.sum(merge(aligned, starts, block_bits, pad_to, onehot))
        return f

    def p_gather_only(aligned, starts, block_bits):
        j_lo = hist_jlo(starts, block_bits)
        rec = jnp.concatenate(
            [aligned, jnp.zeros((K, AW), jnp.uint32)], axis=0)
        dn_row = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        acc = jnp.zeros((CAP,), jnp.uint32)
        for k in range(K):
            rows = jax.lax.gather(
                rec, (j_lo + k)[:, None], dn_row, slice_sizes=(1, AW),
                mode=jax.lax.GatherScatterMode.CLIP)
            acc = acc | rows[:, k % AW]
        return jnp.sum(acc)

    def p_segsum(aligned, starts, block_bits):
        # Scatter-add formulation: phase 1 pre-aligns blocks to their
        # global bit positions, so no two blocks share a BIT in any word
        # — uint32 addition is exactly OR. Column c of every block lands
        # at wstart + c (nondecreasing => sorted segment_sum fast path),
        # and any per-word overlap count is handled naturally (no K cap).
        wstart = (starts >> 5).astype(jnp.int32)
        acc = jnp.zeros((CAP,), jnp.uint32)
        for c in range(AW):
            acc = acc + jax.ops.segment_sum(
                aligned[:, c], jnp.clip(wstart + c, 0, CAP - 1),
                num_segments=CAP, indices_are_sorted=True)
        return jnp.sum(acc)

    def p_segsum_flat(aligned, starts, block_bits):
        # Single unsorted segment_sum over all nb*AW contributions.
        wstart = (starts >> 5).astype(jnp.int32)
        ids = jnp.clip(
            wstart[:, None] + jnp.arange(AW, dtype=jnp.int32)[None, :],
            0, CAP - 1).ravel()
        return jnp.sum(jax.ops.segment_sum(
            aligned.ravel(), ids, num_segments=CAP))

    timeit("segsum merge (14 sorted cols)", p_segsum, aligned, starts, block_bits)
    timeit("segsum merge (flat unsorted)", p_segsum_flat, aligned, starts, block_bits)
    timeit("hist + j_lo only", p_hist, starts, block_bits)
    timeit("gathers only (no extract)", p_gather_only, aligned, starts, block_bits)
    timeit("merge width15 select", p_merge(0, False), aligned, starts, block_bits)
    timeit("merge pad128 select", p_merge(128, False), aligned, starts, block_bits)
    timeit("merge width15 onehot", p_merge(0, True), aligned, starts, block_bits)
    timeit("merge width15 maskreduce", p_merge(0, "reduce"), aligned, starts, block_bits)
    timeit("merge pad16 maskreduce", p_merge(16, "reduce"), aligned, starts, block_bits)


if __name__ == "__main__":
    main()
