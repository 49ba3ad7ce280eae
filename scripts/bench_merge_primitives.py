#!/usr/bin/env python
"""Pipelined-marginal timing of candidate phase-2 merge primitives.

The hybrid merge costs ~4.9 ms/band (j_lo 1.3 / gather 1.1 / select 1.0 /
starters 1.2 plus glue) on a 512x8192 band (nb=65536 blocks, cap~330K
words). Candidates replacing it:

  flat_segsum — ONE sorted segment_sum over the (nb, AW) locals flattened
    in (b, c) order with per-element indices wstart_b + min(c, used_b-1):
    clamped tail columns are zero-valued (adding 0), boundary words get
    both neighbours' disjoint bits (ADD == OR), and clamping keeps the
    flat index vector nondecreasing, so the sorted fast path applies.
  scatter_or — same layout via jnp.zeros.at[idx].add (unsorted hint).

Usage: python scripts/bench_merge_primitives.py [nb] [cap_words] [reps]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 330000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
AW = 16


@functools.partial(jax.jit, static_argnames=("cap",))
def flat_segsum(local_t, wstart, used, cap):
    # local_t: (nb, AW) uint32; used: (nb,) words actually occupied (>=1).
    nb, n_aw = local_t.shape
    c = jnp.arange(n_aw, dtype=jnp.int32)[None, :]
    idx = wstart[:, None] + jnp.minimum(c, used[:, None] - 1)
    vals = jnp.where(c < used[:, None], local_t, jnp.uint32(0))
    return jax.ops.segment_sum(
        vals.reshape(-1), idx.reshape(-1), num_segments=cap,
        indices_are_sorted=True,
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def scatter_or(local_t, wstart, used, cap):
    nb, n_aw = local_t.shape
    c = jnp.arange(n_aw, dtype=jnp.int32)[None, :]
    idx = wstart[:, None] + jnp.minimum(c, used[:, None] - 1)
    vals = jnp.where(c < used[:, None], local_t, jnp.uint32(0))
    return jnp.zeros((cap,), jnp.uint32).at[idx.reshape(-1)].add(
        vals.reshape(-1)
    )


def pipelined(fn, args, n=8):
    out = fn(*args)
    _ = np.asarray(out[:1])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[:1])
    t1 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    # One dependent fetch (in-order execution implies the rest): per-output
    # fetches serialize ~25 ms round trips each and floor the marginal.
    _ = np.asarray(outs[-1][:1])
    t2 = time.perf_counter()
    single = t1 - t0
    marginal = (t2 - t1 - single) / (n - 1) if n > 1 else single
    return single * 1e3, marginal * 1e3


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # Content-shaped: ~2 bpp -> ~5 words/block mean, some tiny, some big.
    used = np.clip(rng.poisson(5.0, NB), 1, AW - 2).astype(np.int32)
    bits_in_last = rng.integers(1, 33, NB)
    block_bits = (used - 1) * 32 + bits_in_last
    starts = np.concatenate([[0], np.cumsum(block_bits)[:-1]]).astype(np.int64)
    wstart = (starts >> 5).astype(np.int32)
    local = rng.integers(0, 1 << 32, (NB, AW), dtype=np.uint64).astype(
        np.uint32
    )
    cap = max(CAP, int((starts[-1] + block_bits[-1]) // 32) + 2)
    dev = jax.devices()[0]
    lt = jax.device_put(jnp.asarray(local), dev)
    ws = jax.device_put(jnp.asarray(wstart), dev)
    us = jax.device_put(jnp.asarray(used), dev)

    for name, fn in [("flat_segsum", flat_segsum), ("scatter_or", scatter_or)]:
        try:
            single, marg = pipelined(
                functools.partial(fn, cap=cap), (lt, ws, us)
            )
            print(
                f"{name:14s} single {single:7.2f} ms   pipelined marginal "
                f"{marg:7.2f} ms",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
