#!/usr/bin/env python
"""j_lo-histogram primitive A/B: sorted segment_sum vs factored one-hot
MXU matmul (VERDICT r4 'break the floor' follow-up).

The hybrid merge spends ~1.3 ms on j_lo = exclusive-cumsum(histogram of
end_word): the histogram is a 65K-element sorted segment_sum, and TPU
segment_sum costs ~20-40 ns/element (serial scalar walk — measured,
scripts/bench_merge_primitives.py). A histogram over [0, cap) is also
counts2d[hi, lo] = sum_b onehot_hi[b,hi] * onehot_lo[b,lo] with
w = hi*F + lo — ONE (cap/F, nb) @ (nb, F) matmul that rides the MXU:
0/1 one-hot values are bf16-exact, products are 0/1, and the f32
accumulator is exact for counts < 2^24.

Also times the 393K-element cumsum alone (the other half of j_lo) so the
matmul's headroom is attributed correctly.

Usage: python scripts/bench_hist_matmul.py [nb] [cap_words] [factor]
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
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 393280
F = int(sys.argv[3]) if len(sys.argv) > 3 else 512


@functools.partial(jax.jit, static_argnames=("cap",))
def hist_segsum(end_word, cap):
    return jax.ops.segment_sum(
        jnp.ones_like(end_word), end_word, num_segments=cap,
        indices_are_sorted=True,
    )


@functools.partial(jax.jit, static_argnames=("cap", "f"))
def hist_matmul(end_word, cap, f):
    cap_pad = -(-cap // f) * f
    hi = end_word // f
    lo = end_word % f
    oh_hi = jax.nn.one_hot(hi, cap_pad // f, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot(lo, f, dtype=jnp.bfloat16)
    counts2d = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (cap/f, f)
    return counts2d.reshape(-1)[:cap].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def jlo_segsum(end_word, cap):
    c = hist_segsum.__wrapped__(end_word, cap)
    return (jnp.cumsum(c) - c).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap", "f"))
def jlo_matmul(end_word, cap, f):
    c = hist_matmul.__wrapped__(end_word, cap, f)
    return (jnp.cumsum(c) - c).astype(jnp.int32)


@jax.jit
def cumsum_only(c):
    return jnp.cumsum(c)


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
    # Content-shaped end words: monotone, ~5 words/block mean.
    gaps = np.clip(rng.poisson(5.0, NB), 1, 14)
    end_word = np.minimum(np.cumsum(gaps), CAP - 1).astype(np.int32)
    ew = jnp.asarray(end_word)

    a = np.asarray(hist_segsum(ew, CAP))
    b = np.asarray(hist_matmul(ew, CAP, F))
    assert (a == b).all(), "histogram mismatch"
    print("exact: matmul histogram == segment_sum", flush=True)

    for name, fn, args in (
        ("hist_segsum", hist_segsum, (ew, CAP)),
        ("hist_matmul", hist_matmul, (ew, CAP, F)),
        ("jlo_segsum ", jlo_segsum, (ew, CAP)),
        ("jlo_matmul ", jlo_matmul, (ew, CAP, F)),
        ("cumsum_only", cumsum_only, (jnp.asarray(a),)),
    ):
        s, m = pipelined(fn, args)
        print(f"{name}: single {s:7.2f} ms, pipelined marginal {m:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
