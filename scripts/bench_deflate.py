#!/usr/bin/env python
"""Microbenchmark: owned C++ deflate vs CPython zlib by content class.

Payloads: the bench-tile filtered-PNG class (mixed literals+matches),
pure noise (worst case for the matcher), and high-redundancy text.

Usage: python scripts/bench_deflate.py [mb] [reps] [level]
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_inflate import make_payload  # noqa: E402  (same payload classes)


def make_noise(size_mb: float) -> bytes:
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, int(size_mb * 1e6), dtype=np.uint8).tobytes()


def time_owned(raw: bytes, reps: int, level: int) -> tuple[float, int]:
    from image_stitch_tpu.native import NativeDeflator

    best, out_len = float("inf"), 0
    for _ in range(reps):
        d = NativeDeflator(level=level)
        t0 = time.perf_counter()
        d.compress(raw)
        out = d.finish()
        dt = time.perf_counter() - t0
        assert zlib.decompress(out) == raw
        best, out_len = min(best, dt), len(out)
    return best, out_len


def time_zlib(raw: bytes, reps: int, level: int) -> tuple[float, int]:
    best, out_len = float("inf"), 0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = zlib.compress(raw, level)
        dt = time.perf_counter() - t0
        best, out_len = min(best, dt), len(out)
    return best, out_len


def main() -> None:
    size_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    level = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    payloads = [
        ("bench", make_payload("bench", size_mb)),
        ("noise", make_noise(size_mb)),
        ("text", make_payload("text", size_mb)),
    ]
    for name, raw in payloads:
        mb = len(raw) / 1e6
        t_o, n_o = time_owned(raw, reps, level)
        t_z, n_z = time_zlib(raw, reps, level)
        print(
            f"{name}: {mb:.1f} MB raw\n"
            f"  owned  {mb/t_o:7.1f} MB/s  -> {n_o/1e6:.2f} MB"
            f" ({n_o/len(raw)*100:.1f}%)\n"
            f"  zlib-{level} {mb/t_z:6.1f} MB/s  -> {n_z/1e6:.2f} MB"
            f" ({n_z/len(raw)*100:.1f}%)   owned/zlib = {t_z/t_o:.2f}x"
        )


if __name__ == "__main__":
    main()
