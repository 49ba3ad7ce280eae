#!/usr/bin/env python
"""One-shot tunnel link probe: h2d/d2h MB/s on the real backend.

Run BEFORE any device benchmarking (CLAUDE.md round-3 protocol: only
trust device rows when h2d > 100 MB/s and d2h > 30 MB/s). Exits 0 when
the window meets the protocol floor, 1 otherwise, 2 on timeout/hang (run
under `timeout`, e.g. `timeout 150 python scripts/probe_link.py`).
"""

import os
import sys
import time

os.environ.pop("JAX_PLATFORMS", None)
os.environ.pop("XLA_FLAGS", None)

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main() -> int:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    x = np.zeros((int(mb * 1e6),), np.uint8)
    t0 = time.perf_counter()
    a = jax.device_put(x)
    a.block_until_ready()
    t1 = time.perf_counter()
    fetch = np.asarray(a[: len(x) // 4])
    t2 = time.perf_counter()
    h2d = mb / (t1 - t0)
    d2h = (mb / 4) / (t2 - t1)
    ok = h2d > 100 and d2h > 30
    print(
        f"h2d {h2d:.1f} MB/s, d2h {d2h:.1f} MB/s -> "
        f"{'GOOD (protocol floor met)' if ok else 'degraded'}"
    )
    del fetch
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
