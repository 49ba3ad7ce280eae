"""Microbench: host fused convert+FDCT+quantize stage (jpeg_quant_band_444).

CPU-time best-of (load-immune on this shared host; see CLAUDE.md). Content
mirrors the bench tiles (smooth gradients + noise channel).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from image_stitch_tpu.native import jpeg_quant_band_native, get_native_lib  # noqa: E402
from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables  # noqa: E402


def make_band(h=512, w=8192, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    band = np.empty((h, w, 4), np.uint8)
    band[:, :, 0] = ((x + y) % 256).astype(np.uint8)
    band[:, :, 1] = (x % 256).astype(np.uint8)
    band[:, :, 2] = rng.integers(64, 192, (h, w), dtype=np.uint8)
    band[:, :, 3] = 255
    return band


def main():
    assert get_native_lib() is not None
    band = make_band()
    h, w = band.shape[:2]
    mp = h * w / 1e6
    lq, cq = quality_scaled_tables(int(os.environ.get("QUALITY", "85")))
    reps = int(os.environ.get("REPS", "7"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.process_time()
        jpeg_quant_band_native(band, lq, cq)
        dt = time.process_time() - t0
        best = min(best, dt)
    print(f"quant stage: {mp / best:.1f} MP/s (best of {reps}, {best*1e3:.1f} ms "
          f"per {mp:.1f} MP band, cpu-time)")


if __name__ == "__main__":
    main()
