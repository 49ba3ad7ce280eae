"""Microbench: host JPEG entropy stage (NativeEntropyCoder.encode).

CPU-time best-of (load-immune; see CLAUDE.md). Blocks come from the real
quant stage over bench-tile-like content, so sparsity is representative.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from image_stitch_tpu.native import (  # noqa: E402
    jpeg_quant_band_native,
    get_native_lib,
    NativeEntropyCoder,
    make_huff_table,
)
from image_stitch_tpu.codecs.jpeg.tables import (  # noqa: E402
    quality_scaled_tables,
    build_huffman_codes,
    STD_DC_LUMA_BITS,
    STD_DC_LUMA_VALS,
    STD_AC_LUMA_BITS,
    STD_AC_LUMA_VALS,
    STD_DC_CHROMA_BITS,
    STD_DC_CHROMA_VALS,
    STD_AC_CHROMA_BITS,
    STD_AC_CHROMA_VALS,
)
from bench_quant_stage import make_band  # noqa: E402


def main():
    assert get_native_lib() is not None
    band = make_band()
    h, w = band.shape[:2]
    mp = h * w / 1e6
    lq, cq = quality_scaled_tables(int(os.environ.get("QUALITY", "85")))
    yb, cbb, crb = jpeg_quant_band_native(band, lq, cq)
    luma = make_huff_table(
        build_huffman_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS),
        build_huffman_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS),
    )
    chroma = make_huff_table(
        build_huffman_codes(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS),
        build_huffman_codes(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS),
    )
    reps = int(os.environ.get("REPS", "7"))
    best = float("inf")
    out_len = 0
    for _ in range(reps):
        coder = NativeEntropyCoder(luma, chroma)
        t0 = time.process_time()
        data = coder.encode(yb, cbb, crb)
        dt = time.process_time() - t0
        best = min(best, dt)
        out_len = len(data)
    print(f"entropy stage: {mp / best:.1f} MP/s (best of {reps}, {best*1e3:.1f} ms "
          f"per {mp:.1f} MP band, {out_len} bytes, cpu-time)")


if __name__ == "__main__":
    main()
