#!/usr/bin/env python
"""Warm the persistent JAX compile cache with every device program the
benchmarks need, via AOT lower+compile (no data upload).

Remote TPU compiles on this link take minutes and degrade through a
session (CLAUDE.md); run this ONCE in the background, then benchmark
against the warm cache. Idempotent: cached programs compile in ~ms.

Usage: python scripts/warm_tpu_cache.py [band_h] [canvas_w]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import ShapeDtypeStruct as S

BAND_H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CANVAS_W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(label: str, fn) -> None:
    t0 = time.perf_counter()
    try:
        fn()
        log(f"{label}: compiled in {time.perf_counter() - t0:.1f}s")
    except Exception as exc:  # keep warming the rest
        log(f"{label}: FAILED after {time.perf_counter() - t0:.1f}s: {exc!r}")


def main() -> None:
    log(f"devices: {jax.devices()}")
    import image_stitch_tpu.ops.device as dev  # sets the compile cache dir
    from image_stitch_tpu.codecs.jpeg.tables import (
        STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS, STD_AC_LUMA_BITS,
        STD_AC_LUMA_VALS, STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS,
        STD_DC_LUMA_BITS, STD_DC_LUMA_VALS, build_huffman_codes,
        quality_scaled_tables,
    )
    from image_stitch_tpu.ops.jpeg_entropy_device import (
        build_entropy_luts, jpeg_encode_band_groups_trace, jpeg_encode_band_trace,
    )

    # The device encoder strips alpha before submit (DeviceJpegEncoder.
    # _strip_alpha), so the production entropy programs see (H, W, 3);
    # the quantize-only backend path sees (H, W, 4). Warm both.
    band = S((BAND_H, CANVAS_W, 3), jnp.uint8)
    band4 = S((BAND_H, CANVAS_W, 4), jnp.uint8)
    qt = S((64,), jnp.int32)
    dc_l = build_huffman_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_l = build_huffman_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    dc_c = build_huffman_codes(STD_DC_CHROMA_BITS, STD_DC_CHROMA_VALS)
    ac_c = build_huffman_codes(STD_AC_CHROMA_BITS, STD_AC_CHROMA_VALS)
    luts = build_entropy_luts(dc_l, ac_l, dc_c, ac_c)
    lut_specs = {k: S(v.shape, v.dtype) for k, v in luts.items()}
    prev_dc = S((3,), jnp.int32)
    bit_base = S((), jnp.int32)

    n_px = BAND_H * CANVAS_W
    cap_full = max(64, (n_px * 3 + 31) // 32)

    # 1. Fused band encode (round-1 path, non-restart)
    timed(
        f"fused band ({BAND_H}x{CANVAS_W}) cap3bpp",
        lambda: jax.jit(
            jpeg_encode_band_trace, static_argnames=("cap_words", "use_pallas")
        )
        .lower(band, qt, qt, lut_specs, prev_dc, bit_base, cap_words=cap_full)
        .compile(),
    )

    # 2. Restart-group variants (ri = 1 and 4 MCU rows), at the encoder's
    # quality-scaled block budgets (12 words for q<=85, 16 for q<=95) and
    # the adaptive capacity buckets typical content settles on (the first
    # band runs the configured 3.0 bits/px, later bands the observed
    # bucket — 2.0-2.5 on bench-like content; see _group_cap_bits_px).
    group_variants = [
        (1, 12, 3.0), (1, 12, 2.5), (1, 12, 2.0),
        (1, 16, 3.0), (4, 12, 3.0),
    ]
    for ri, lw, capb in group_variants:
        n_groups = (BAND_H // 8) // ri
        cap_g = max(64, (int(ri * 8 * CANVAS_W * capb) + 31) // 32)
        timed(
            f"groups band ri={ri} lw={lw} cap={capb}bpp (n_groups={n_groups})",
            lambda n_groups=n_groups, cap_g=cap_g, lw=lw: jax.jit(
                jpeg_encode_band_groups_trace,
                static_argnames=(
                    "n_groups", "cap_words", "use_pallas", "local_words",
                    "merge",
                ),
            )
            .lower(
                band, qt, qt, lut_specs, n_groups, cap_g,
                local_words=lw, merge="hybrid",  # production default
            )
            .compile(),
        )

    # 2b. The bench/sweep harness programs (scripts/time_device_groups.py,
    # bench.py's jax_device_side row, sweep_device_params.py): RGBA band
    # (the scripts skip the encoder's alpha strip), TIME_CAP_BITS default
    # 3.0 bits/px, lw=12, and each merge strategy. Without these the
    # driver's device-side row pays a cold compile inside its budget.
    cap_g3 = max(64, (8 * CANVAS_W * 3 + 31) // 32)
    for merge in ("segsum", "hybrid", "gather"):
        timed(
            f"bench groups band4 lw=12 cap=3bpp merge={merge}",
            lambda merge=merge: jax.jit(
                jpeg_encode_band_groups_trace,
                static_argnames=(
                    "n_groups", "cap_words", "use_pallas", "local_words",
                    "merge",
                ),
            )
            .lower(
                band4, qt, qt, lut_specs, BAND_H // 8, cap_g3,
                local_words=12, merge=merge,
            )
            .compile(),
        )

    # 2c. The on-device bench-band synthesizer (scripts/_device_bench_common
    # .make_bench_band): KB-scale transfers depend on this compiling.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _device_bench_common import make_bench_band  # noqa: E402

    timed(
        f"bench band synth ({BAND_H}x{CANVAS_W})",
        lambda: make_bench_band(BAND_H, CANVAS_W),
    )

    # 2d. The device decode program (bench.py's jax_decode_device_side row
    # = scripts/time_device_decode.py at 512x8192 k=32 q85 4:2:0). Cold
    # compile measured 479 s in a degraded window vs a 420 s row budget —
    # without this warm the driver's decode row can skip on compile alone.
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
    from image_stitch_tpu.ops.jpeg_idct_device import decode_rgb_trace

    lq, cq = quality_scaled_tables(85)
    k_dec = 32
    by_y, bx_y = BAND_H // 8, CANVAS_W // 8
    by_c, bx_c = BAND_H // 16, CANVAS_W // 16
    dec_geom = [
        (by_y, bx_y, CANVAS_W, BAND_H, 1, 1),
        (by_c, bx_c, CANVAS_W // 2, BAND_H // 2, 2, 2),
        (by_c, bx_c, CANVAS_W // 2, BAND_H // 2, 2, 2),
    ]
    dec_qt = [jnp.asarray(lq, jnp.int32), jnp.asarray(cq, jnp.int32),
              jnp.asarray(cq, jnp.int32)]
    dec_blocks = [
        S((by * bx, k_dec), jnp.int32) for by, bx, *_r in dec_geom
    ]
    timed(
        f"decode band ({BAND_H}x{CANVAS_W} k={k_dec} 420)",
        lambda: jax.jit(
            lambda bl: decode_rgb_trace(
                bl, dec_qt, dec_geom, k_dec, CANVAS_W, BAND_H, jnp
            )
        )
        .lower(dec_blocks)
        .compile(),
    )

    # 3. PNG filter-select (XLA trace) at the png_out width
    raw = S((BAND_H, CANVAS_W * 4), jnp.uint8)
    prev = S((CANVAS_W * 4,), jnp.uint8)
    timed(
        f"filter_select ({BAND_H}x{CANVAS_W * 4})",
        lambda: jax.jit(dev.filter_select_trace, static_argnames=("bpp",))
        .lower(raw, prev, 4)
        .compile(),
    )

    # 4. Quantize-only trace (device quantize + host entropy path, RGBA)
    timed(
        f"quantize ({BAND_H}x{CANVAS_W})",
        lambda: jax.jit(dev.jpeg_quantize_trace).lower(band4, qt, qt).compile(),
    )

    # 5. Pallas filter kernel (Mosaic compile)
    from image_stitch_tpu.ops.pallas_kernels import filter_select_pallas

    timed(
        "pallas filter_select",
        lambda: jax.jit(
            lambda r, p: filter_select_pallas(r, p, 4)
        )
        .lower(raw, prev)
        .compile(),
    )
    log("warm complete")


if __name__ == "__main__":
    main()
