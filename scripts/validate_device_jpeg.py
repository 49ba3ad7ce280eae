#!/usr/bin/env python
"""On-TPU byte-exactness check: full JPEG encode via the device restart
path vs the host (numpy/C++) coder, on mixed content (gradient+noise,
flat, saturated, random). Run on real TPU hardware to exercise the MXU
branches (_zz_permute/_ac_lut_lookup) the CPU test mesh skips.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def content(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = np.empty((h, w, 4), np.uint8)
    if kind == "gradnoise":
        base = np.linspace(0, 255, w, dtype=np.float32)
        arr[..., 0] = base[None, :].astype(np.uint8)
        arr[..., 1] = 128
        arr[..., 2] = base[None, ::-1].astype(np.uint8)
        arr[:, :, :3] = np.clip(
            arr[:, :, :3].astype(np.int16) + rng.integers(-10, 11, (h, w, 3)),
            0, 255).astype(np.uint8)
    elif kind == "flat":
        arr[..., :3] = 180
    elif kind == "noise":
        arr[..., :3] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == "saturated":
        arr[..., 0] = 255
        arr[..., 1] = 0
        arr[..., 2] = rng.integers(0, 2, (h, w), dtype=np.uint8) * 255
    arr[..., 3] = 255
    return arr


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    from image_stitch_tpu import concat_streaming

    failures = 0
    for kind in ("gradnoise", "flat", "noise", "saturated"):
        for (h, w) in ((256, 2048), (128, 1024), (48, 136)):
            import zlib as _z

            arr = content(kind, h, w,
                          seed=_z.crc32(f"{kind}:{h}".encode()) & 0xFFFF)
            mk = lambda backend: b"".join(concat_streaming({
                "inputs": [arr],
                "layout": {"columns": 1},
                "outputFormat": "jpeg",
                "jpegQuality": 85,
                "backend": backend,
                "band_height": 64,
                "jpeg_restart_interval_rows": 1,
            }))
            host = mk("numpy")
            dev = mk("jax")
            ok = host == dev
            failures += 0 if ok else 1
            print(f"{kind:10s} {h}x{w}: {'OK byte-exact' if ok else 'MISMATCH'}"
                  f" ({len(host)} bytes)", flush=True)
    if failures:
        raise SystemExit(f"{failures} mismatches")
    print("all byte-exact")


if __name__ == "__main__":
    main()
