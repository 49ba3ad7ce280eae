#!/usr/bin/env python
"""Long-run randomized soak over the round-4 session-5 surfaces:

A. Owned JPEG decode vs PIL (baseline + progressive, 444/422/420, gray,
   random quality, optional restart intervals) — pixel-exact.
B. Native-vs-Python tier parity on truncated JPEG streams (same output
   or same error class).
C. Mixed PNG+JPEG grids through the public concat API, decoded back
   with PIL and compared against a numpy-assembled expectation
   (JPEG inputs round-trip through their own decode, so the canvas is
   assembled from the decoded tiles).
D. Device-entropy CPU run: random canvases streamed to JPEG on the jax
   (CPU) backend with the hybrid-merge default vs the numpy backend —
   byte-identical.

Usage: python scripts/soak_session5.py [minutes] (default 60)
Prints one progress line per ~200 cases; exits nonzero on any failure.
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def case_owned_vs_pil(rng) -> str | None:
    import image_stitch_tpu.codecs.jpeg.owned_decoder as od

    h = int(rng.integers(1, 180))
    w = int(rng.integers(1, 180))
    gray = bool(rng.integers(0, 7) == 0)
    smooth = bool(rng.integers(0, 3) == 0)
    img = rng.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    if smooth:
        img = (np.cumsum(np.cumsum(img.astype(np.int64), 0), 1) % 256).astype(
            np.uint8
        )
    kw = {
        "quality": int(rng.integers(25, 99)),
        "progressive": bool(rng.integers(0, 2)),
        "subsampling": int(rng.integers(0, 3)),
    }
    if rng.integers(0, 2):
        kw["restart_marker_blocks"] = int(rng.integers(1, 10))
    buf = io.BytesIO()
    try:
        Image.fromarray(img).save(buf, "JPEG", **kw)
    except Exception:
        return None  # PIL rejected the combo; not our case
    data = buf.getvalue()
    own = od.decode_baseline_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    if gray:
        pilg = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        if not np.array_equal(own[:, :, 0], pilg):
            return f"owned!=PIL gray {h}x{w} {kw}"
        return None
    if not np.array_equal(own, pil):
        return f"owned!=PIL {h}x{w} {kw}"
    return None


def case_truncation_parity(rng) -> str | None:
    import image_stitch_tpu.codecs.jpeg.owned_decoder as od
    import image_stitch_tpu.native as nat

    h = int(rng.integers(8, 96))
    w = int(rng.integers(8, 96))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(
        buf, "JPEG", quality=int(rng.integers(40, 96)),
        progressive=bool(rng.integers(0, 2)),
    )
    data = buf.getvalue()
    cut = int(rng.integers(600, len(data))) if len(data) > 600 else len(data)
    vdata = data[:cut]

    def run(no_native: bool):
        if no_native:
            os.environ["STITCH_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("STITCH_TPU_NO_NATIVE", None)
        nat._LIB_TRIED = False
        nat._LIB = None
        try:
            return ("ok", od.decode_baseline_jpeg(vdata))
        except Exception as exc:  # noqa: BLE001 - class compared below
            return ("err", type(exc).__name__)

    a = run(False)
    b = run(True)
    os.environ.pop("STITCH_TPU_NO_NATIVE", None)
    nat._LIB_TRIED = False
    nat._LIB = None
    if a[0] != b[0]:
        return f"truncation tier divergence {h}x{w} cut={cut}: {a[0]} vs {b[0]}"
    if a[0] == "ok" and not np.array_equal(a[1], b[1]):
        return f"truncation tier pixel divergence {h}x{w} cut={cut}"
    return None


def case_mixed_grid(rng) -> str | None:
    from image_stitch_tpu import concat_to_buffer
    from image_stitch_tpu.codecs.jpeg.decoder import decode_jpeg_to_rgba

    cols = int(rng.integers(1, 4))
    rows = int(rng.integers(1, 4))
    tw = int(rng.integers(4, 40))
    th = int(rng.integers(4, 40))
    inputs = []
    expected_tiles = []
    for _ in range(cols * rows):
        arr = rng.integers(0, 256, (th, tw, 4), dtype=np.uint8)
        if rng.integers(0, 2):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            inputs.append(buf.getvalue())
            expected_tiles.append(arr)
        else:
            buf = io.BytesIO()
            Image.fromarray(arr[:, :, :3]).save(buf, "JPEG", quality=90)
            inputs.append(buf.getvalue())
            dec = decode_jpeg_to_rgba(buf.getvalue())
            expected_tiles.append(np.asarray(dec))
    out = concat_to_buffer({"inputs": inputs, "layout": {"columns": cols}})
    got = np.asarray(Image.open(io.BytesIO(out)).convert("RGBA"))
    want = np.zeros((rows * th, cols * tw, 4), dtype=np.uint8)
    for i, t in enumerate(expected_tiles):
        r, c = divmod(i, cols)
        want[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = t
    if not np.array_equal(got, want):
        return f"mixed grid mismatch {rows}x{cols} tile {th}x{tw}"
    return None


def case_device_entropy_cpu(rng) -> str | None:
    from image_stitch_tpu import concat_to_buffer

    tw = int(rng.integers(16, 72))
    th = int(rng.integers(16, 72))
    cols = int(rng.integers(1, 3))
    smooth = bool(rng.integers(0, 2))
    tiles = []
    for _ in range(cols):
        arr = rng.integers(0, 256, (th, tw, 4), dtype=np.uint8)
        if smooth:
            arr[:] = arr[0:1, 0:1]  # flat tile: tiny blocks, merge overlap
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        tiles.append(buf.getvalue())
    opts = {
        "inputs": tiles,
        "layout": {"columns": cols},
        "outputFormat": "jpeg",
        "jpegQuality": int(rng.integers(60, 96)),
        "jpeg_restart_interval_rows": 1,
    }
    a = concat_to_buffer({**opts, "backend": "numpy"})
    b = concat_to_buffer({**opts, "backend": "jax"})
    if a != b:
        return f"cpu-jax vs numpy JPEG bytes differ ({th}x{tw}x{cols} smooth={smooth})"
    return None


def main() -> int:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    rng = np.random.default_rng(int(time.time()) % 2**31)
    cases = fails = 0
    counts = {}
    deadline = time.time() + minutes * 60
    funcs = [
        (case_owned_vs_pil, 6),
        (case_truncation_parity, 2),
        (case_mixed_grid, 3),
        (case_device_entropy_cpu, 1),
    ]
    bag = [f for f, wt in funcs for _ in range(wt)]
    while time.time() < deadline:
        fn = bag[int(rng.integers(0, len(bag)))]
        try:
            msg = fn(rng)
        except Exception as exc:  # noqa: BLE001 - soak must report, not die
            msg = f"{fn.__name__} raised {type(exc).__name__}: {exc}"
        cases += 1
        counts[fn.__name__] = counts.get(fn.__name__, 0) + 1
        if msg:
            fails += 1
            print(f"FAIL [{cases}] {msg}", flush=True)
        if cases % 200 == 0:
            print(
                f"[{time.strftime('%H:%M:%S')}] {cases} cases, {fails} fails "
                f"{counts}",
                flush=True,
            )
    print(f"DONE: {cases} cases, {fails} failures {counts}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
