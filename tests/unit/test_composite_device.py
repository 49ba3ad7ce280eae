"""Device-side positioned alpha compositing (ops/composite_device.py):
integer-rational exactness vs the float64 host oracle, exact-tie detection
with host fallback, and the fused per-band program through the public API.
"""

import io

import numpy as np
import pytest

from image_stitch_tpu.ops.composite_device import DeviceCompositor
from image_stitch_tpu.ops.pixel import composite_band


def oracle(canvas, segments):
    ref = canvas.copy()
    for rows, y0, x0 in segments:
        composite_band(ref[y0 : y0 + rows.shape[0]], rows, start_x=x0)
    return ref


def make_segments(seed, n=4, smooth_alpha=True):
    rng = np.random.default_rng(seed)
    segs = []
    for i in range(n):
        h, w = int(rng.integers(10, 40)), int(rng.integers(10, 50))
        s = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        if smooth_alpha:
            s[:, :, 3] = np.linspace(30, 230, w).astype(np.uint8)[None, :]
        segs.append((s, int(rng.integers(0, 20)), int(rng.integers(0, 40))))
    return segs


def test_device_matches_f64_oracle_no_ties():
    canvas = np.zeros((64, 96, 4), np.uint8)
    segs = make_segments(1)
    dc = DeviceCompositor()
    out = dc.composite_band(canvas.copy(), segs)
    assert out is not None and dc.bands_on_device == 1
    np.testing.assert_array_equal(out, oracle(canvas, segs))


def test_opaque_and_transparent_fast_paths():
    canvas = np.full((16, 32, 4), (9, 9, 9, 255), np.uint8)
    opaque = np.full((8, 8, 4), (200, 10, 30, 255), np.uint8)
    clear = np.zeros((8, 8, 4), np.uint8)
    dc = DeviceCompositor()
    out = dc.composite_band(canvas.copy(), [(opaque, 0, 0), (clear, 4, 4)])
    np.testing.assert_array_equal(
        out, oracle(canvas, [(opaque, 0, 0), (clear, 4, 4)])
    )


def test_exact_rational_tie_falls_back():
    """(As=2, Ad=6, s=5, d=174) is an exact round-half tie where float64
    rounds DOWN (oracle 131) but integer-rational rounds up (132): the
    kernel must detect it and punt the band to the host oracle."""
    base = np.zeros((8, 8, 4), np.uint8)
    base[:, :, :3] = 174
    base[:, :, 3] = 6
    top = np.zeros((8, 8, 4), np.uint8)
    top[:, :, :3] = 5
    top[:, :, 3] = 2
    canvas = np.zeros((8, 8, 4), np.uint8)
    dc = DeviceCompositor()
    assert dc.composite_band(canvas.copy(), [(base, 0, 0), (top, 0, 0)]) is None
    assert dc.bands_fallback == 1
    assert oracle(canvas, [(base, 0, 0), (top, 0, 0)])[0, 0, 0] == 131


def test_16bit_band_rejected():
    canvas = np.zeros((8, 8, 4), np.uint16)
    dc = DeviceCompositor()
    assert dc.composite_band(canvas, [(np.zeros((4, 4, 4), np.uint16), 0, 0)]) is None


def test_random_alpha_bands_match_host_end_to_end():
    """Public-API equivalence: positioned concat with random alpha through
    the jax backend (device path + tie fallbacks) == host oracle bytes."""
    from PIL import Image

    from image_stitch_tpu import concat_to_buffer

    def sprite(seed, w, h):
        r = np.random.default_rng(seed)
        a = r.integers(0, 256, (h, w, 4), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(a, "RGBA").save(buf, "PNG")
        return buf.getvalue()

    inputs = [{"source": sprite(0, 120, 90), "x": 0, "y": 0}]
    rng = np.random.default_rng(7)
    for i in range(8):
        inputs.append(
            {
                "source": sprite(i + 1, int(rng.integers(15, 50)), int(rng.integers(15, 50))),
                "x": int(rng.integers(0, 90)),
                "y": int(rng.integers(0, 70)),
                "z_index": int(rng.integers(0, 4)),
            }
        )
    host = concat_to_buffer({"inputs": inputs, "backend": "numpy", "bandHeight": 32})
    dev = concat_to_buffer({"inputs": inputs, "backend": "jax", "bandHeight": 32})
    assert host == dev


def test_sharded_positioned_matches_host():
    from PIL import Image

    from image_stitch_tpu import concat_to_buffer

    def sprite(seed, w, h):
        r = np.random.default_rng(seed)
        a = r.integers(0, 256, (h, w, 4), dtype=np.uint8)
        a[:, :, 3] = np.linspace(20, 240, w).astype(np.uint8)[None, :]
        buf = io.BytesIO()
        Image.fromarray(a, "RGBA").save(buf, "PNG")
        return buf.getvalue()

    inputs = [
        {"source": sprite(1, 100, 80), "x": 0, "y": 0},
        {"source": sprite(2, 60, 50), "x": 20, "y": 10, "z_index": 2},
        {"source": sprite(3, 40, 70), "x": 50, "y": 5, "z_index": 1},
    ]
    host = concat_to_buffer({"inputs": inputs, "backend": "numpy", "bandHeight": 24})
    mesh = concat_to_buffer({"inputs": inputs, "mesh": 8, "bandHeight": 24})
    assert host == mesh
