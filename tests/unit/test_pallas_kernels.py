"""Pallas kernel tests (interpret mode on CPU; same code compiles via
Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_stitch_tpu.ops.pallas_kernels import dct8_pallas, filter_select_pallas
from image_stitch_tpu.ops.png_filter import filter_select_band


@pytest.mark.parametrize("shape", [(16, 512), (13, 260), (64, 1024)])
@pytest.mark.parametrize("bpp", [3, 4, 8])
def test_filter_select_pallas_matches_oracle(shape, bpp):
    rng = np.random.default_rng(shape[0] * bpp)
    raw = rng.integers(0, 256, shape, dtype=np.uint8)
    prev = rng.integers(0, 256, shape[1], dtype=np.uint8)
    types, filtered, last = filter_select_pallas(raw, prev, bpp, interpret=True)
    exp_types, exp_filtered = filter_select_band(raw, prev, bpp)
    np.testing.assert_array_equal(np.asarray(types), exp_types)
    np.testing.assert_array_equal(np.asarray(filtered), exp_filtered)
    np.testing.assert_array_equal(np.asarray(last), raw[-1])


def test_filter_select_pallas_no_prev():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (24, 400), dtype=np.uint8)
    types, filtered, _ = filter_select_pallas(raw, None, 4, interpret=True)
    exp_types, exp_filtered = filter_select_band(raw, None, 4)
    np.testing.assert_array_equal(np.asarray(types), exp_types)
    np.testing.assert_array_equal(np.asarray(filtered), exp_filtered)


@pytest.mark.parametrize("quality", [85, 100])
def test_dct8_pallas_bit_exact_vs_numpy(quality):
    """The kernel divides by the quant table with the same rounding and the
    same matmul association as the host/XLA paths — bit-exact, including at
    q100 where every rounding tie is exposed (VERDICT r1 item 5)."""
    from image_stitch_tpu.codecs.jpeg.encoder import _DCT, _quantize
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables

    rng = np.random.default_rng(1)
    h, w = 16, 256
    plane = rng.uniform(-128, 127, (h, w)).astype(np.float32)
    lq, _ = quality_scaled_tables(quality)
    got = np.asarray(dct8_pallas(jnp.asarray(plane), jnp.asarray(lq), interpret=True))

    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coefs = (_DCT @ blocks) @ _DCT.T
    want = _quantize(coefs, lq).reshape(-1, 64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [256, 200, 96])
def test_jpeg_quantize_pallas_matches_trace(width):
    """Full quantize stage (YCbCr + DCT + quantize, incl. the 128-lane width
    padding/slicing) == the XLA trace, bit for bit."""
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
    from image_stitch_tpu.ops.device import jpeg_quantize_trace
    from image_stitch_tpu.ops.pallas_kernels import jpeg_quantize_pallas

    import jax

    rng = np.random.default_rng(2)
    band = rng.integers(0, 256, (24, width, 4), dtype=np.uint8)
    lq, cq = quality_scaled_tables(85)
    got = jpeg_quantize_pallas(
        jnp.asarray(band), jnp.asarray(lq), jnp.asarray(cq), interpret=True
    )
    want = jax.jit(jpeg_quantize_trace)(
        jnp.asarray(band), jnp.asarray(lq), jnp.asarray(cq)
    )
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_pallas_enabled_gate(monkeypatch):
    from image_stitch_tpu.ops.pallas_kernels import pallas_enabled

    monkeypatch.delenv("STITCH_TPU_PALLAS", raising=False)
    assert not pallas_enabled()
    monkeypatch.setenv("STITCH_TPU_PALLAS", "1")
    # CPU platform in the test suite: stays off (interpret mode is test-only).
    assert not pallas_enabled()
