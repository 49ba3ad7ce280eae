"""Device convert_band_trace vs the numpy oracle — exact for every format."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_stitch_tpu.ops.device import convert_band_trace
from image_stitch_tpu.ops.pixel import convert_band


CASES = [
    (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
    (2, 8), (2, 16),
    (4, 8), (4, 16),
    (6, 8), (6, 16),
]


@pytest.mark.parametrize("color_type,bit_depth", CASES)
@pytest.mark.parametrize("target", [8, 16])
def test_device_convert_matches_oracle(color_type, bit_depth, target):
    from image_stitch_tpu.utils import scanline_byte_length

    rng = np.random.default_rng(color_type * 100 + bit_depth)
    width, h = 23, 5
    rb = scanline_byte_length(width, bit_depth, color_type)
    raw = rng.integers(0, 256, (h, rb), dtype=np.uint8)
    want = convert_band(raw, width, bit_depth, color_type, target)
    got = np.asarray(
        jax.jit(
            convert_band_trace,
            static_argnames=("width", "bit_depth", "color_type", "target_bit_depth"),
        )(raw, width=width, bit_depth=bit_depth, color_type=color_type,
          target_bit_depth=target)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("target", [8, 16])
def test_device_convert_palette(target):
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    trns = rng.integers(0, 256, 256, dtype=np.uint8)
    raw = rng.integers(0, 256, (4, 23), dtype=np.uint8)
    want = convert_band(raw, 23, 8, 3, target, palette=pal, trns=trns)
    got = np.asarray(
        convert_band_trace(
            jnp.asarray(raw), width=23, bit_depth=8, color_type=3,
            target_bit_depth=target, palette=jnp.asarray(pal),
            trns=jnp.asarray(trns),
        )
    )
    np.testing.assert_array_equal(got, want)
