"""DeviceJpegDecoder: banded device decode must be band-split-invariant
and bit-identical to the owned host decoder (itself PIL/libjpeg-exact)
across samplings, odd geometries, gray, and quality extremes."""

import io

import numpy as np
import pytest
from PIL import Image

from image_stitch_tpu.codecs.jpeg.device_decoder import DeviceJpegDecoder
from image_stitch_tpu.codecs.jpeg.owned_decoder import decode_baseline_jpeg


def _jpeg(arr: np.ndarray, quality: int = 85, sampling: str = "420") -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, "JPEG", quality=quality,
        subsampling={"444": 0, "422": 1, "420": 2}[sampling],
    )
    return buf.getvalue()


def _photo(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w, dtype=np.float32)
    arr = np.empty((h, w, 3), np.uint8)
    arr[..., 0] = x[None, :].astype(np.uint8)
    arr[..., 1] = np.linspace(0, 255, h, dtype=np.float32)[:, None].astype(
        np.uint8
    )
    arr[..., 2] = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return arr


def _ref_rgba(data: bytes) -> np.ndarray:
    rgb = decode_baseline_jpeg(data)
    a = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([rgb, a], axis=-1)


@pytest.mark.parametrize("sampling", ["444", "422", "420"])
@pytest.mark.parametrize("size", [(64, 64), (45, 67), (17, 130)])
def test_banded_equals_owned(sampling, size):
    data = _jpeg(_photo(*size, seed=sum(size)), 85, sampling)
    dec = DeviceJpegDecoder(data)
    assert dec.safe
    ref = _ref_rgba(data)
    np.testing.assert_array_equal(dec.decode_full(), ref)


@pytest.mark.parametrize("band_h", [1, 3, 8, 16, 40])
def test_band_split_invariance(band_h):
    """Any band split — including splits landing mid-MCU, where the h2v2
    vertical filter needs the neighbor row across the band edge — must
    reproduce the whole-image decode exactly."""
    data = _jpeg(_photo(45, 67, seed=9), 85, "420")
    dec = DeviceJpegDecoder(data)
    ref = _ref_rgba(data)
    parts = [
        dec.decode_band(y0, min(dec.height, y0 + band_h))
        for y0 in range(0, dec.height, band_h)
    ]
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), ref)


def test_gray_and_quality_extremes():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (33, 29), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, "JPEG", quality=92)
    data = buf.getvalue()
    dec = DeviceJpegDecoder(data)
    assert dec.safe
    np.testing.assert_array_equal(dec.decode_full(7), _ref_rgba(data))

    for q in (30, 97):
        data = _jpeg(_photo(24, 40, seed=q), q, "444")
        dec = DeviceJpegDecoder(data)
        np.testing.assert_array_equal(dec.decode_full(16), _ref_rgba(data))


def test_progressive_stream_supported():
    """Progressive scans accumulate coefficients in the same host arrays;
    the device pixel stage is scan-script-agnostic."""
    buf = io.BytesIO()
    Image.fromarray(_photo(40, 56, seed=3)).save(
        buf, "JPEG", quality=85, progressive=True
    )
    data = buf.getvalue()
    dec = DeviceJpegDecoder(data)
    np.testing.assert_array_equal(dec.decode_full(16), _ref_rgba(data))


def test_zigzag_prefix_truncation_active():
    """Smooth content must actually truncate the upload (K well below 64)
    and still decode exactly."""
    x = np.linspace(40, 200, 64, dtype=np.float32)
    arr = np.empty((64, 64, 3), np.uint8)
    arr[:] = x[None, :, None].astype(np.uint8)
    data = _jpeg(arr, 85, "420")
    dec = DeviceJpegDecoder(data)
    assert max(dec._k) < 64, dec._k
    np.testing.assert_array_equal(dec.decode_full(), _ref_rgba(data))


def test_device_band_return_type():
    import jax.numpy as jnp

    data = _jpeg(_photo(16, 24, seed=5), 85, "444")
    dec = DeviceJpegDecoder(data)
    band = dec.decode_band(0, 16, return_device=True)
    assert not isinstance(band, np.ndarray)
    np.testing.assert_array_equal(np.asarray(band), _ref_rgba(data)[:16])
