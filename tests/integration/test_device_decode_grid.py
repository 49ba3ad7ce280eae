"""Grid device-decode fast path: JPEG tiles decoded on-device (host
Huffman -> device dequant/IDCT/upsample/color), assembled on-device, and
fed to the device encoder — output bytes must be identical to the host
backend on every topology (the tier is bit-exact, so routing must be
invisible in the bytes)."""

import io

import numpy as np
import pytest
from PIL import Image

from image_stitch_tpu import concat_to_buffer


def _jpeg_tile(seed: int, w: int, h: int, sampling: str = "420") -> bytes:
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w, dtype=np.float32)
    arr = np.empty((h, w, 3), np.uint8)
    arr[..., 0] = x[None, :].astype(np.uint8)
    arr[..., 1] = rng.integers(0, 256, (h, w), dtype=np.uint8)
    arr[..., 2] = x[None, ::-1].astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, "JPEG", quality=88,
        subsampling={"444": 0, "422": 1, "420": 2}[sampling],
    )
    return buf.getvalue()


def _png_tile(seed: int, w: int, h: int) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    arr[..., 3] = 255
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def _run(inputs, backend: str, **kw) -> bytes:
    opts = {
        "inputs": inputs,
        "layout": {"columns": kw.pop("columns", 2)},
        "outputFormat": "jpeg",
        "jpegQuality": 85,
        "backend": backend,
        "band_height": kw.pop("band_height", 32),
        **kw,
    }
    return concat_to_buffer(opts)


def _count_device_decodes(monkeypatch):
    from image_stitch_tpu.codecs.jpeg.device_decoder import DeviceJpegDecoder

    calls = []
    orig = DeviceJpegDecoder.decode_band

    def counted(self, y0, y1, return_device=False, packed=False):
        calls.append((y0, y1, return_device, packed))
        return orig(self, y0, y1, return_device, packed)

    monkeypatch.setattr(DeviceJpegDecoder, "decode_band", counted)
    return calls


def test_jpeg_grid_device_path_bytes_identical(monkeypatch):
    calls = _count_device_decodes(monkeypatch)
    tiles = [_jpeg_tile(s, 64, 64) for s in range(4)]
    host = _run(tiles, "numpy")
    dev = _run(tiles, "jax")
    assert dev == host
    # The fast path actually engaged, with device-resident assembly.
    assert calls and any(c[2] for c in calls)


def test_band_crossing_tile_boundary_falls_back_exactly(monkeypatch):
    """Odd tile heights make some bands cross tile boundaries (partial-
    height segments): those bands take the host assembly while others stay
    on-device — the mix must still be byte-identical."""
    calls = _count_device_decodes(monkeypatch)
    tiles = [_jpeg_tile(s, 48, 56, "444") for s in range(4)]
    host = _run(tiles, "numpy", band_height=16)
    dev = _run(tiles, "jax", band_height=16)
    assert dev == host
    assert calls  # device decode served rows in both plan kinds


def test_mixed_png_jpeg_grid(monkeypatch):
    calls = _count_device_decodes(monkeypatch)
    inputs = [_jpeg_tile(0, 64, 64), _png_tile(1, 64, 64),
              _jpeg_tile(2, 64, 64), _png_tile(3, 64, 64)]
    host = _run(inputs, "numpy")
    dev = _run(inputs, "jax")
    assert dev == host
    assert calls  # JPEG sources still device-decoded inside host bands


def test_duplicate_inputs_share_device_decoder():
    tile = _jpeg_tile(7, 64, 64)
    inputs = [tile, tile, tile, tile]
    host = _run(inputs, "numpy")
    dev = _run(inputs, "jax")
    assert dev == host


def test_device_decode_off_switch(monkeypatch):
    calls = _count_device_decodes(monkeypatch)
    monkeypatch.setenv("STITCH_TPU_DEVICE_DECODE", "0")
    tiles = [_jpeg_tile(s, 64, 64) for s in range(2)]
    host = _run(tiles, "numpy")
    dev = _run(tiles, "jax")
    assert dev == host
    assert not calls


def test_restart_groups_device_grid(monkeypatch):
    """Device decode feeding the restart-groups device encoder — the full
    JPEG -> JPEG device pipeline."""
    calls = _count_device_decodes(monkeypatch)
    tiles = [_jpeg_tile(s, 64, 64) for s in range(4)]
    host = _run(tiles, "numpy", jpeg_restart_interval_rows=1)
    dev = _run(tiles, "jax", jpeg_restart_interval_rows=1)
    assert dev == host
    assert any(c[2] for c in calls)


def test_grid_with_background_holes_falls_back():
    """A grid with a missing cell leaves background: never device-planned,
    still byte-identical."""
    tiles = [_jpeg_tile(s, 40, 40) for s in range(3)]  # 2x2 grid, one hole
    host = _run(tiles, "numpy")
    dev = _run(tiles, "jax")
    assert dev == host


def test_packed_band_bytes_identical(monkeypatch):
    """STITCH_TPU_DECODE_PACKED=1: decode emits (H, W) uint32 byte-packed
    RGBA, the encoder's ycbcr_int unpacks arithmetically — output bytes
    must equal both the unpacked device route and the host backend."""
    tiles = [_jpeg_tile(s, 64, 64) for s in range(4)]
    host = _run(tiles, "numpy")
    dev_unpacked = _run(tiles, "jax")
    monkeypatch.setenv("STITCH_TPU_DECODE_PACKED", "1")
    calls = _count_device_decodes(monkeypatch)
    dev_packed = _run(tiles, "jax")
    assert dev_packed == host == dev_unpacked
    assert any(c[3] for c in calls)  # the packed route actually engaged


def test_packed_band_restart_groups(monkeypatch):
    monkeypatch.setenv("STITCH_TPU_DECODE_PACKED", "1")
    tiles = [_jpeg_tile(s, 64, 64) for s in range(4)]
    host = _run(tiles, "numpy", jpeg_restart_interval_rows=1)
    dev = _run(tiles, "jax", jpeg_restart_interval_rows=1)
    assert dev == host


def test_packed_band_mixed_plan_stream(monkeypatch):
    """Odd tile heights: some bands are device-planned (packed), others
    host-planned (interleaved) — the encoder must unify ranks across its
    pending concat without changing a byte."""
    monkeypatch.setenv("STITCH_TPU_DECODE_PACKED", "1")
    tiles = [_jpeg_tile(s, 48, 56) for s in range(4)]
    host = _run(tiles, "numpy", band_height=16)
    dev = _run(tiles, "jax", band_height=16)
    assert dev == host
