"""Synthetic image builders for tests.

Counterpart of the reference's tests/utils/image-fixtures.ts (createTestPng,
createGradientPng, createTestJpeg) — but built on our own writer plus PIL as
an independent codec.
"""

from __future__ import annotations

import io
import zlib

import numpy as np

from image_stitch_tpu.codecs.png.writer import build_png
from image_stitch_tpu.types import PngHeader


def png_from_array(arr: np.ndarray, bit_depth: int = 8, color_type: int | None = None) -> bytes:
    """Encode an (H, W, C) or (H, W) array to a PNG (filter 0 rows, one IDAT)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if bit_depth == 16:
        raw = arr.astype(">u2").tobytes()
        row_bytes = w * c * 2
    else:
        raw = arr.astype(np.uint8).tobytes()
        row_bytes = w * c
    rows = b"".join(
        b"\x00" + raw[y * row_bytes : (y + 1) * row_bytes] for y in range(h)
    )
    header = PngHeader(width=w, height=h, bit_depth=bit_depth, color_type=color_type)
    return build_png(header, zlib.compress(rows, 6))


def solid_png(width: int, height: int, rgba=(255, 0, 0, 255)) -> bytes:
    arr = np.tile(np.array(rgba, dtype=np.uint8), (height, width, 1))
    return png_from_array(arr)


def gradient_png(width: int, height: int) -> bytes:
    x = np.linspace(0, 255, width, dtype=np.uint8)
    y = np.linspace(0, 255, height, dtype=np.uint8)
    arr = np.zeros((height, width, 4), dtype=np.uint8)
    arr[:, :, 0] = x[None, :]
    arr[:, :, 1] = y[:, None]
    arr[:, :, 2] = 128
    arr[:, :, 3] = 255
    return png_from_array(arr)


def random_rgba(width: int, height: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 4), dtype=np.uint8)


def jpeg_from_array(arr: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JPEG via PIL (the independent codec)."""
    from PIL import Image

    img = Image.fromarray(np.asarray(arr, dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def decode_png_pil(data: bytes) -> np.ndarray:
    """Independent PNG decode (PIL), returned as RGBA uint8 or uint16."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode in ("I;16", "I;16B", "I"):
        return np.array(img)
    return np.array(img.convert("RGBA"))


def decode_jpeg_pil(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(io.BytesIO(data)).convert("RGB"))
