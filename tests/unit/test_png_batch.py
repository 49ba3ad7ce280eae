"""Batch (de)compress helper tests (model: reference
tests/unit/png-decompress.test.ts) + custom-decoder DI scenario (model:
jsdom-scenario.test.ts dependency injection, :62-157)."""

import numpy as np
import pytest

from image_stitch_tpu import (
    DecoderOptions,
    PngHeader,
    StitchError,
    compress_data,
    compress_image_data,
    concat_to_buffer,
    decompress_data,
    decompress_image_data,
    extract_pixel_data,
)
from tests.utils.fixtures import decode_png_pil, jpeg_from_array, png_from_array, random_rgba


def test_compress_roundtrip():
    data = b"hello stitch world" * 100
    assert decompress_data(compress_data(data)) == data


def test_invalid_zlib_rejected():
    with pytest.raises(StitchError):
        decompress_data(b"not zlib data")


def test_decompress_image_data_roundtrip():
    arr = random_rgba(13, 9, 1)
    png = png_from_array(arr)
    header, rows = decompress_image_data(png)
    assert header.width == 13 and header.height == 9
    np.testing.assert_array_equal(rows.reshape(9, 13, 4), arr)
    np.testing.assert_array_equal(extract_pixel_data(png), rows)


def test_compress_image_data_roundtrip():
    arr = random_rgba(16, 8, 2)
    header = PngHeader(width=16, height=8, bit_depth=8, color_type=6)
    compressed = compress_image_data(arr.reshape(8, 64), header)
    from image_stitch_tpu import build_png

    png = build_png(header, compressed)
    np.testing.assert_array_equal(decode_png_pil(png), arr)


def test_interlaced_batch_decode():
    import os

    from tests.conftest import PNGSUITE_DIR

    path = os.path.join(PNGSUITE_DIR, "basi2c08.png")  # interlaced RGB8
    with open(path, "rb") as f:
        data = f.read()
    header, rows = decompress_image_data(data)
    assert header.interlace_method == 1
    # PIL as independent oracle.
    from PIL import Image

    exp = np.array(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(rows.reshape(header.height, header.width, 3), exp)


def test_custom_decoder_injection():
    """DecoderOptions.custom_decoders replaces the real JPEG backend, the
    DI seam the reference uses for JSDOM (jsdom-scenario.test.ts:62-157)."""
    calls = []

    def fake_jpeg(data: bytes) -> np.ndarray:
        calls.append(len(data))
        out = np.zeros((8, 8, 4), np.uint8)
        out[:] = [1, 2, 3, 255]
        return out

    jpeg = jpeg_from_array(np.zeros((8, 8, 3), np.uint8))
    out = concat_to_buffer(
        {
            "inputs": [jpeg],
            "layout": {"columns": 1},
            "decoderOptions": {"customDecoders": {"jpeg": fake_jpeg}},
        }
    )
    assert calls  # fake decoder was used
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[0, 0], [1, 2, 3, 255])
