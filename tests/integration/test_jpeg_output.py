"""JPEG output tests (model: reference tests/unit/jpeg-structure.test.ts and
tests/integration/jpeg-output.test.ts: single SOI/EOI, decodable by an
independent codec, quality monotonicity :153, 16-bit forcing, non-grey
output guard :250)."""

import numpy as np
import pytest

from image_stitch_tpu import PositionedImage, concat_to_buffer, encode_jpeg
from tests.utils.fixtures import decode_jpeg_pil, png_from_array, random_rgba


def count_markers(data: bytes, marker: int) -> int:
    """Count standalone JPEG markers outside entropy-coded data the simple
    way the reference does (jpeg-structure.test.ts:17-37): scan for FF xx."""
    count = 0
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == marker:
            count += 1
            i += 2
        else:
            i += 1
    return count


def smooth_tile(w, h, seed=0):
    x = np.linspace(0, 220, w).astype(np.uint8)
    y = np.linspace(30, 250, h).astype(np.uint8)
    arr = np.zeros((h, w, 4), np.uint8)
    arr[:, :, 0] = x[None, :]
    arr[:, :, 1] = y[:, None]
    arr[:, :, 2] = (seed * 40) % 255
    arr[:, :, 3] = 255
    return arr


def test_structure_single_soi_eoi():
    tiles = [png_from_array(smooth_tile(32, 32, s)) for s in range(4)]
    out = concat_to_buffer(
        {"inputs": tiles, "layout": {"columns": 2}, "outputFormat": "jpeg"}
    )
    assert out[:2] == b"\xff\xd8"
    assert out[-2:] == b"\xff\xd9"
    assert count_markers(out, 0xD8) == 1
    assert count_markers(out, 0xD9) == 1


def test_decodable_and_close():
    tile = smooth_tile(48, 40, 1)
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(tile)] * 2,
            "layout": {"columns": 2},
            "outputFormat": "jpeg",
            "jpegQuality": 92,
        }
    )
    dec = decode_jpeg_pil(out)
    exp = np.hstack([tile[:, :, :3]] * 2)
    assert dec.shape == exp.shape
    err = np.abs(dec.astype(int) - exp.astype(int))
    assert err.max() <= 12
    assert err.mean() < 2.0


def test_non_multiple_of_8_dimensions():
    # Partial final strip pads by edge repetition (jpeg-encoder.ts:157-161).
    tile = smooth_tile(23, 13, 2)
    out = concat_to_buffer(
        {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
         "outputFormat": "jpeg", "jpegQuality": 95}
    )
    dec = decode_jpeg_pil(out)
    assert dec.shape == (13, 23, 3)
    err = np.abs(dec.astype(int) - tile[:, :, :3].astype(int))
    assert err.mean() < 3.0


def test_quality_monotonicity():
    # Higher quality -> larger file (jpeg-output.test.ts:153).
    tile = random_rgba(64, 64, 3)
    sizes = []
    for q in (30, 60, 90):
        out = concat_to_buffer(
            {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
             "outputFormat": "jpeg", "jpegQuality": q}
        )
        sizes.append(len(out))
    assert sizes[0] < sizes[1] < sizes[2]


def test_16bit_input_forced_to_8bit_jpeg():
    a16 = (random_rgba(16, 16, 4).astype(np.uint16)) * 257
    out = concat_to_buffer(
        {"inputs": [png_from_array(a16, bit_depth=16)], "layout": {"columns": 1},
         "outputFormat": "jpeg", "jpegQuality": 95}
    )
    dec = decode_jpeg_pil(out)
    assert dec.shape == (16, 16, 3)
    # 16-bit values scale to the same 8-bit values (v*257 -> v).
    err = np.abs(dec.astype(int) - random_rgba(16, 16, 4)[:, :, :3].astype(int))
    assert err.mean() < 15  # random noise compresses badly; just sanity


def test_output_is_color_not_grey():
    # Guard against channel-order/luma bugs (jpeg-output.test.ts:250).
    tile = np.zeros((16, 16, 4), np.uint8)
    tile[:, :, 0] = 200  # pure red
    tile[:, :, 3] = 255
    out = concat_to_buffer(
        {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
         "outputFormat": "jpeg", "jpegQuality": 95}
    )
    dec = decode_jpeg_pil(out)
    assert dec[:, :, 0].mean() > 150
    assert dec[:, :, 1].mean() < 60
    assert dec[:, :, 2].mean() < 60


def test_transparent_padding_becomes_black():
    # JPEG has no alpha: transparent background composites as black
    # (types.ts:112-115 docs).
    a = random_rgba(8, 16, 5)
    b = random_rgba(8, 8, 6)
    out = concat_to_buffer(
        {"inputs": [png_from_array(a), png_from_array(b)],
         "layout": {"columns": 2}, "outputFormat": "jpeg", "jpegQuality": 95}
    )
    dec = decode_jpeg_pil(out)
    assert dec.shape == (16, 16, 3)
    assert dec[12:, 12:].mean() < 20  # padding area ~black


def test_positioned_jpeg():
    bg = smooth_tile(32, 32, 0)
    spr = np.zeros((8, 8, 4), np.uint8)
    spr[:] = [255, 0, 0, 255]
    out = concat_to_buffer(
        {
            "inputs": [
                PositionedImage(x=0, y=0, source=png_from_array(bg)),
                PositionedImage(x=8, y=8, source=png_from_array(spr)),
            ],
            "layout": {},
            "outputFormat": "jpeg",
            "jpegQuality": 95,
        }
    )
    dec = decode_jpeg_pil(out)
    assert dec.shape == (32, 32, 3)
    region = dec[10:14, 10:14]
    assert region[:, :, 0].mean() > 180
    assert region[:, :, 1].mean() < 80


def test_encode_jpeg_low_level():
    arr = smooth_tile(24, 16, 1)
    out = encode_jpeg(arr, 24, 16, quality=90)
    dec = decode_jpeg_pil(out)
    err = np.abs(dec.astype(int) - arr[:, :, :3].astype(int))
    assert err.mean() < 2.5


def test_invalid_quality_rejected():
    from image_stitch_tpu import StitchError

    with pytest.raises(StitchError, match="quality"):
        concat_to_buffer(
            {"inputs": [png_from_array(random_rgba(4, 4))], "layout": {"columns": 1},
             "outputFormat": "jpeg", "jpegQuality": 0}
        )


def test_backend_parity_jpeg_decode_close():
    """Device and host JPEG paths produce near-identical output."""
    tile = smooth_tile(64, 64, 2)
    outs = {}
    for backend in ("numpy", "jax"):
        outs[backend] = concat_to_buffer(
            {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
             "outputFormat": "jpeg", "backend": backend}
        )
    a = decode_jpeg_pil(outs["numpy"]).astype(int)
    b = decode_jpeg_pil(outs["jax"]).astype(int)
    assert np.abs(a - b).max() <= 2


def test_420_subsampling():
    """4:2:0 (superset option): smaller files, decodable, SOF advertises
    2x2 luma sampling; DC/entropy interleave follows T.81 MCU order."""
    tile = smooth_tile(64, 48, 3)
    outs = {}
    for sampling in ("444", "420"):
        outs[sampling] = concat_to_buffer(
            {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
             "outputFormat": "jpeg", "jpegQuality": 90,
             "jpegSampling": sampling, "backend": "numpy"}
        )
    assert len(outs["420"]) < len(outs["444"])
    # SOF sampling byte: find SOF0 and check Y h/v.
    data = outs["420"]
    sof = data.index(b"\xff\xc0")
    assert data[sof + 11] == 0x22  # Y sampling factors
    dec = decode_jpeg_pil(data)
    err = np.abs(dec.astype(int) - tile[:, :, :3].astype(int))
    assert err.mean() < 3.0


def test_420_non_multiple_of_16():
    tile = smooth_tile(37, 29, 4)
    out = concat_to_buffer(
        {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
         "outputFormat": "jpeg", "jpegQuality": 92, "jpegSampling": "420",
         "backend": "numpy"}
    )
    dec = decode_jpeg_pil(out)
    assert dec.shape == (29, 37, 3)
    err = np.abs(dec.astype(int) - tile[:, :, :3].astype(int))
    assert err.mean() < 4.0


def test_420_python_fallback_matches_native():
    import os

    tile = smooth_tile(32, 32, 5)
    opts = {"inputs": [png_from_array(tile)], "layout": {"columns": 1},
            "outputFormat": "jpeg", "jpegSampling": "420", "backend": "numpy"}
    a = concat_to_buffer(opts)
    import image_stitch_tpu.native as nat

    saved = (nat._LIB, nat._LIB_TRIED)
    os.environ["STITCH_TPU_NO_NATIVE"] = "1"
    nat._LIB, nat._LIB_TRIED = None, False
    try:
        b = concat_to_buffer(opts)
    finally:
        del os.environ["STITCH_TPU_NO_NATIVE"]
        nat._LIB, nat._LIB_TRIED = saved
    assert a == b
