"""Background color end-to-end matrix (model: reference
tests/integration/background-color.test.ts: all syntaxes :309-338, JPEG
alpha handling :182-196)."""

import numpy as np
import pytest

from image_stitch_tpu import StitchError, concat_to_buffer
from tests.utils.fixtures import decode_jpeg_pil, decode_png_pil, png_from_array, random_rgba


def grid_with_padding(background):
    """2-col grid with a short second tile -> padded region shows bg."""
    a = random_rgba(8, 8, 1)
    b = random_rgba(8, 4, 2)
    opts = {
        "inputs": [png_from_array(a), png_from_array(b)],
        "layout": {"columns": 2},
    }
    if background is not None:
        opts["backgroundColor"] = background
    return concat_to_buffer(opts)


@pytest.mark.parametrize(
    "color,expected",
    [
        (None, [0, 0, 0, 0]),
        ("transparent", [0, 0, 0, 0]),
        ("white", [255, 255, 255, 255]),
        ("black", [0, 0, 0, 255]),
        ("yellow", [255, 255, 0, 255]),
        ("CYAN", [0, 255, 255, 255]),
        ("#F00", [255, 0, 0, 255]),
        ("#F008", [255, 0, 0, 136]),
        ("#00FF00", [0, 255, 0, 255]),
        ("#FF000080", [255, 0, 0, 128]),
        ([1, 2, 3], [1, 2, 3, 255]),
        ([9, 8, 7, 6], [9, 8, 7, 6]),
    ],
)
def test_background_syntax_matrix(color, expected):
    out = grid_with_padding(color)
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[6, 12], expected)


def test_invalid_background_rejected():
    with pytest.raises(StitchError):
        grid_with_padding("#XYZ")
    with pytest.raises(StitchError):
        grid_with_padding([300, 0, 0])
    with pytest.raises(StitchError):
        grid_with_padding("chartreuse-ish")


def test_jpeg_background_alpha_ignored():
    """JPEG: background color is used, its alpha ignored
    (reference: background-color.test.ts:182-196)."""
    a = random_rgba(8, 8, 3)
    b = random_rgba(8, 4, 4)
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(a), png_from_array(b)],
            "layout": {"columns": 2},
            "outputFormat": "jpeg",
            "jpegQuality": 95,
            "backgroundColor": [255, 0, 0, 128],  # semi-transparent red
        }
    )
    dec = decode_jpeg_pil(out)
    region = dec[5:8, 9:16]
    assert region[:, :, 0].mean() > 150  # red shows
    assert region[:, :, 1].mean() < 80


def test_16bit_background_scaling():
    """Background colors scale exactly to 16-bit canvases (v*257)."""
    a16 = (random_rgba(4, 4, 5).astype(np.uint16)) * 257
    b8 = random_rgba(4, 2, 6)
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(a16, bit_depth=16), png_from_array(b8)],
            "layout": {"columns": 2},
            "backgroundColor": "#112233",
        }
    )
    from image_stitch_tpu import PngDecoder, convert_band

    dec = PngDecoder(out)
    got = np.vstack([convert_band(b, 8, 16, 6, 16) for b in dec.bands()])
    np.testing.assert_array_equal(
        got[3, 6], [0x11 * 257, 0x22 * 257, 0x33 * 257, 65535]
    )


def test_positioned_background():
    from image_stitch_tpu import PositionedImage

    spr = random_rgba(4, 4, 7)
    out = concat_to_buffer(
        {
            "inputs": [PositionedImage(x=3, y=3, source=png_from_array(spr))],
            "layout": {"width": 10, "height": 10},
            "backgroundColor": "blue",
        }
    )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[0, 0], [0, 0, 255, 255])
