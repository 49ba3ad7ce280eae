"""BASELINE config 4: pngsuite sweep -> 8-bit JPEG (Adam7 interlaced +
16-bit + paletted inputs through the full bit-depth-conversion pipeline)."""

import os

import numpy as np
import pytest

from image_stitch_tpu import concat_to_buffer
from tests.conftest import PNGSUITE_DIR
from tests.utils.fixtures import decode_jpeg_pil


def pick(names):
    return [os.path.join(PNGSUITE_DIR, n) for n in names]


def test_mixed_depth_pngsuite_grid_to_jpeg():
    """Interlaced + 16-bit + paletted + gray-alpha tiles -> one JPEG."""
    inputs = pick(
        [
            "basi0g16.png",  # interlaced 16-bit gray
            "basn6a16.png",  # 16-bit RGBA
            "basn3p08.png",  # paletted (superset vs reference)
            "basi4a08.png",  # interlaced gray+alpha
            "basn2c16.png",  # 16-bit RGB
            "tbrn2c08.png",  # RGB with tRNS color key
        ]
    )
    out = concat_to_buffer(
        {
            "inputs": inputs,
            "layout": {"columns": 3},
            "outputFormat": "jpeg",
            "jpegQuality": 92,
        }
    )
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"
    dec = decode_jpeg_pil(out)
    assert dec.shape == (64, 96, 3)  # all pngsuite basics are 32x32

    # Cross-check one tile region against the PNG pipeline's own RGBA
    # (16-bit inputs force a 16->8 scale for JPEG).
    from image_stitch_tpu import PngDecoder, convert_band

    d = PngDecoder(inputs[1])
    h = d.png_header
    meta = d.get_header().metadata
    rgba8 = np.vstack(
        [
            convert_band(b, h.width, h.bit_depth, h.color_type, 8,
                         palette=meta.get("palette"), trns=meta.get("trns"))
            for b in d.bands()
        ]
    )
    region = dec[0:32, 32:64].astype(int)
    err = np.abs(region - rgba8[:, :, :3].astype(int))
    assert err.mean() < 12  # JPEG loss over sharp synthetic edges


@pytest.mark.parametrize(
    "name",
    ["basn0g01.png", "basn0g02.png", "basn0g04.png", "basi6a08.png", "basn3p04.png"],
)
def test_each_exotic_depth_encodes(name):
    out = concat_to_buffer(
        {
            "inputs": [os.path.join(PNGSUITE_DIR, name)] * 2,
            "layout": {"columns": 2},
            "outputFormat": "jpeg",
        }
    )
    assert decode_jpeg_pil(out).shape == (32, 64, 3)
