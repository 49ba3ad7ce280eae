"""Format-combination matrix (model: reference pixel-conversion.test.ts:
:59 synthetic conversions, :282 coordinate checks, :570 dimension property
tests, :658 format matrix): every pair of PngSuite base formats stitched
together must produce the correct common format and exact pixels."""

import itertools
import os

import numpy as np
import pytest

from image_stitch_tpu import PngDecoder, concat_to_buffer, convert_band, parse_png_header
from tests.conftest import PNGSUITE_DIR

# One representative per (color type, depth) class.
FORMATS = [
    "basn0g01.png",  # gray 1
    "basn0g08.png",  # gray 8
    "basn0g16.png",  # gray 16
    "basn2c08.png",  # rgb 8
    "basn2c16.png",  # rgb 16
    "basn3p08.png",  # palette 8 (superset)
    "basn4a08.png",  # gray+alpha 8
    "basn4a16.png",  # gray+alpha 16
    "basn6a08.png",  # rgba 8
    "basn6a16.png",  # rgba 16
]


def decode_rgba(path, target_depth):
    d = PngDecoder(path)
    h = d.png_header
    meta = d.get_header().metadata
    out = np.vstack(
        [
            convert_band(b, h.width, h.bit_depth, h.color_type, target_depth,
                         palette=meta.get("palette"), trns=meta.get("trns"))
            for b in d.bands()
        ]
    )
    d.close()
    return out, h


@pytest.mark.parametrize(
    "a,b", list(itertools.combinations(FORMATS, 2)), ids=lambda n: n.split(".")[0]
)
def test_pairwise_combination(a, b):
    pa = os.path.join(PNGSUITE_DIR, a)
    pb = os.path.join(PNGSUITE_DIR, b)
    out = concat_to_buffer({"inputs": [pa, pb], "layout": {"columns": 2}})
    header = parse_png_header(out)
    _, ha = decode_rgba(pa, 8)[0], parse_png_header(open(pa, "rb").read(8 + 25))
    any16 = any(parse_png_header(open(p, "rb").read(33)).bit_depth == 16 for p in (pa, pb))
    # Common-format rule: RGBA, 16-bit iff any input 16-bit.
    assert header.color_type == 6
    assert header.bit_depth == (16 if any16 else 8)
    assert header.width == 64 and header.height == 32

    # Exact pixels: output equals each input converted to the common depth.
    depth = header.bit_depth
    exp_a, _ = decode_rgba(pa, depth)
    exp_b, _ = decode_rgba(pb, depth)
    dec = PngDecoder(out)
    got = np.vstack([convert_band(bb, 64, depth, 6, depth) for bb in dec.bands()])
    np.testing.assert_array_equal(got[:, :32], exp_a)
    np.testing.assert_array_equal(got[:, 32:], exp_b)
