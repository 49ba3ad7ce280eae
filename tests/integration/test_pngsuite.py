"""PngSuite corpus sweep (model: reference tests/integration/pngsuite.test.ts).

Uses PIL as the independent reference decoder: every decodable PngSuite file
must produce identical RGBA pixels through our streaming decoder + convert
path. Corrupt files (x* prefix) must be rejected.
"""

import os

import numpy as np
import pytest

from image_stitch_tpu.codecs.png.decoder import PngDecoder
from image_stitch_tpu.errors import StitchError
from image_stitch_tpu.ops.pixel import convert_band
from tests.conftest import PNGSUITE_DIR


def suite_files():
    return sorted(f for f in os.listdir(PNGSUITE_DIR) if f.endswith(".png"))


def valid_files():
    return [f for f in suite_files() if not f.startswith("x")]


def corrupt_files():
    # xcsn0g01 ("incorrect IDAT checksum") passes a lenient streaming read;
    # the reference similarly only fails files that break parsing. We check
    # the definitely-structurally-broken ones.
    return [f for f in suite_files() if f.startswith("x")]


def decode_ours_rgba(path: str) -> np.ndarray:
    """Our full decode: stream bands -> defilter -> convert to RGBA."""
    dec = PngDecoder(path)
    header = dec.png_header
    meta = dec.get_header().metadata
    target_depth = 16 if header.bit_depth == 16 else 8
    bands = [
        convert_band(
            band,
            header.width,
            header.bit_depth,
            header.color_type,
            target_depth,
            palette=meta.get("palette"),
            trns=meta.get("trns"),
        )
        for band in dec.bands(64)
    ]
    dec.close()
    return np.vstack(bands)


def decode_pil_rgba(path: str, bit_depth: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    gray_key = None
    if img.mode in ("L", "I;16", "I") and isinstance(img.info.get("transparency"), int):
        # PIL does not apply gray color-key transparency on convert('RGBA')
        # (and mishandles it for 16-bit); the PNG spec says it applies.
        gray_key = img.info["transparency"]
    if bit_depth == 16:
        # PIL keeps 16 bits only for grayscale (I;16); multi-channel 16-bit
        # is collapsed to the high byte. Compare full 16 bits where PIL can,
        # high bytes (exact truncation) where it can't.
        arr = np.array(img)
        if arr.dtype != np.uint16:
            return ("hi-byte", np.array(img.convert("RGBA")))
        if arr.ndim == 2:
            h, w = arr.shape
            out = np.empty((h, w, 4), dtype=np.uint16)
            out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr
            out[:, :, 3] = np.where(arr == gray_key, 0, 65535) if gray_key is not None else 65535
            return out
        if arr.shape[2] == 3:
            h, w = arr.shape[:2]
            out = np.empty((h, w, 4), dtype=np.uint16)
            out[:, :, :3] = arr
            out[:, :, 3] = 65535
            return out
        return arr
    out = np.array(img.convert("RGBA"))
    if gray_key is not None:
        # PIL scales sub-byte grays to 8-bit; scale the key the same way.
        if bit_depth < 8:
            gray_key = round(gray_key * 255 / ((1 << bit_depth) - 1))
        gray = np.array(img)
        out[:, :, 3] = np.where(gray == gray_key, 0, 255)
    return out


@pytest.mark.parametrize("name", valid_files())
def test_pngsuite_decode_matches_pil(name):
    path = os.path.join(PNGSUITE_DIR, name)
    ours = decode_ours_rgba(path)
    dec = PngDecoder(path)
    bit_depth = dec.png_header.bit_depth
    dec.close()
    theirs = decode_pil_rgba(path, bit_depth)
    if isinstance(theirs, tuple):
        # Multi-channel 16-bit: PIL's 8-bit view is the exact high byte
        # (rawmode ';16B' truncation), so the high bytes must match exactly.
        kind, pil8 = theirs
        assert kind == "hi-byte"
        assert ours.dtype == np.uint16, name
        np.testing.assert_array_equal(
            (ours >> 8).astype(np.uint8), pil8, err_msg=f"{name} (high bytes)"
        )
        return
    assert theirs.dtype == ours.dtype, name
    assert theirs.shape == ours.shape, name
    np.testing.assert_array_equal(ours, theirs, err_msg=name)


@pytest.mark.parametrize("name", valid_files())
def test_pngsuite_headers_parse(name):
    dec = PngDecoder(os.path.join(PNGSUITE_DIR, name))
    header = dec.get_header()
    assert header.width >= 1 and header.height >= 1
    dec.close()


@pytest.mark.parametrize("name", corrupt_files())
def test_pngsuite_corrupt_rejected(name):
    # Strict mode (verify_crc=True) catches checksum-only corruption too
    # (xcsn0g01 bad IDAT CRC, xhdn0g08 bad IHDR CRC); the default streaming
    # path skips CRC for throughput like the reference's streaming decoder.
    # Every x* file must raise StitchError specifically; decoding cleanly
    # fails the pytest.raises context.
    path = os.path.join(PNGSUITE_DIR, name)
    with pytest.raises(StitchError):
        dec = PngDecoder(path, verify_crc=True)
        for _ in dec.bands(64):
            pass
