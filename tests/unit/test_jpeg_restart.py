"""JPEG restart-interval support (T.81 B.2.4.4 / E.2.4).

Restart groups are the unit of parallel entropy coding: byte-aligned,
DC-reset, independent. These tests pin the stream structure (DRI + RSTn
cadence), decoded-pixel equivalence with the non-restart stream, band-cut
invariance, and host/device byte-exactness.
"""

import io

import numpy as np
import pytest

from image_stitch_tpu.codecs.jpeg.encoder import StreamingJpegEncoder
from image_stitch_tpu.errors import StitchError


def make_image(w=96, h=80, seed=1):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w).astype(np.uint8)
    img = np.zeros((h, w, 4), np.uint8)
    img[:, :, 0] = x[None, :]
    img[:, :, 1] = 128
    img[:, :, 2] = x[None, ::-1]
    img[:, :, 3] = 255
    return (
        (img.astype(np.int16) + rng.integers(-12, 13, img.shape))
        .clip(0, 255)
        .astype(np.uint8)
    )


def encode(img, ri, backend="numpy", band=32, sampling="444", quality=85):
    h, w = img.shape[:2]
    enc = StreamingJpegEncoder(
        w, h, quality, backend=backend, sampling=sampling,
        restart_interval_rows=ri,
    )
    out = b""
    for y in range(0, h, band):
        for c in enc.encode_band(img[y : y + band]):
            out += c
    for c in enc.finish():
        out += c
    return out


def count_rst(data: bytes) -> int:
    n, i = 0, 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            n += 1
            i += 2
        else:
            i += 1
    return n


def dri_value(data: bytes) -> int | None:
    i = data.find(b"\xff\xdd")
    if i < 0:
        return None
    return int.from_bytes(data[i + 4 : i + 6], "big")


IMG = make_image()


def test_structure_dri_and_rst_cadence():
    # 80 rows = 10 MCU rows, 96 px = 12 MCUs/row.
    out = encode(IMG, ri=1)
    assert dri_value(out) == 12
    assert count_rst(out) == 9  # between the 10 groups
    out4 = encode(IMG, ri=4)
    assert dri_value(out4) == 48
    assert count_rst(out4) == 2  # groups of 4,4,2 MCU rows


def test_rst_markers_cycle_mod_8():
    out = encode(IMG, ri=1)
    seen = []
    i = 0
    while i < len(out) - 1:
        if out[i] == 0xFF and 0xD0 <= out[i + 1] <= 0xD7:
            seen.append(out[i + 1] - 0xD0)
            i += 2
        else:
            i += 1
    assert seen == [k & 7 for k in range(len(seen))]


def test_decoded_pixels_equal_non_restart():
    from PIL import Image

    base = np.array(Image.open(io.BytesIO(encode(IMG, 0))))
    for ri in (1, 3, 4):
        r = np.array(Image.open(io.BytesIO(encode(IMG, ri))))
        np.testing.assert_array_equal(base, r)


def test_band_cut_invariance():
    """The stream must not depend on how the caller slices bands."""
    a = encode(IMG, ri=4, band=32)
    b = encode(IMG, ri=4, band=24)
    c = encode(IMG, ri=4, band=80)
    assert a == b == c


def test_owned_decoder_roundtrip():
    """The owned decoder must handle our restart streams: decoding the
    restart stream gives exactly the same pixels as the non-restart stream
    (coefficients identical; only entropy framing differs). PIL stays within
    its known <=2 IDCT rounding envelope vs the owned IDCT."""
    from image_stitch_tpu.codecs.jpeg.owned_decoder import decode_baseline_jpeg
    from PIL import Image

    base = decode_baseline_jpeg(encode(IMG, 0))
    out = encode(IMG, ri=2)
    ours = decode_baseline_jpeg(out)
    np.testing.assert_array_equal(ours, base)
    pil = np.array(Image.open(io.BytesIO(out)).convert("RGB"))
    assert np.abs(ours[:, :, :3].astype(int) - pil.astype(int)).max() <= 2


def test_420_restart_decodes():
    from PIL import Image

    out = encode(IMG, ri=2, sampling="420")
    # 80 rows = 5 MCU rows (16px); 96 px = 6 MCUs/row.
    assert dri_value(out) == 12
    assert count_rst(out) == 2  # groups of 2,2,1
    base = np.array(Image.open(io.BytesIO(encode(IMG, 0, sampling="420"))))
    np.testing.assert_array_equal(
        base, np.array(Image.open(io.BytesIO(out)))
    )


@pytest.mark.parametrize("ri", [1, 2, 4])
def test_device_bytes_match_host(ri):
    host = encode(IMG, ri, backend="numpy")
    dev = encode(IMG, ri, backend="jax")
    assert host == dev


def test_device_partial_tail_group():
    """88 rows = 11 MCU rows with ri=4 -> device groups 4,4 then tail 3."""
    img = make_image(h=88)
    host = encode(img, 4, backend="numpy")
    dev = encode(img, 4, backend="jax")
    assert host == dev


def test_negative_interval_rejected():
    with pytest.raises(StitchError):
        StreamingJpegEncoder(64, 64, 85, restart_interval_rows=-1)


def test_concat_option_plumbing():
    from image_stitch_tpu import concat_to_buffer
    from tests.utils.fixtures import png_from_array

    tile = png_from_array(IMG)
    out = concat_to_buffer(
        {
            "inputs": [tile, tile],
            "layout": {"columns": 2},
            "outputFormat": "jpeg",
            "jpegRestartIntervalRows": 2,
        }
    )
    assert dri_value(out) == 2 * (192 // 8)
    assert count_rst(out) == 4  # 10 MCU rows -> groups 2,2,2,2,2


@pytest.mark.parametrize("ri", [0, 1, 2])
def test_420_device_bytes_match_host(ri):
    """The fused device encoder handles 4:2:0 (box-averaged chroma on
    device, 6-block MCU interleave in the packer) byte-identically to the
    host coder, with and without restart groups."""
    host = encode(IMG, ri, backend="numpy", sampling="420")
    dev = encode(IMG, ri, backend="jax", sampling="420")
    assert host == dev


def test_420_device_partial_tail_group():
    img = make_image(h=112)  # 7 MCU rows (16px); ri=3 -> groups 3,3 + tail 1
    host = encode(img, 3, backend="numpy", sampling="420")
    dev = encode(img, 3, backend="jax", sampling="420")
    assert host == dev
