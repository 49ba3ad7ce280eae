"""Mixed-format input grids (model: reference tests/unit/mixed-formats.test.ts,
415 LoC): PNG and JPEG inputs stitched together, validated by decoding the
output with PIL as the independent codec. JPEG inputs are lossy, so the
pixels placed on the canvas must equal what PIL itself decodes from the
same JPEG bytes — that's the exactness contract for mixed grids."""

import io

import numpy as np
import pytest

from image_stitch_tpu import concat_to_buffer
from image_stitch_tpu.types import DecoderOptions


def make_png(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def make_jpeg(arr: np.ndarray, quality=90, **kw) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr[:, :, :3]).save(buf, "JPEG", quality=quality, **kw)
    return buf.getvalue()


def gradient(w, h, seed=0):
    x = np.linspace(10, 245, w).astype(np.uint8)
    a = np.zeros((h, w, 4), np.uint8)
    a[:, :, 0] = x[None, :]
    a[:, :, 1] = (seed * 40) % 256
    a[:, :, 2] = x[None, ::-1]
    a[:, :, 3] = 255
    return a


def decode_out(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(io.BytesIO(data)).convert("RGBA"))


def pil_jpeg_pixels(jpeg: bytes) -> np.ndarray:
    from PIL import Image

    rgb = np.array(Image.open(io.BytesIO(jpeg)).convert("RGB"))
    out = np.empty((*rgb.shape[:2], 4), np.uint8)
    out[:, :, :3] = rgb
    out[:, :, 3] = 255
    return out


def test_png_jpeg_side_by_side_exact():
    png_arr = gradient(48, 40, 1)
    jpeg = make_jpeg(gradient(48, 40, 2))
    out = concat_to_buffer(
        {"inputs": [make_png(png_arr), jpeg], "layout": {"columns": 2}}
    )
    result = decode_out(out)
    np.testing.assert_array_equal(result[:, :48], png_arr)
    np.testing.assert_array_equal(result[:, 48:], pil_jpeg_pixels(jpeg))


def test_interleaved_formats_2x2():
    tiles = [
        make_png(gradient(32, 32, 0)),
        make_jpeg(gradient(32, 32, 1)),
        make_jpeg(gradient(32, 32, 2), subsampling=2),
        make_png(gradient(32, 32, 3)),
    ]
    out = concat_to_buffer({"inputs": tiles, "layout": {"columns": 2}})
    r = decode_out(out)
    np.testing.assert_array_equal(r[:32, :32], gradient(32, 32, 0))
    np.testing.assert_array_equal(r[:32, 32:], pil_jpeg_pixels(tiles[1]))
    np.testing.assert_array_equal(r[32:, :32], pil_jpeg_pixels(tiles[2]))
    np.testing.assert_array_equal(r[32:, 32:], gradient(32, 32, 3))


def test_mixed_sizes_transparent_padding():
    """A short JPEG next to a tall PNG: the gap below the JPEG is transparent
    (reference mixed grid padding semantics)."""
    png_arr = gradient(24, 60, 1)
    jpeg = make_jpeg(gradient(24, 30, 2))
    out = concat_to_buffer(
        {"inputs": [make_png(png_arr), jpeg], "layout": {"columns": 2}}
    )
    r = decode_out(out)
    np.testing.assert_array_equal(r[:, :24], png_arr)
    np.testing.assert_array_equal(r[:30, 24:], pil_jpeg_pixels(jpeg))
    assert (r[30:, 24:, 3] == 0).all()  # transparent padding


def test_mixed_to_jpeg_output():
    """PNG+JPEG inputs -> JPEG output: decodable, right size, and the PNG
    half survives the q95 round trip within tolerance."""
    png_arr = gradient(40, 40, 1)
    jpeg = make_jpeg(gradient(40, 40, 2))
    out = concat_to_buffer(
        {
            "inputs": [make_png(png_arr), jpeg],
            "layout": {"columns": 2},
            "outputFormat": "jpeg",
            "jpegQuality": 95,
        }
    )
    r = decode_out(out)
    assert r.shape == (40, 80, 4)
    assert np.abs(r[:, :40, :3].astype(int) - png_arr[:, :, :3].astype(int)).mean() < 3


def test_mixed_with_owned_jpeg_tier():
    """force_owned routes JPEG inputs through the owned decoder — pixels
    must still equal PIL's (libjpeg-bit-exact contract)."""
    jpeg = make_jpeg(gradient(32, 24, 5), quality=85, subsampling=2)
    png_arr = gradient(32, 24, 6)
    out = concat_to_buffer(
        {
            "inputs": [jpeg, make_png(png_arr)],
            "layout": {"columns": 2},
            "decoderOptions": DecoderOptions(force_owned=True),
        }
    )
    r = decode_out(out)
    np.testing.assert_array_equal(r[:, :32], pil_jpeg_pixels(jpeg))
    np.testing.assert_array_equal(r[:, 32:], png_arr)


def test_mixed_progressive_jpeg_input():
    jpeg = make_jpeg(gradient(32, 24, 7), quality=85, progressive=True)
    out = concat_to_buffer(
        {
            "inputs": [jpeg, jpeg],
            "layout": {"columns": 1},
            "decoderOptions": DecoderOptions(force_owned=True),
        }
    )
    r = decode_out(out)
    np.testing.assert_array_equal(r[:24], pil_jpeg_pixels(jpeg))
    np.testing.assert_array_equal(r[24:], pil_jpeg_pixels(jpeg))


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_mixed_formats_backend_parity(backend):
    tiles = [
        make_png(gradient(32, 32, 0)),
        make_jpeg(gradient(32, 32, 1)),
    ]
    out = concat_to_buffer(
        {"inputs": tiles, "layout": {"columns": 2}, "backend": backend}
    )
    host = concat_to_buffer(
        {"inputs": tiles, "layout": {"columns": 2}, "backend": "numpy"}
    )
    assert out == host


def test_mixed_16bit_png_with_jpeg():
    """16-bit PNG + JPEG: common format promotes to 16-bit; the JPEG's 8-bit
    samples scale by 257 exactly."""
    import zlib

    from image_stitch_tpu import PngHeader, build_png
    from image_stitch_tpu.ops.png_filter import filter_select_band

    rng = np.random.default_rng(3)
    arr16 = rng.integers(0, 65536, (16, 16, 4), dtype=np.uint16)
    raw = arr16.astype(">u2").tobytes()
    rows = np.frombuffer(raw, np.uint8).reshape(16, 16 * 8)
    t, f = filter_select_band(rows, None, 8)
    payload = np.empty((16, 1 + rows.shape[1]), np.uint8)
    payload[:, 0] = t
    payload[:, 1:] = f
    png16 = build_png(
        PngHeader(width=16, height=16, bit_depth=16, color_type=6),
        zlib.compress(payload.tobytes(), 6),
    )
    jpeg = make_jpeg(gradient(16, 16, 2))
    out = concat_to_buffer({"inputs": [png16, jpeg], "layout": {"columns": 2}})
    from image_stitch_tpu import parse_png_header

    header = parse_png_header(out)
    assert header.bit_depth == 16
    # Decode our own output and check the JPEG half is PIL's pixels * 257.
    from image_stitch_tpu.codecs.png.decoder import PngDecoder
    from image_stitch_tpu.ops.pixel import convert_band

    dec = PngDecoder(out)
    bands = [
        convert_band(b, 32, 16, 6, 16) for b in dec.bands(64)
    ]
    full = np.vstack(bands).reshape(16, 32, 4)
    np.testing.assert_array_equal(full[:, :16], arr16)
    np.testing.assert_array_equal(
        full[:, 16:], pil_jpeg_pixels(jpeg).astype(np.uint16) * 257
    )
