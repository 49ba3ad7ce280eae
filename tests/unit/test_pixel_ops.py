"""Pixel ops unit tests (model: reference tests/unit/pixel-ops.test.ts and
alpha-blending.test.ts truth tables)."""

import numpy as np
import pytest

from image_stitch_tpu.errors import StitchError
from image_stitch_tpu.ops.pixel import (
    background_pixel,
    band_to_bytes,
    bytes_to_band,
    composite_band,
    composite_scanline,
    convert_band,
    convert_scanline,
    determine_common_format,
    extract_scanline_portion,
    get_transparent_color,
    parse_background_color,
    scale_sample,
)
from image_stitch_tpu.types import PngHeader


# --- background color parsing (reference pixel-ops.ts:8-91) -----------------

def test_parse_named_and_default():
    assert parse_background_color(None) == (0, 0, 0, 0)
    assert parse_background_color("transparent") == (0, 0, 0, 0)
    assert parse_background_color("white") == (255, 255, 255, 255)
    assert parse_background_color("RED") == (255, 0, 0, 255)
    assert parse_background_color("grey") == (128, 128, 128, 255)


def test_parse_hex_forms():
    assert parse_background_color("#F00") == (255, 0, 0, 255)
    assert parse_background_color("#F008") == (255, 0, 0, 136)
    assert parse_background_color("#FF0000") == (255, 0, 0, 255)
    assert parse_background_color("#FF000080") == (255, 0, 0, 128)


def test_parse_arrays():
    assert parse_background_color([1, 2, 3]) == (1, 2, 3, 255)
    assert parse_background_color([1, 2, 3, 4]) == (1, 2, 3, 4)
    with pytest.raises(StitchError):
        parse_background_color([1, 2])
    with pytest.raises(StitchError):
        parse_background_color([256, 0, 0])
    with pytest.raises(StitchError):
        parse_background_color("#GGHHII")
    with pytest.raises(StitchError):
        parse_background_color("notacolor")


def test_transparent_color_patterns():
    assert get_transparent_color(6, 8) == b"\x00\x00\x00\x00"
    assert get_transparent_color(6, 16) == b"\x00" * 8
    assert get_transparent_color(2, 8) == b"\x00\x00\x00"
    assert get_transparent_color(6, 8, "white") == b"\xff\xff\xff\xff"
    # 16-bit scale-up is *257 == 0xFFFF for 255.
    assert get_transparent_color(6, 16, "white") == b"\xff" * 8
    # Gray luma BT.601 (reference pixel-ops.ts:123).
    assert get_transparent_color(0, 8, [255, 0, 0]) == bytes([76])  # round(0.299*255)


# --- common format + scaling (reference pixel-ops.ts:293-326) --------------

def test_determine_common_format():
    h8 = PngHeader(1, 1, 8, 2)
    h16 = PngHeader(1, 1, 16, 0)
    assert determine_common_format([h8]) == (8, 6)
    assert determine_common_format([h8, h16]) == (16, 6)


@pytest.mark.parametrize(
    "v,fb,tb,want",
    [
        (1, 1, 8, 255),
        (1, 2, 8, 85),
        (3, 2, 8, 255),
        (15, 4, 8, 255),
        (255, 8, 16, 65535),
        (128, 8, 16, 32896),
        (65535, 16, 8, 255),
        (32896, 16, 8, 128),
        (257, 16, 8, 1),
        (128, 16, 8, 0),  # round(128*255/65535)=round(0.498)=0
        (129, 16, 8, 1),  # round(0.5019)=1
    ],
)
def test_scale_sample(v, fb, tb, want):
    assert scale_sample(v, fb, tb) == want


# --- conversion (reference pixel-ops.ts:496-744) ---------------------------

def test_convert_gray8_to_rgba8():
    raw = np.array([[0, 128, 255]], dtype=np.uint8)
    out = convert_band(raw, 3, 8, 0, 8)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0, 255])
    np.testing.assert_array_equal(out[0, 1], [128, 128, 128, 255])
    np.testing.assert_array_equal(out[0, 2], [255, 255, 255, 255])


def test_convert_gray1_to_rgba8():
    # 1-bit: pixels 1,0,1,1,0,0,1,0 packed MSB-first = 0b10110010.
    raw = np.array([[0b10110010]], dtype=np.uint8)
    out = convert_band(raw, 8, 1, 0, 8)
    np.testing.assert_array_equal(out[0, :, 0], [255, 0, 255, 255, 0, 0, 255, 0])


def test_convert_gray2_gray4():
    raw2 = np.array([[0b00011011]], dtype=np.uint8)  # 0,1,2,3
    out2 = convert_band(raw2, 4, 2, 0, 8)
    np.testing.assert_array_equal(out2[0, :, 0], [0, 85, 170, 255])
    raw4 = np.array([[0x0F, 0x80]], dtype=np.uint8)  # 0,15,8,0
    out4 = convert_band(raw4, 4, 4, 0, 8)
    np.testing.assert_array_equal(out4[0, :, 0], [0, 255, 136, 0])


def test_convert_rgb8_and_rgba16():
    raw = np.array([[10, 20, 30, 40, 50, 60]], dtype=np.uint8)
    out = convert_band(raw, 2, 8, 2, 8)
    np.testing.assert_array_equal(out[0, 0], [10, 20, 30, 255])
    np.testing.assert_array_equal(out[0, 1], [40, 50, 60, 255])
    # 8 -> 16 scale is exactly *257.
    out16 = convert_band(raw, 2, 8, 2, 16)
    assert out16.dtype == np.uint16
    np.testing.assert_array_equal(out16[0, 0], [2570, 5140, 7710, 65535])


def test_convert_16bit_to_8bit():
    # 16-bit RGBA big-endian pair (0x8080 = 32896 -> 128).
    raw = np.array([[0x80, 0x80, 0x00, 0x00, 0xFF, 0xFF, 0x80, 0x80]], dtype=np.uint8)
    out = convert_band(raw, 1, 16, 6, 8)
    np.testing.assert_array_equal(out[0, 0], [128, 0, 255, 128])


def test_convert_gray_alpha():
    raw = np.array([[100, 200]], dtype=np.uint8)
    out = convert_band(raw, 1, 8, 4, 8)
    np.testing.assert_array_equal(out[0, 0], [100, 100, 100, 200])


def test_convert_palette_superset():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    raw = np.array([[0, 1, 2]], dtype=np.uint8)
    out = convert_band(raw, 3, 8, 3, 8, palette=pal, trns=np.array([128], dtype=np.uint8))
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0, 128])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0, 255])
    with pytest.raises(StitchError, match="PLTE"):
        convert_band(raw, 3, 8, 3, 8)


def test_convert_scanline_byte_api_matches_reference_layout():
    # 16-bit output must be big-endian byte pairs (pixel-ops.ts:616-627).
    row = np.array([10, 20, 30], dtype=np.uint8)
    out = convert_scanline(row, 1, 8, 2, 16, 6)
    assert out.tolist() == [0x0A, 0x0A, 0x14, 0x14, 0x1E, 0x1E, 0xFF, 0xFF]


# --- compositing truth tables (reference alpha-blending.test.ts:5-60) ------

def px(r, g, b, a):
    return np.array([[[r, g, b, a]]], dtype=np.uint8)


def test_opaque_copy():
    dest = px(10, 20, 30, 255)
    composite_band(dest, px(200, 100, 50, 255))
    np.testing.assert_array_equal(dest[0, 0], [200, 100, 50, 255])


def test_fully_transparent_noop():
    dest = px(10, 20, 30, 255)
    composite_band(dest, px(200, 100, 50, 0))
    np.testing.assert_array_equal(dest[0, 0], [10, 20, 30, 255])


def test_50_percent_blend_over_opaque():
    # 50% white over opaque black: round values 127-128 (reference truth table).
    dest = px(0, 0, 0, 255)
    composite_band(dest, px(255, 255, 255, 128))
    # alpha_s = 128/255 = 0.50196; out = 255*0.50196/1.0 = 128.00 -> 128
    np.testing.assert_array_equal(dest[0, 0], [128, 128, 128, 255])
    dest = px(0, 0, 0, 255)
    composite_band(dest, px(255, 255, 255, 127))
    np.testing.assert_array_equal(dest[0, 0], [127, 127, 127, 255])


def test_blend_onto_transparent_dest():
    dest = px(0, 0, 0, 0)
    composite_band(dest, px(200, 100, 50, 128))
    # out_a = 0.50196; rgb = (src*as)/out_a = src
    np.testing.assert_array_equal(dest[0, 0], [200, 100, 50, 128])


def test_replace_mode():
    dest = px(10, 20, 30, 255)
    composite_band(dest, px(200, 100, 50, 0), use_alpha_blending=False)
    np.testing.assert_array_equal(dest[0, 0], [200, 100, 50, 0])


def test_16bit_blend_threshold():
    # srcAlpha >= 0.9999 for 16-bit means a >= 65529 (0.9999*65535=65528.45).
    dest = np.array([[[100, 100, 100, 65535]]], dtype=np.uint16)
    src = np.array([[[40000, 0, 0, 65529]]], dtype=np.uint16)
    composite_band(dest, src)
    np.testing.assert_array_equal(dest[0, 0], [40000, 0, 0, 65529])


def test_composite_scanline_byte_api():
    dest = np.zeros(8, dtype=np.uint8)
    dest[0:8] = [10, 20, 30, 255, 1, 2, 3, 255]
    src = np.array([200, 100, 50, 255], dtype=np.uint8)
    composite_scanline(dest, src, 1, 1, 4, True)
    assert dest.tolist() == [10, 20, 30, 255, 200, 100, 50, 255]


def test_composite_band_float64_matches_scalar_js():
    """Randomized check against a direct scalar transcription of the JS code."""
    rng = np.random.default_rng(42)
    n = 500
    dest = rng.integers(0, 256, (1, n, 4), dtype=np.uint8)
    src = rng.integers(0, 256, (1, n, 4), dtype=np.uint8)
    expected = dest.copy()
    for i in range(n):
        s, d = src[0, i], expected[0, i]
        sa = s[3] / 255
        if sa >= 0.9999:
            expected[0, i] = s
        elif sa > 0.0001:
            da = d[3] / 255
            oa = sa + da * (1 - sa)
            if oa > 0.0001:
                for c in range(3):
                    blended = (int(s[c]) * sa + int(d[c]) * da * (1 - sa)) / oa
                    expected[0, i, c] = int(np.floor(min(255.0, max(0.0, blended)) + 0.5))
                expected[0, i, 3] = int(np.floor(oa * 255 + 0.5))
    composite_band(dest, src)
    np.testing.assert_array_equal(dest, expected)


def test_extract_scanline_portion():
    row = np.arange(40, dtype=np.uint8)
    part = extract_scanline_portion(row, 2, 3, 4)
    np.testing.assert_array_equal(part, np.arange(8, 20, dtype=np.uint8))


def test_band_bytes_roundtrip_16bit():
    rng = np.random.default_rng(1)
    band = rng.integers(0, 65536, (3, 5, 4), dtype=np.uint16)
    raw = band_to_bytes(band)
    assert raw.shape == (3, 40)
    np.testing.assert_array_equal(bytes_to_band(raw, 5, 16), band)


def test_background_pixel():
    np.testing.assert_array_equal(background_pixel(8, "white"), [255, 255, 255, 255])
    np.testing.assert_array_equal(
        background_pixel(16, [1, 2, 3, 4]), [257, 514, 771, 1028]
    )


def test_native_rgba_expanders_match_numpy_all_sizes():
    """AVX2 RGB/gray->RGBA expanders (stitchnative.cpp stitch_rgb_to_rgba /
    stitch_gray_to_rgba) are exact vs the numpy expansion across sizes that
    cover the vector main loop, the 10-px overread guard, and the scalar
    tail (reference convertScanline RGB/gray arms, pixel-ops.ts:496-560)."""
    from image_stitch_tpu.native import expand_to_rgba_native, native_available

    if not native_available():
        pytest.skip("native tier disabled")
    rng = np.random.default_rng(7)
    for n in list(range(0, 36)) + [64, 65, 127, 1000, 99991]:
        rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        ref = np.concatenate([rgb, np.full((n, 1), 255, np.uint8)], axis=1)
        assert np.array_equal(expand_to_rgba_native(rgb, 3), ref)
        g = rng.integers(0, 256, n, dtype=np.uint8)
        refg = np.stack([g, g, g, np.full(n, 255, np.uint8)], axis=1)
        assert np.array_equal(expand_to_rgba_native(g, 1), refg)


def test_convert_band_rgb_and_gray_fast_paths_match_generic():
    """The 8-bit color-type 2/0 fast paths (native expanders) agree with
    the generic arm byte-for-byte, including non-tight row slices."""
    rng = np.random.default_rng(8)
    for w, h in [(1, 1), (5, 3), (640, 4)]:
        raw = rng.integers(0, 256, (h, w * 3), dtype=np.uint8)
        out = convert_band(raw, w, 8, 2, 8)
        assert out.shape == (h, w, 4)
        assert np.array_equal(out[:, :, :3].reshape(h, w * 3), raw)
        assert (out[:, :, 3] == 255).all()
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
        outg = convert_band(gray, w, 8, 0, 8)
        for c in range(3):
            assert np.array_equal(outg[:, :, c], gray)
        assert (outg[:, :, 3] == 255).all()


def test_jpeg_pil_tier_native_expand_matches_pil_convert():
    """PIL-tier JPEG decode through the RGB/L native-mode + AVX2 expand
    path is bit-identical to Image.convert('RGBA') for color, grayscale,
    and (via the fallback arm) CMYK files."""
    import io

    from PIL import Image

    from image_stitch_tpu.codecs.jpeg.decoder import decode_jpeg_to_rgba

    rng = np.random.default_rng(9)
    cases = []
    arr = rng.integers(0, 256, (33, 47, 3), np.uint8)
    b = io.BytesIO(); Image.fromarray(arr).save(b, "JPEG", quality=85)
    cases.append(b.getvalue())
    g = rng.integers(0, 256, (33, 47), np.uint8)
    b = io.BytesIO(); Image.fromarray(g, "L").save(b, "JPEG", quality=85)
    cases.append(b.getvalue())
    c4 = rng.integers(0, 256, (20, 20, 4), np.uint8)
    b = io.BytesIO(); Image.fromarray(c4, "CMYK").save(b, "JPEG")
    cases.append(b.getvalue())
    for data in cases:
        out = decode_jpeg_to_rgba(data)
        ref = np.frombuffer(
            Image.open(io.BytesIO(data)).convert("RGBA").tobytes(), np.uint8
        ).reshape(out.shape)
        assert np.array_equal(out, ref)
