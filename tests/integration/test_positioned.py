"""Positioned-mode tests (model: reference tests/integration/
positioned-images.test.ts: overlap, zIndex override, clipping incl. top-edge
scanline-skip correctness :241)."""

import numpy as np
import pytest

from image_stitch_tpu import PositionedImage, concat_to_buffer
from image_stitch_tpu.ops.pixel import composite_band
from tests.utils.fixtures import decode_png_pil, png_from_array, random_rgba


def solid(w, h, rgba):
    return np.tile(np.array(rgba, np.uint8), (h, w, 1))


def render_expected(canvas_size, layers, blend=True, bg=(0, 0, 0, 0)):
    """Oracle rendering: place (arr, x, y) layers back-to-front."""
    w, h = canvas_size
    exp = np.tile(np.array(bg, np.uint8), (h, w, 1))
    for arr, x, y in layers:
        ah, aw = arr.shape[:2]
        sx0, sy0 = max(0, -x), max(0, -y)
        dx0, dy0 = max(0, x), max(0, y)
        dx1, dy1 = min(w, x + aw), min(h, y + ah)
        if dx1 <= dx0 or dy1 <= dy0:
            continue
        sub = arr[sy0 : sy0 + dy1 - dy0, sx0 : sx0 + dx1 - dx0]
        composite_band(exp[dy0:dy1, dx0:dx1], sub, 0, blend)
    return exp


def test_overlap_alpha_blending():
    a = solid(20, 20, (255, 0, 0, 255))
    b = solid(20, 20, (0, 0, 255, 128))
    out = concat_to_buffer(
        {
            "inputs": [
                PositionedImage(x=0, y=0, source=png_from_array(a)),
                PositionedImage(x=10, y=10, source=png_from_array(b)),
            ],
            "layout": {},
        }
    )
    dec = decode_png_pil(out)
    exp = render_expected((30, 30), [(a, 0, 0), (b, 10, 10)])
    np.testing.assert_array_equal(dec, exp)


def test_zindex_override_order():
    a = solid(10, 10, (255, 0, 0, 255))
    b = solid(10, 10, (0, 255, 0, 255))
    # b has lower z than a despite later input position.
    out = concat_to_buffer(
        {
            "inputs": [
                PositionedImage(x=0, y=0, source=png_from_array(a), z_index=5),
                PositionedImage(x=0, y=0, source=png_from_array(b), z_index=1),
            ],
            "layout": {},
        }
    )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec, render_expected((10, 10), [(b, 0, 0), (a, 0, 0)]))


def test_zindex_tie_uses_input_order():
    a = solid(10, 10, (255, 0, 0, 255))
    b = solid(10, 10, (0, 255, 0, 255))
    out = concat_to_buffer(
        {
            "inputs": [
                PositionedImage(x=0, y=0, source=png_from_array(a), z_index=3),
                PositionedImage(x=0, y=0, source=png_from_array(b), z_index=3),
            ],
            "layout": {},
        }
    )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[0, 0], [0, 255, 0, 255])  # b on top


def test_replace_mode_disables_blending():
    a = solid(10, 10, (255, 0, 0, 255))
    b = solid(10, 10, (0, 255, 0, 10))
    out = concat_to_buffer(
        {
            "inputs": [
                PositionedImage(x=0, y=0, source=png_from_array(a)),
                PositionedImage(x=5, y=0, source=png_from_array(b)),
            ],
            "layout": {},
            "enableAlphaBlending": False,
        }
    )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[0, 7], [0, 255, 0, 10])  # replaced, not blended


def test_auto_canvas_size():
    a = random_rgba(15, 10, 1)
    out = concat_to_buffer(
        {
            "inputs": [PositionedImage(x=5, y=7, source=png_from_array(a))],
            "layout": {},
        }
    )
    dec = decode_png_pil(out)
    assert dec.shape == (17, 20, 4)
    np.testing.assert_array_equal(dec[7:, 5:], a)
    assert (dec[:7, :, 3] == 0).all()


def test_explicit_canvas_clips():
    a = random_rgba(20, 20, 2)
    with pytest.warns(UserWarning, match="clipped"):
        out = concat_to_buffer(
            {
                "inputs": [PositionedImage(x=5, y=5, source=png_from_array(a))],
                "layout": {"width": 15, "height": 15},
            }
        )
    dec = decode_png_pil(out)
    assert dec.shape == (15, 15, 4)
    np.testing.assert_array_equal(dec[5:, 5:], a[:10, :10])


def test_negative_coords_top_left_clip():
    # Top clipping exercises the scanline-skip path
    # (reference positioned-images.test.ts:241). Opaque so placement equals
    # raw pixels (random alpha pixels go through "over" and differ).
    a = random_rgba(20, 20, 3)
    a[:, :, 3] = 255
    with pytest.warns(UserWarning, match="clipped"):
        out = concat_to_buffer(
            {
                "inputs": [PositionedImage(x=-5, y=-8, source=png_from_array(a))],
                "layout": {"width": 15, "height": 12},
            }
        )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec[:12, :15], a[8:20, 5:20])


def test_fully_clipped_image_warns_and_skips():
    a = random_rgba(5, 5, 4)
    b = random_rgba(5, 5, 5)
    with pytest.warns(UserWarning, match="completely outside"):
        out = concat_to_buffer(
            {
                "inputs": [
                    PositionedImage(x=0, y=0, source=png_from_array(a)),
                    PositionedImage(x=100, y=100, source=png_from_array(b)),
                ],
                "layout": {"width": 5, "height": 5},
            }
        )
    np.testing.assert_array_equal(decode_png_pil(out), a)


def test_positioned_dict_inputs():
    a = random_rgba(6, 6, 6)
    out = concat_to_buffer(
        {
            "inputs": [{"x": 2, "y": 3, "source": png_from_array(a), "zIndex": 1}],
            "layout": {},
        }
    )
    dec = decode_png_pil(out)
    assert dec.shape == (9, 8, 4)
    np.testing.assert_array_equal(dec[3:, 2:], a)


def test_many_overlapping_sprites_band_boundaries():
    """50 alpha sprites across band boundaries (bench config 3 analog)."""
    rng = np.random.default_rng(0)
    layers = []
    inputs = []
    bg = solid(64, 64, (10, 20, 30, 255))
    inputs.append(PositionedImage(x=0, y=0, source=png_from_array(bg)))
    layers.append((bg, 0, 0))
    for i in range(50):
        w, h = int(rng.integers(4, 16)), int(rng.integers(4, 16))
        spr = np.empty((h, w, 4), np.uint8)
        spr[:] = rng.integers(0, 256, 4)
        x, y = int(rng.integers(0, 56)), int(rng.integers(0, 56))
        inputs.append(PositionedImage(x=x, y=y, source=png_from_array(spr)))
        layers.append((spr, x, y))
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")  # sprites overhanging 64x64 clip
        out = concat_to_buffer(
            {"inputs": inputs, "layout": {"width": 64, "height": 64},
             "band_height": 16}
        )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(dec, render_expected((64, 64), layers))


def test_positioned_16bit():
    a16 = (random_rgba(8, 8, 7).astype(np.uint16)) * 257
    out = concat_to_buffer(
        {
            "inputs": [PositionedImage(x=0, y=0, source=png_from_array(a16, bit_depth=16))],
            "layout": {},
        }
    )
    from image_stitch_tpu import PngDecoder, convert_band, parse_png_header

    assert parse_png_header(out).bit_depth == 16
    dec = PngDecoder(out)
    got = np.vstack([convert_band(b, 8, 16, 6, 16) for b in dec.bands()])
    np.testing.assert_array_equal(got, a16)


def test_positioned_band_height_invariance():
    """Positioned compositing must not depend on band partitioning: tall
    overlapping sprites with clipping, compared across band heights at the
    raw-pixel level."""
    rng = np.random.default_rng(42)
    inputs = []
    for i in range(12):
        h, w = int(rng.integers(10, 60)), int(rng.integers(10, 40))
        spr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        inputs.append(
            PositionedImage(
                x=int(rng.integers(-10, 70)),
                y=int(rng.integers(-10, 100)),
                source=png_from_array(spr),
                z_index=int(rng.integers(0, 5)),
            )
        )
    import warnings as _w

    outs = []
    for bh in (1, 13, 256):
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            out = concat_to_buffer(
                {"inputs": list(inputs), "layout": {"width": 80, "height": 120},
                 "band_height": bh}
            )
        outs.append(decode_png_pil(out))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
