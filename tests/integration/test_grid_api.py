"""Grid-mode end-to-end tests (model: reference image-concat.test.ts,
mixed-formats.test.ts, background-color.test.ts). PIL is the independent
output decoder (reference uses pngjs, mixed-formats.test.ts:12)."""

import io

import numpy as np
import pytest

from image_stitch_tpu import (
    PositionedImage,
    StitchError,
    concat,
    concat_arrays,
    concat_streaming,
    concat_to_buffer,
    concat_to_file,
    concat_to_stream,
)
from tests.utils.fixtures import decode_png_pil, png_from_array, random_rgba


def test_columns_row_major():
    tiles = [random_rgba(8, 8, s) for s in range(4)]
    out = concat_to_buffer(
        {"inputs": [png_from_array(t) for t in tiles], "layout": {"columns": 2}}
    )
    dec = decode_png_pil(out)
    exp = np.vstack(
        [np.hstack([tiles[0], tiles[1]]), np.hstack([tiles[2], tiles[3]])]
    )
    np.testing.assert_array_equal(dec, exp)


def test_rows_column_major():
    # 'rows' fills column-major: idx = col*rows + row (image-concat-core.ts:156-164).
    tiles = [random_rgba(8, 8, s) for s in range(4)]
    out = concat_to_buffer(
        {"inputs": [png_from_array(t) for t in tiles], "layout": {"rows": 2}}
    )
    dec = decode_png_pil(out)
    exp = np.vstack(
        [np.hstack([tiles[0], tiles[2]]), np.hstack([tiles[1], tiles[3]])]
    )
    np.testing.assert_array_equal(dec, exp)


def test_width_based_wrapping():
    tiles = [random_rgba(10, 6, s) for s in range(5)]
    out = concat_to_buffer(
        {"inputs": [png_from_array(t) for t in tiles], "layout": {"width": 25}}
    )
    dec = decode_png_pil(out)
    # 25px limit fits 2 tiles of 10 per row -> 3 rows (2+2+1), width 20.
    assert dec.shape == (18, 20, 4)
    np.testing.assert_array_equal(dec[:6, :10], tiles[0])
    np.testing.assert_array_equal(dec[6:12, 10:20], tiles[3])
    np.testing.assert_array_equal(dec[12:18, :10], tiles[4])
    assert (dec[12:18, 10:, 3] == 0).all()  # transparent padding


def test_height_limit_drops_overflow():
    tiles = [random_rgba(10, 10, s) for s in range(5)]
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(t) for t in tiles],
            "layout": {"width": 10, "height": 25},
        }
    )
    dec = decode_png_pil(out)
    # Each row is one 10x10 tile; third row would exceed 25 -> only 2 rows.
    assert dec.shape == (20, 10, 4)


def test_variable_sizes_pad_transparent():
    a = random_rgba(10, 20, 1)
    b = random_rgba(30, 8, 2)
    out = concat_to_buffer(
        {"inputs": [png_from_array(a), png_from_array(b)], "layout": {"columns": 2}}
    )
    dec = decode_png_pil(out)
    assert dec.shape == (20, 40, 4)
    np.testing.assert_array_equal(dec[:20, :10], a)
    np.testing.assert_array_equal(dec[:8, 10:40], b)
    assert (dec[8:, 10:, 3] == 0).all()


def test_background_color_fills_padding():
    a = random_rgba(10, 10, 3)
    b = random_rgba(10, 4, 4)
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(a), png_from_array(b)],
            "layout": {"columns": 2},
            "backgroundColor": "red",
        }
    )
    dec = decode_png_pil(out)
    np.testing.assert_array_equal(
        dec[4:, 10:], np.tile(np.array([255, 0, 0, 255], np.uint8), (6, 10, 1))
    )


def test_16bit_input_upgrades_output():
    a16 = (random_rgba(6, 6, 5).astype(np.uint16)) * 257
    a8 = random_rgba(6, 6, 6)
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(a16, bit_depth=16), png_from_array(a8)],
            "layout": {"columns": 2},
        }
    )
    from image_stitch_tpu import parse_png_header

    header = parse_png_header(out)
    assert header.bit_depth == 16
    assert header.color_type == 6
    # PIL 16-bit RGBA decode is unreliable; verify via our own decoder.
    from image_stitch_tpu import PngDecoder, convert_band

    dec = PngDecoder(out)
    h = dec.png_header
    got = np.vstack([convert_band(b, h.width, 16, 6, 16) for b in dec.bands()])
    np.testing.assert_array_equal(got[:, :6], a16)
    np.testing.assert_array_equal(got[:, 6:], a8.astype(np.uint16) * 257)


def test_single_image_row_layout():
    a = random_rgba(5, 5, 7)
    out = concat_to_buffer({"inputs": [png_from_array(a)], "layout": {"columns": 1}})
    np.testing.assert_array_equal(decode_png_pil(out), a)


def test_progress_callback():
    calls = []
    tiles = [png_from_array(random_rgba(4, 4, s)) for s in range(3)]
    concat_to_buffer(
        {
            "inputs": tiles,
            "layout": {"columns": 3},
            "onProgress": lambda done, total: calls.append((done, total)),
        }
    )
    assert calls == [(1, 3), (2, 3), (3, 3)]


def test_empty_inputs_raises():
    with pytest.raises(StitchError, match="At least one input"):
        concat_to_buffer({"inputs": [], "layout": {"columns": 1}})


def test_grid_requires_layout():
    with pytest.raises(StitchError, match="requires layout"):
        concat_to_buffer({"inputs": [png_from_array(random_rgba(2, 2))], "layout": {}})


def test_invalid_input_rejected():
    with pytest.raises(StitchError, match="[Uu]nsupported|[Uu]nrecognized"):
        concat_to_buffer({"inputs": [b"not an image"], "layout": {"columns": 1}})


def test_dimension_mismatch_diagnostics():
    # A PNG that claims 10 rows but carries 5 (reference error style,
    # image-concat-core.ts:429-447).
    import zlib

    from image_stitch_tpu import PngHeader, build_png

    raw = b"".join(b"\x00" + bytes(4 * 4) for _ in range(5))
    bad = build_png(PngHeader(width=4, height=10, bit_depth=8, color_type=6),
                    zlib.compress(raw))
    with pytest.raises(StitchError, match="input #1.*row 1, column 1"):
        concat_to_buffer({"inputs": [bad], "layout": {"columns": 1}})


def test_concat_streaming_yields_chunks():
    tiles = [png_from_array(random_rgba(16, 16, s)) for s in range(2)]
    chunks = list(concat_streaming({"inputs": tiles, "layout": {"columns": 2}}))
    assert len(chunks) >= 4  # signature, IHDR, IDAT(s), IEND
    data = b"".join(chunks)
    assert decode_png_pil(data).shape == (16, 32, 4)


def test_concat_to_stream_and_file(tmp_path):
    tiles = [png_from_array(random_rgba(8, 8, s)) for s in range(2)]
    stream = concat_to_stream({"inputs": tiles, "layout": {"columns": 2}})
    buf = io.BytesIO()
    stream.to_stream(buf)
    path = tmp_path / "out.png"
    concat_to_file({"inputs": tiles, "layout": {"columns": 2}}, path)
    assert buf.getvalue() == path.read_bytes()
    assert decode_png_pil(buf.getvalue()).shape == (8, 16, 4)


def test_deprecated_concat_warns():
    tiles = [png_from_array(random_rgba(4, 4))]
    with pytest.warns(DeprecationWarning):
        out = concat({"inputs": tiles, "layout": {"columns": 1}})
    assert out[:8] == b"\x89PNG\r\n\x1a\n"


def test_concat_arrays_convenience():
    a = random_rgba(6, 6, 8)
    b = random_rgba(6, 6, 9)
    out = concat_arrays([a, b], layout={"columns": 2})
    np.testing.assert_array_equal(out, np.hstack([a, b]))


def test_file_path_inputs(tmp_path):
    a = random_rgba(5, 5, 10)
    p = tmp_path / "a.png"
    p.write_bytes(png_from_array(a))
    out = concat_to_buffer({"inputs": [str(p), p], "layout": {"columns": 2}})
    np.testing.assert_array_equal(decode_png_pil(out), np.hstack([a, a]))


def test_generator_inputs():
    tiles = [png_from_array(random_rgba(4, 4, s)) for s in range(3)]
    out = concat_to_buffer({"inputs": (t for t in tiles), "layout": {"columns": 3}})
    assert decode_png_pil(out).shape == (4, 12, 4)


def test_mixed_grid_and_positioned_rejected():
    a = png_from_array(random_rgba(4, 4))
    with pytest.raises(StitchError, match="mix"):
        concat_to_buffer(
            {
                "inputs": [a, PositionedImage(x=0, y=0, source=a)],
                "layout": {"columns": 2},
            }
        )


def test_filelike_inputs():
    """Blob-analog: file-like objects stream through the factory
    (reference: Blob inputs, decoder-factory.ts:181-193, node-blob tests)."""
    a = random_rgba(6, 6, 20)
    out = concat_to_buffer(
        {"inputs": [io.BytesIO(png_from_array(a))], "layout": {"columns": 1}}
    )
    np.testing.assert_array_equal(decode_png_pil(out), a)


def test_band_height_invariance():
    """The filtered raw stream must not depend on the band height (pure
    streaming). IDAT chunk boundaries may differ (zlib emits output at
    different push calls), so compare the decompressed stream."""
    import zlib

    from image_stitch_tpu import iter_chunks

    tiles = [png_from_array(random_rgba(50, 37, s)) for s in range(3)]
    streams = []
    for bh in (1, 7, 64, 1024):
        out = concat_to_buffer(
            {"inputs": tiles, "layout": {"columns": 2}, "band_height": bh}
        )
        streams.append(
            zlib.decompress(
                b"".join(c.data for c in iter_chunks(out) if c.type == "IDAT")
            )
        )
    assert all(s == streams[0] for s in streams[1:])


def test_jpeg_band_height_invariance():
    tiles = [png_from_array(random_rgba(24, 24, s)) for s in range(2)]
    outs = [
        concat_to_buffer(
            {"inputs": tiles, "layout": {"columns": 2}, "outputFormat": "jpeg",
             "band_height": bh, "backend": "numpy"}
        )
        for bh in (8, 16, 64)
    ]
    assert all(o == outs[0] for o in outs[1:])


def test_columns_with_height_limit():
    """columns + height goes through the pixel-based planner with
    fixedColumns (reference: calculateLayout branch order,
    image-concat-core.ts:146-175)."""
    tiles = [random_rgba(10, 10, s) for s in range(6)]
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(t) for t in tiles],
            "layout": {"columns": 2, "height": 25},
        }
    )
    dec = decode_png_pil(out)
    # 2 per row; third row would exceed 25px -> 2 rows kept.
    assert dec.shape == (20, 20, 4)
    np.testing.assert_array_equal(dec[10:20, 10:20], tiles[3])


def test_rows_with_width_limit():
    """rows + width also routes through the pixel-based planner
    (width takes precedence over the column-major rows fill)."""
    tiles = [random_rgba(10, 10, s) for s in range(5)]
    out = concat_to_buffer(
        {
            "inputs": [png_from_array(t) for t in tiles],
            "layout": {"rows": 2, "width": 30},
        }
    )
    dec = decode_png_pil(out)
    # Width-based wrap: 3 per row -> rows of 3 and 2.
    assert dec.shape == (20, 30, 4)
    np.testing.assert_array_equal(dec[0:10, 20:30], tiles[2])
    np.testing.assert_array_equal(dec[10:20, 0:10], tiles[3])


def test_raw_array_inputs():
    """(H, W, 3|4) numpy arrays are first-class inputs — the canvas-input
    analog (image-concat-browser.ts:287-323) — with no encode round-trip."""
    import io

    from PIL import Image

    rgba = np.full((20, 30, 4), (1, 2, 3, 255), np.uint8)
    rgb = np.full((20, 30, 3), (9, 8, 7), np.uint8)
    out = concat_to_buffer({"inputs": [rgba, rgb], "layout": {"columns": 2}})
    r = np.array(Image.open(io.BytesIO(out)).convert("RGBA"))
    np.testing.assert_array_equal(r[:, :30], rgba)
    assert (r[:, 30:, :3] == (9, 8, 7)).all() and (r[:, 30:, 3] == 255).all()


def test_raw_array_positioned_and_16bit():
    import io

    from PIL import Image

    from image_stitch_tpu import PositionedImage, parse_png_header

    bg = np.full((40, 40, 4), (10, 10, 10, 255), np.uint8)
    sprite = np.zeros((10, 10, 4), np.uint8)
    sprite[:] = (200, 0, 0, 128)
    out = concat_to_buffer(
        {"inputs": [PositionedImage(x=0, y=0, source=bg),
                    PositionedImage(x=5, y=5, source=sprite, z_index=1)],
         "layout": {}}
    )
    r = np.array(Image.open(io.BytesIO(out)).convert("RGBA"))
    assert r.shape == (40, 40, 4)
    assert (r[7, 7][:3] > r[0, 0][:3]).any()  # blended sprite visible

    arr16 = np.full((8, 8, 4), 40000, np.uint16)
    out16 = concat_to_buffer({"inputs": [arr16], "layout": {"columns": 1}})
    assert parse_png_header(out16).bit_depth == 16


def test_raw_array_invalid_shape_rejected():
    with pytest.raises(StitchError, match="[Aa]rray|format"):
        concat_to_buffer({"inputs": [np.zeros((4, 4, 2), np.uint8)],
                          "layout": {"columns": 1}})
