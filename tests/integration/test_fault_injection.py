"""Defensive-validation tests (model: reference truncated/invalid input
tests, image-concat.test.ts:133-178, heic-decoder.test.ts:125, and the
decoder's residual/scanline-count checks, png-decoder.ts:218-228)."""

import zlib

import numpy as np
import pytest

from image_stitch_tpu import (
    PngDecoder,
    PngHeader,
    StitchError,
    build_png,
    concat_to_buffer,
)
from tests.utils.fixtures import png_from_array, random_rgba


def test_truncated_png_body():
    good = png_from_array(random_rgba(16, 16, 0))
    truncated = good[: len(good) // 2]
    with pytest.raises(StitchError):
        concat_to_buffer({"inputs": [truncated], "layout": {"columns": 1}})


def test_corrupt_idat_zlib():
    header = PngHeader(width=4, height=4, bit_depth=8, color_type=6)
    bad = build_png(header, b"definitely not zlib data")
    with pytest.raises(StitchError):
        concat_to_buffer({"inputs": [bad], "layout": {"columns": 1}})


def test_extra_scanlines_rejected():
    # More rows in IDAT than the header claims -> residual-data check
    # (reference: png-decoder.ts:222-228).
    header = PngHeader(width=4, height=2, bit_depth=8, color_type=6)
    raw = b"".join(b"\x00" + bytes(16) for _ in range(5))  # 5 rows, header says 2
    bad = build_png(header, zlib.compress(raw))
    dec = PngDecoder(bad)
    with pytest.raises(StitchError, match="residual"):
        list(dec.bands(64))


def test_scanlines_consumed_once():
    # Assert-once semantics on stream state (SURVEY §5 race-detection analog).
    png = png_from_array(random_rgba(4, 4, 1))
    dec = PngDecoder(png)
    list(dec.bands(4))
    with pytest.raises(StitchError, match="already consumed"):
        list(dec.bands(4))


def test_truncated_jpeg_header():
    with pytest.raises(StitchError, match="SOF|SOI|Truncated"):
        from image_stitch_tpu import parse_jpeg_header

        parse_jpeg_header(b"\xff\xd8\xff\xe0\x00\x10JFIF")


def test_error_message_names_input_position():
    good = png_from_array(random_rgba(8, 8, 2))
    truncated = good[:-30]
    with pytest.raises(StitchError, match="input #2"):
        concat_to_buffer({"inputs": [good, truncated], "layout": {"columns": 2}})


def test_zero_byte_input():
    with pytest.raises(StitchError):
        concat_to_buffer({"inputs": [b""], "layout": {"columns": 1}})


def test_decoders_closed_after_stream_error():
    closed = []

    class Failing:
        def get_header(self):
            from image_stitch_tpu import ImageHeader

            return ImageHeader(width=4, height=4, channels=4, bit_depth=8, format="png")

        def bands(self, band_height=None):
            raise StitchError("decode exploded")
            yield  # pragma: no cover

        def scanlines(self):
            return iter(())

        def close(self):
            closed.append(True)

    with pytest.raises(StitchError):
        concat_to_buffer({"inputs": [Failing()], "layout": {"columns": 1}})
    assert closed == [True]
