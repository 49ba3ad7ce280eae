"""PNG filter unit tests (model: reference tests/unit/png-filter.test.ts)."""

import numpy as np
import pytest

from image_stitch_tpu.ops.png_filter import (
    FilterType,
    filter_scanline,
    filter_select_band,
    paeth_predictor,
    unfilter_band,
    unfilter_scanline,
)


def ref_paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def ref_unfilter(ftype, scan, prev, bpp):
    """Direct transcription of the PNG spec recurrence (scalar oracle)."""
    out = np.zeros(len(scan), dtype=np.int32)
    prev = prev if prev is not None else np.zeros(len(scan), dtype=np.int32)
    for i in range(len(scan)):
        left = out[i - bpp] if i >= bpp else 0
        up = int(prev[i])
        upleft = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            v = scan[i]
        elif ftype == 1:
            v = scan[i] + left
        elif ftype == 2:
            v = scan[i] + up
        elif ftype == 3:
            v = scan[i] + (left + up) // 2
        else:
            v = scan[i] + ref_paeth(left, up, upleft)
        out[i] = v & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("bpp", [1, 3, 4, 8])
def test_unfilter_matches_spec_oracle(ftype, bpp):
    rng = np.random.default_rng(ftype * 10 + bpp)
    scan = rng.integers(0, 256, 40, dtype=np.uint8)
    prev = rng.integers(0, 256, 40, dtype=np.uint8)
    got = unfilter_scanline(ftype, scan, prev, bpp)
    want = ref_unfilter(ftype, scan.astype(int), prev.astype(int), bpp)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_unfilter_no_previous_line(ftype):
    rng = np.random.default_rng(ftype)
    scan = rng.integers(0, 256, 24, dtype=np.uint8)
    got = unfilter_scanline(ftype, scan, None, 4)
    want = ref_unfilter(ftype, scan.astype(int), None, 4)
    np.testing.assert_array_equal(got, want)


def test_filter_unfilter_roundtrip():
    rng = np.random.default_rng(7)
    bpp = 4
    rows = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    prev = None
    for y in range(16):
        ftype, filtered = filter_scanline(rows[y], prev, bpp)
        recovered = unfilter_scanline(ftype, filtered, prev, bpp)
        np.testing.assert_array_equal(recovered, rows[y])
        prev = rows[y]


def test_filter_select_band_matches_rowwise():
    rng = np.random.default_rng(3)
    bpp = 3
    rows = rng.integers(0, 256, (12, 30), dtype=np.uint8)
    types, filtered = filter_select_band(rows, None, bpp)
    prev = None
    for y in range(12):
        t, f = filter_scanline(rows[y], prev, bpp)
        assert types[y] == t
        np.testing.assert_array_equal(filtered[y], f)
        prev = rows[y]


def test_filter_choice_tie_goes_to_earlier():
    # All-zero rows: every filter yields zeros, sum 0 -> must pick None (0).
    rows = np.zeros((3, 12), dtype=np.uint8)
    types, _ = filter_select_band(rows, None, 4)
    assert list(types) == [0, 0, 0]


def test_unfilter_band_carry_between_bands():
    rng = np.random.default_rng(11)
    bpp = 4
    raw = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    types, filtered = filter_select_band(raw, None, bpp)
    # Unfilter in two bands with a carry row; must reproduce raw exactly.
    top = unfilter_band(types[:9], filtered[:9], None, bpp)
    bottom = unfilter_band(types[9:], filtered[9:], top[-1], bpp)
    np.testing.assert_array_equal(np.vstack([top, bottom]), raw)


def test_paeth_predictor_vectorized():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, 100, dtype=np.uint8)
    b = rng.integers(0, 256, 100, dtype=np.uint8)
    c = rng.integers(0, 256, 100, dtype=np.uint8)
    got = paeth_predictor(a, b, c)
    want = [ref_paeth(int(x), int(y), int(z)) for x, y, z in zip(a, b, c)]
    np.testing.assert_array_equal(got, want)


def test_unknown_filter_type_raises():
    with pytest.raises(Exception, match="Unknown filter type"):
        unfilter_scanline(9, np.zeros(4, dtype=np.uint8), None, 1)
