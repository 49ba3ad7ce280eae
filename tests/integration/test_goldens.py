"""Golden-file regression anchors (model: reference expected-outputs
comparison, browser.test.ts:276-510 — anchors, not independent truth;
regenerate with tests/utils/generate_goldens.py after intended changes)."""

import os
import warnings

import pytest

from tests.utils.generate_goldens import GOLDEN_DIR, cases

from image_stitch_tpu import concat_to_buffer


@pytest.mark.parametrize("name_opts", list(cases()), ids=lambda c: c[0])
def test_golden_outputs_stable(name_opts):
    name, opts = name_opts
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    from image_stitch_tpu.native import native_available

    if not native_available():
        # Goldens pin the native tier's (valid) byte streams: the owned
        # deflate emits different (smaller) PNG IDAT bytes than the zlib
        # fallback. (JPEG goldens would match — the exact integer DCT
        # pipeline, ops/jpeg_dct.py, is bit-identical across numpy/C++/XLA
        # tiers — but the PNG half forces a uniform skip.) Pixel
        # equivalence is covered by the oracle suites.
        pytest.skip("goldens pin the native-tier deflate byte streams")
    with open(path, "rb") as f:
        expected = f.read()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = concat_to_buffer(opts)
    assert got == expected, (
        f"{name} changed ({len(got)} vs {len(expected)} bytes). If intended, "
        f"regenerate with tests/utils/generate_goldens.py"
    )
