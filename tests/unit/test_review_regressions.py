"""Regression tests for round-3 review findings (code-review pass):

- reentrant progress callbacks must not self-deadlock (the ordered-delivery
  lock is non-reentrant),
- encode_band must keep accepting array-likes (nested lists) when no
  device pipeline is active,
- path inputs must stay out of the identity-keyed input cache (the
  small-file slurp makes fresh bytes objects per call — caching them
  retains every call's decode with zero dedup).
"""

import io

import numpy as np
import pytest
from PIL import Image

from image_stitch_tpu.core import ProgressTracker
from image_stitch_tpu.types import PngHeader


def _hdr(h):
    return PngHeader(width=4, height=h, bit_depth=8, color_type=6)


def test_progress_callback_may_reenter_tracker():
    """A callback that drives the tracker again (the deadlock scenario:
    callback pulls more rows -> consumed -> _deliver) must complete."""
    events = []
    tracker = None

    def cb(done, total):
        events.append((done, total))
        # Reentrant drive: finish input 1 from inside input 0's callback.
        if done == 1:
            tracker.consumed(1, 2)

    tracker = ProgressTracker([_hdr(2), _hdr(2)], cb)
    tracker.consumed(0, 2)  # completes input 0 -> cb -> completes input 1
    assert events == [(1, 2), (2, 2)]


def test_encode_band_accepts_nested_lists():
    from image_stitch_tpu.codecs.jpeg.encoder import StreamingJpegEncoder

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    enc = StreamingJpegEncoder(16, 16, 85)
    ref = b"".join(enc.encode_band(arr)) + b"".join(enc.finish())

    enc2 = StreamingJpegEncoder(16, 16, 85)
    got = b"".join(enc2.encode_band(arr.tolist())) + b"".join(enc2.finish())
    assert got == ref


def test_path_inputs_stay_out_of_input_cache(tmp_path):
    from image_stitch_tpu.codecs import input_cache
    from image_stitch_tpu.codecs.factory import create_decoder

    img = tmp_path / "tile.png"
    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(buf, "PNG")
    img.write_bytes(buf.getvalue())

    input_cache.enable_input_cache()
    try:
        before = len(input_cache._entries)
        for _ in range(5):
            d = create_decoder(str(img))
            d.get_header()
            list(d.bands(8)) if hasattr(d, "bands") else None
        # Paths are slurped into FRESH bytes per call; identity caching
        # them would add one permanently-retained entry per call.
        assert len(input_cache._entries) == before
    finally:
        input_cache.disable_input_cache()


def test_buffer_inputs_still_cache(tmp_path):
    from image_stitch_tpu.codecs import input_cache
    from image_stitch_tpu.codecs.factory import create_decoder

    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(buf, "PNG")
    data = buf.getvalue()

    input_cache.enable_input_cache()
    try:
        d1 = create_decoder(data)
        d2 = create_decoder(data)
        assert type(d1).__name__ == "CachedDecoder"
        assert type(d2).__name__ == "CachedDecoder"
        assert len(input_cache._entries) == 1
    finally:
        input_cache.disable_input_cache()


def _png_bytes(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def test_stream_bands_matches_encoded_output_grid():
    from PIL import Image

    rng = np.random.default_rng(17)
    tiles = [rng.integers(0, 256, (16, 16, 4), dtype=np.uint8) for _ in range(4)]
    from image_stitch_tpu import concat_arrays, concat_to_buffer

    arr = concat_arrays(tiles, layout={"columns": 2})
    png = concat_to_buffer({"inputs": tiles, "layout": {"columns": 2}})
    ref = np.array(Image.open(io.BytesIO(png)))
    assert arr.shape == (32, 32, 4)
    assert np.array_equal(arr, ref)


def test_stream_bands_matches_encoded_output_positioned():
    from PIL import Image

    from image_stitch_tpu import PositionedImage
    from image_stitch_tpu.core import CoreStreamingConcatenator

    rng = np.random.default_rng(19)
    bg = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
    bg[:, :, 3] = 255
    sprite = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    inputs = [
        PositionedImage(x=0, y=0, source=_png_bytes(bg)),
        PositionedImage(x=5, y=7, source=_png_bytes(sprite), z_index=2),
    ]
    opts = {"inputs": inputs, "layout": {}}
    bands = list(CoreStreamingConcatenator(opts).stream_bands())
    arr = np.vstack(bands)

    png = b"".join(CoreStreamingConcatenator(opts).stream())
    ref = np.array(Image.open(io.BytesIO(png)))
    assert np.array_equal(arr, ref)


def test_stream_bands_16bit_depth():
    import zlib

    from image_stitch_tpu import PngHeader, build_png
    from image_stitch_tpu.core import CoreStreamingConcatenator

    rng = np.random.default_rng(23)
    a16 = rng.integers(0, 65536, (8, 8, 4), dtype=np.uint16)
    raw = np.concatenate(
        [
            np.zeros((8, 1), np.uint8),
            a16.astype(">u2").reshape(8, -1).view(np.uint8),
        ],
        axis=1,
    )
    png = build_png(
        PngHeader(width=8, height=8, bit_depth=16, color_type=6),
        zlib.compress(raw.tobytes()),
    )
    opts = {"inputs": [png] * 2, "layout": {"columns": 2}}
    arr = np.vstack(list(CoreStreamingConcatenator(opts).stream_bands()))
    assert arr.dtype == np.uint16 and arr.shape == (8, 16, 4)
    assert np.array_equal(arr[:, :8], a16)
