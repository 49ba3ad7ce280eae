"""Owned C++ deflate (stitchnative.cpp owned_deflate_batch) vs the zlib
oracle: every stream must inflate back bit-exactly via zlib.decompress (and
the owned inflater), across content classes, levels, push cadences and
sync-flush boundaries. Replaces runtime zlib on the PNG encode path
(reference: src/streaming-deflate.ts:41-242)."""

import zlib

import numpy as np
import pytest

from image_stitch_tpu.io.deflate import StreamingDeflator

pytestmark = pytest.mark.skipif(
    not __import__(
        "image_stitch_tpu.native", fromlist=["native_deflater_available"]
    ).native_deflater_available(),
    reason="native tier unavailable",
)


def _payloads():
    rng = np.random.default_rng(11)
    yield "empty", b""
    yield "single", b"A"
    yield "text", b"the quick brown fox jumps over the lazy dog. " * 997
    yield "random", rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
    yield "lowent", rng.integers(0, 4, 150000, dtype=np.uint8).tobytes()
    yield "periodic", rng.integers(0, 256, 37, dtype=np.uint8).tobytes() * 4001
    yield "zeros", bytes(200000)
    # filtered-PNG-like: interleaved small deltas + one noisy channel
    arr = np.zeros((100, 4096), dtype=np.uint8)
    arr[:, 2::4] = rng.integers(0, 64, (100, 1024), dtype=np.uint8)
    yield "pnglike", arr.tobytes()


def _compress(raw, level=6, batch=1 << 20):
    chunks = []
    d = StreamingDeflator(level=level, max_batch_size=batch, on_data=chunks.append)
    assert d._native is not None, "owned tier not selected"
    d.push(raw)
    d.finish()
    return b"".join(chunks)


@pytest.mark.parametrize("name_raw", list(_payloads()), ids=lambda c: c[0])
def test_roundtrip_zlib_oracle(name_raw):
    name, raw = name_raw
    comp = _compress(raw)
    assert zlib.decompress(comp) == raw


@pytest.mark.parametrize("level", [1, 2, 4, 6, 9])
def test_levels_roundtrip_and_monotone_effort(level):
    rng = np.random.default_rng(3)
    arr = np.zeros((64, 4096), dtype=np.uint8)
    arr[:, 2::4] = rng.integers(0, 64, (64, 1024), dtype=np.uint8)
    raw = arr.tobytes()
    comp = _compress(raw, level=level)
    assert zlib.decompress(comp) == raw


def test_ratio_competitive_with_zlib6():
    rng = np.random.default_rng(5)
    arr = np.zeros((128, 4096), dtype=np.uint8)
    arr[:, 2::4] = rng.integers(0, 64, (128, 1024), dtype=np.uint8)
    arr[:, 1::4] = (np.arange(128) % 7).astype(np.uint8)[:, None]
    raw = arr.tobytes()
    owned = _compress(raw, level=6)
    ref = zlib.compress(raw, 6)
    # large dynamic blocks should land at or below zlib-6 +5%
    assert len(owned) <= len(ref) * 1.05, (len(owned), len(ref))


def test_streaming_sync_flush_boundaries():
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 8, 600000, dtype=np.uint8).tobytes()
    chunks = []
    d = StreamingDeflator(level=6, max_batch_size=100000, on_data=chunks.append)
    pos = 0
    while pos < len(raw):
        step = int(rng.integers(1, 50000))
        d.push(raw[pos:pos + step])
        pos += step
    d.flush()
    d.flush()  # empty-batch sync flush must be harmless
    d.finish()
    comp = b"".join(chunks)
    assert zlib.decompress(comp) == raw
    # every sync boundary is byte-aligned with the empty stored marker
    assert comp.count(b"\x00\x00\xff\xff") >= 1


def test_matches_reach_across_sync_flush_window():
    # Second batch repeats the first: matches must reference the carried
    # window, compressing the repeat to far below its literal size.
    rng = np.random.default_rng(9)
    block = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    chunks = []
    d = StreamingDeflator(level=6, on_data=chunks.append)
    d.push(block)
    d.flush()
    d.push(block)
    d.finish()
    comp = b"".join(chunks)
    assert zlib.decompress(comp) == block + block
    assert len(comp) < len(block) * 1.5  # repeat cost ~0, not ~20000


def test_incompressible_bounded_overhead():
    rng = np.random.default_rng(13)
    raw = rng.integers(0, 256, 300000, dtype=np.uint8).tobytes()
    comp = _compress(raw)
    # stored-fallback bound: 5 bytes per 64KB part + header/trailer slack
    assert len(comp) <= len(raw) + 5 * (len(raw) // 65535 + 1) + 64
    assert zlib.decompress(comp) == raw


def test_owned_inflate_reads_owned_deflate():
    from image_stitch_tpu.io.inflate import StreamingInflator

    rng = np.random.default_rng(15)
    raw = rng.integers(0, 16, 250000, dtype=np.uint8).tobytes()
    comp = _compress(raw, batch=60000)
    inf = StreamingInflator()
    out = inf.push(comp) + inf.finish()
    assert out == raw


def test_adler32_trailer_verified_by_strict_zlib():
    raw = b"adler payload " * 1000
    comp = bytearray(_compress(raw))
    comp[-1] ^= 0xFF
    with pytest.raises(zlib.error):
        zlib.decompress(bytes(comp))


def test_deterministic():
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 32, 100000, dtype=np.uint8).tobytes()
    assert _compress(raw) == _compress(raw)


def test_strategies_and_level0_stay_on_zlib():
    for kwargs in ({"strategy": "rle"}, {"strategy": "huffman"}, {"level": 0}):
        d = StreamingDeflator(**kwargs)
        assert d._native is None, kwargs


def test_png_output_decodes_with_pil():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from image_stitch_tpu import concat_to_buffer
    from tests.utils.fixtures import png_from_array, random_rgba

    tiles = [png_from_array(random_rgba(40, 40, s)) for s in range(4)]
    out = concat_to_buffer({"inputs": tiles, "layout": {"columns": 2}})
    img = PIL.open(io.BytesIO(out))
    arr = np.asarray(img)
    assert arr.shape == (80, 80, 4)
    # PIL (strict zlib) decodes it and the pixel content matches the inputs
    from PIL import Image as _I

    top_left = np.asarray(_I.open(io.BytesIO(tiles[0])))
    assert (arr[:40, :40] == top_left).all()


def test_deep_tree_length_limit_valid():
    """Regression: frequency distributions whose natural Huffman tree is
    deeper than 15 bits over-subscribed the emitted code (zlib's overflow
    adjustment must count INTERNAL nodes beyond the limit too, not just
    leaves) — zlib rejected the stream with 'invalid literal/lengths set'.
    Exponentially skewed symbol frequencies force the deep-tree path."""
    rng = np.random.default_rng(9)
    # ~exponential frequency decay across many symbols -> tree depth >> 15
    from image_stitch_tpu.native import NativeDeflator

    counts = np.maximum(1, (2.0 ** (np.arange(80) / 3.0))).astype(np.int64)[::-1]
    syms = np.repeat(np.arange(80, dtype=np.uint8) * 3 + 7, counts)
    rng.shuffle(syms)
    raw = syms.tobytes()
    for level in (1, 6, 9):
        d = NativeDeflator(level)
        d.compress(raw)
        out = d.finish()
        assert zlib.decompress(out) == raw


def test_noise_tile_band_stream_valid():
    """Regression: the exact content class that hit the over-subscription in
    production — filtered bands of banded 6-bit noise — through the
    multi-batch sync-flush cadence."""
    from image_stitch_tpu.native import NativeDeflator

    rng = np.random.default_rng(9)
    raw = (rng.integers(0, 64, 4 << 20) + 96).astype(np.uint8).tobytes()
    d = NativeDeflator(6)
    out = bytearray()
    for i in range(0, len(raw), 1 << 20):
        d.compress(raw[i : i + (1 << 20)])
        out += d.flush_sync()
    out += d.finish()
    assert zlib.decompress(bytes(out)) == raw


def test_compress_streaming_generator_wrapper():
    """compress_streaming (reference streaming-deflate.ts:244-267 parity):
    incremental chunks in, valid zlib stream out, equal to one-shot."""
    import numpy as np

    from image_stitch_tpu.io.deflate import compress_streaming

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 128, 3 << 20, dtype=np.uint8).tobytes()
    chunks = [raw[i : i + 123_457] for i in range(0, len(raw), 123_457)]
    out = b"".join(compress_streaming(iter(chunks)))
    assert zlib.decompress(out) == raw


def test_chunked_compress_identical_to_one_shot():
    """The deflator's pending-input chunk list must assemble to the same
    stream regardless of how the caller splits compress() calls — random
    split points including empty and 1-byte chunks (guards the pooled
    single-assembly rework)."""
    import zlib

    import numpy as np

    from image_stitch_tpu.native import NativeDeflator, native_available

    if not native_available():
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(77)
    base = bytes(rng.integers(0, 256, 50_000, dtype=np.uint8))
    payload = base[:20_000] + base[:20_000] + base[20_000:]
    one = NativeDeflator(6)
    one.compress(payload)
    ref = b"".join(one.flush_sync_parts()) + b"".join(one.finish_parts())
    for trial in range(6):
        d = NativeDeflator(6)
        pos = 0
        while pos < len(payload):
            step = int(rng.integers(0, 4097))
            d.compress(payload[pos : pos + step])
            d.compress(b"")  # empty chunks must be no-ops
            pos += step
        got = b"".join(d.flush_sync_parts()) + b"".join(d.finish_parts())
        assert got == ref, trial
    assert zlib.decompress(ref) == payload
