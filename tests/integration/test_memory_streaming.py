"""Memory/streaming proof (model: reference tests/integration/memory.test.ts):
the pipeline must hold O(canvas_width * band_height) pixels regardless of
canvas height, with inputs generated lazily and output streamed to disk so
only the pipeline is measured (memory.test.ts:83-120)."""

import os
import zlib

import numpy as np
import pytest

from image_stitch_tpu import (
    ImageSource,
    PngHeader,
    build_png,
    concat_streaming,
    disable_input_cache,
    enable_input_cache,
)
from image_stitch_tpu.ops.png_filter import filter_select_band
from tests.utils.memory_monitor import (
    assert_memory_below,
    assert_streaming_efficiency,
    monitor_memory,
)


def tile_png(size: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (size, size * 4), dtype=np.uint8)
    types, filtered = filter_select_band(arr, None, 4)
    payload = np.empty((size, 1 + size * 4), dtype=np.uint8)
    payload[:, 0] = types
    payload[:, 1:] = filtered
    return build_png(
        PngHeader(width=size, height=size, bit_depth=8, color_type=6),
        zlib.compress(payload.tobytes(), 1),
    )


def run_streaming(opts, tmp_path):
    out = tmp_path / "out.bin"
    total = 0
    with open(out, "wb") as f:
        for chunk in concat_streaming(opts):
            total += len(chunk)
            f.write(chunk)
    return total


def test_tall_canvas_constant_memory(tmp_path):
    """Doubling canvas height must not move peak memory: the pipeline holds
    O(width x band_height), not O(canvas). Mirrors the reference's absolute
    budgets (memory.test.ts:146-497) with a scaling check on top."""
    tile = tile_png(256, 1)

    def run(n):
        opts = {
            "inputs": [tile] * n,
            "layout": {"columns": 1},
            "band_height": 128,
            "backend": "numpy",
        }
        return monitor_memory(lambda: run_streaming(opts, tmp_path))

    total_small, report_small = run(50)  # 13 MB canvas
    total_big, report_big = run(200)  # 52 MB canvas
    assert total_big > 3 * total_small
    # 4x the canvas must not cost 4x the memory — allow allocator noise.
    assert report_big.peak_delta < report_small.peak_delta + (48 << 20), (
        f"peak grew with canvas height: {report_small.peak_delta / 1e6:.1f} MB "
        f"-> {report_big.peak_delta / 1e6:.1f} MB"
    )
    # Reference-style absolute budget (60 MB class for this size,
    # memory.test.ts:183-184).
    assert_memory_below(report_big, 120 << 20, "tall canvas")
    assert_streaming_efficiency(report_big, total_big)


def test_lazy_sources_avoid_materializing_inputs(tmp_path):
    """ImageSource factories defer decode; a 4x25 grid of lazy tiles keeps
    only in-flight bands alive (reference memory.test.ts lazy input pattern)."""
    tile = tile_png(128, 2)
    calls = []

    def make(i):
        def factory():
            calls.append(i)
            return tile

        return ImageSource(width=128, height=128, factory=factory, format="png")

    opts = {
        "inputs": [make(i) for i in range(100)],
        "layout": {"columns": 4},
        "band_height": 64,
        "backend": "numpy",
    }
    total, report = monitor_memory(lambda: run_streaming(opts, tmp_path))
    assert len(calls) == 100
    assert total > 0
    assert_memory_below(report, 200 << 20, "lazy grid")


def test_input_cache_decodes_shared_buffer_once(tmp_path):
    """Same bytes object tiled 16x: the cache decodes it once
    (reference: png-input-adapter.ts:34-148, memory.test.ts:33-35)."""
    from image_stitch_tpu.codecs import input_cache

    tile = tile_png(64, 3)
    enable_input_cache()
    try:
        opts = {
            "inputs": [tile] * 16,
            "layout": {"columns": 4},
            "backend": "numpy",
        }
        total = run_streaming(opts, tmp_path)
        assert total > 0
        assert len(input_cache._entries) == 1
        entry = next(iter(input_cache._entries.values()))
        assert entry.done  # producer ran exactly once to completion
    finally:
        disable_input_cache()
    assert not input_cache.input_cache_enabled()


def test_output_is_identical_with_and_without_cache(tmp_path):
    tile = tile_png(32, 4)
    opts = {"inputs": [tile] * 4, "layout": {"columns": 2}, "backend": "numpy"}
    baseline = b"".join(concat_streaming(opts))
    enable_input_cache()
    try:
        cached = b"".join(concat_streaming(opts))
    finally:
        disable_input_cache()
    assert baseline == cached


def test_stream_is_demand_driven():
    """Pulling only the header chunks must not decode any pixels — the
    pipeline advances only as the consumer pulls (the reference's
    Readable-pull backpressure, image-concat.ts:10-27)."""
    calls = []

    def factory():
        calls.append(1)
        return tile_png(32, 9)

    sources = [
        ImageSource(width=32, height=32, factory=factory, format="png")
        for _ in range(4)
    ]
    gen = concat_streaming(
        {"inputs": sources, "layout": {"columns": 2}, "backend": "numpy"}
    )
    sig = next(gen)       # PNG signature
    ihdr = next(gen)      # IHDR
    assert sig[:4] == b"\x89PNG"[:4]
    assert ihdr[4:8] == b"IHDR"
    assert calls == []    # no pixel decode yet
    rest = b"".join(gen)
    assert calls == [1, 1, 1, 1]
    assert rest.endswith(b"IEND\xae\x42\x60\x82")


def gradient_tile_png(size: int) -> bytes:
    """Compressible tile so the 10000^2 PNG proof fits the CI time budget."""
    x = np.linspace(0, 255, size).astype(np.uint8)
    arr = np.empty((size, size, 4), dtype=np.uint8)
    arr[:, :, 0] = x[None, :]
    arr[:, :, 1] = x[:, None]
    arr[:, :, 2] = 80
    arr[:, :, 3] = 255
    raw = arr.reshape(size, size * 4)
    types, filtered = filter_select_band(raw, None, 4)
    payload = np.empty((size, 1 + size * 4), dtype=np.uint8)
    payload[:, 0] = types
    payload[:, 1:] = filtered
    return build_png(
        PngHeader(width=size, height=size, bit_depth=8, color_type=6),
        zlib.compress(payload.tobytes(), 1),
    )


def test_10000px_png_memory_budget(tmp_path):
    """Reference-scale proof: 10000x10000 canvas (400 MB RGBA) streamed to
    disk under an absolute peak budget (model: memory.test.ts:275-326,
    10000^2 < 900 MB; tighter here because bands are the only live pixels).
    One shared tile + input cache = decode-once, like the reference's tiled
    mega-image tests (memory.test.ts:33-35)."""
    tile = gradient_tile_png(1000)
    enable_input_cache()
    try:
        opts = {
            "inputs": [tile] * 100,
            "layout": {"columns": 10},
            "band_height": 256,
            "backend": "numpy",
            "png_compression_level": 1,
        }
        total, report = monitor_memory(lambda: run_streaming(opts, tmp_path))
    finally:
        disable_input_cache()
    assert total > 0
    # Measured peak ~85 MB for the 400 MB-RGBA canvas (vs the reference's
    # 900 MB CI budget at this size, memory.test.ts:275-276).
    assert_memory_below(report, 200 << 20, "10000^2 PNG")


@pytest.mark.skipif(
    bool(os.environ.get("STITCH_TPU_NO_NATIVE")),
    reason="pure-Python oracle entropy coder is ~50-100x slower; 100 MP "
    "takes >30 min in the fallback tier (memory contract is proven by the "
    "PNG test above, which does run no-native)",
)
def test_10000px_jpeg_memory_and_efficiency(tmp_path):
    """10000^2 noise -> JPEG: high-entropy output large enough for the
    reference's 15x streaming-efficiency invariant to bite
    (memory-monitor.ts:213-234)."""
    tile = tile_png(1000, seed=7)  # noise tile
    enable_input_cache()
    try:
        opts = {
            "inputs": [tile] * 100,
            "layout": {"columns": 10},
            "band_height": 256,
            "backend": "numpy",
            "outputFormat": "jpeg",
        }
        total, report = monitor_memory(lambda: run_streaming(opts, tmp_path))
    finally:
        disable_input_cache()
    assert total > 50 << 20  # noise at q85: plenty of entropy
    # Measured peak ~35 MB.
    assert_memory_below(report, 150 << 20, "10000^2 JPEG")
    assert_streaming_efficiency(report, total)


@pytest.mark.skipif(
    bool(os.environ.get("STITCH_TPU_SKIP_BIG_MEMORY_TESTS")),
    reason="STITCH_TPU_SKIP_BIG_MEMORY_TESTS=1 skips the 20000^2 proof",
)
@pytest.mark.skipif(
    bool(os.environ.get("STITCH_TPU_NO_NATIVE")),
    reason="the pure-Python fallback tier takes >10 min at this scale; the "
    "memory contract is proven no-native by the 10000^2 PNG test above",
)
def test_20000px_tiled_memory_budget(tmp_path):
    """The reference's largest proof: 20000x20000 tiled (1.6 GB RGBA)
    < 1.5 GB peak (memory.test.ts:325-326) — CI-enforced there, default-on
    here too. Time-boxed shape: one shared compressible tile + input cache
    (decode-once) + level-1 deflate keep it ~1-2 min even on a loaded host;
    STITCH_TPU_SKIP_BIG_MEMORY_TESTS=1 opts out."""
    tile = gradient_tile_png(1000)
    enable_input_cache()
    try:
        opts = {
            "inputs": [tile] * 400,
            "layout": {"columns": 20},
            "band_height": 256,
            "backend": "numpy",
            "png_compression_level": 1,
        }
        total, report = monitor_memory(lambda: run_streaming(opts, tmp_path))
    finally:
        disable_input_cache()
    assert total > 0
    assert_memory_below(report, 1500 << 20, "20000^2 tiled PNG")
