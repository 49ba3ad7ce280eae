"""Observability/telemetry tests (SURVEY §5: tracing/metrics, first-class
here, absent in the reference)."""

import numpy as np

from image_stitch_tpu import CoreStreamingConcatenator
from image_stitch_tpu.utils.observability import PipelineStats, device_trace
from tests.utils.fixtures import png_from_array, random_rgba


def test_stats_counters():
    tiles = [png_from_array(random_rgba(32, 32, s)) for s in range(4)]
    core = CoreStreamingConcatenator(
        {"inputs": tiles, "layout": {"columns": 2}, "band_height": 16}
    )
    out = b"".join(core.stream())
    rep = core.stats.report()
    assert rep["bands"] == 4  # 64 rows / 16
    assert rep["megapixels"] == round(64 * 64 / 1e6, 3)
    assert rep["output_bytes"] == len(out)
    assert rep["seconds"] > 0
    assert core.stats.check_streaming_efficiency()


def test_stats_stage_timer():
    stats = PipelineStats()
    with stats.stage("demo"):
        sum(range(1000))
    with stats.stage("demo"):
        pass
    assert stats.stage_seconds["demo"] >= 0


def test_device_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("STITCH_TPU_TRACE_DIR", raising=False)
    with device_trace():
        x = 1 + 1
    assert x == 2


def test_jpeg_stats():
    tiles = [png_from_array(random_rgba(16, 16, s)) for s in range(2)]
    core = CoreStreamingConcatenator(
        {"inputs": tiles, "layout": {"columns": 2}, "outputFormat": "jpeg"}
    )
    out = b"".join(core.stream())
    assert core.stats.output_bytes == len(out)
    assert core.stats.pixels == 16 * 32


def test_deflate_strategies_roundtrip():
    import zlib

    from image_stitch_tpu import StreamingDeflator

    data = bytes(range(256)) * 100
    for strategy in ("default", "filtered", "rle", "huffman"):
        chunks = []
        d = StreamingDeflator(level=4, on_data=chunks.append, strategy=strategy)
        d.push(data)
        d.finish()
        assert zlib.decompress(b"".join(chunks)) == data


def test_deflate_strategy_affects_output():
    from image_stitch_tpu import concat_to_buffer
    from tests.utils.fixtures import decode_png_pil

    tile = random_rgba(64, 64, 3)
    outs = {}
    for strategy in ("default", "rle"):
        outs[strategy] = concat_to_buffer(
            {
                "inputs": [png_from_array(tile)],
                "layout": {"columns": 1},
                "png_compression_strategy": strategy,
                "png_compression_level": 2,
            }
        )
        np.testing.assert_array_equal(decode_png_pil(outs[strategy]), tile)
    assert outs["default"] != outs["rle"]
