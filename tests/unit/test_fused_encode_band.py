"""The fused native convert+DCT+quant+entropy band path must be
byte-identical to the split quantize -> entropy path.

The fused tier (native/stitchnative.cpp quant_entropy_core_444) is the
default host 4:4:4 JPEG path; these tests pin its byte stream against the
split path and the pure-numpy tier so a divergence in any future kernel
change (e.g. a new SIMD variant) fails loudly.
"""

import numpy as np
import pytest

from image_stitch_tpu.codecs.jpeg.encoder import StreamingJpegEncoder, encode_jpeg
from image_stitch_tpu.native import native_available


def _collect(enc, band):
    out = b"".join(enc.encode_band(band))
    out += b"".join(enc.finish())
    return out


def _encode_split(width, height, quality, bands):
    enc = StreamingJpegEncoder(width, height, quality)
    # Forcing the split path: the fused tier only engages through
    # _fused_native_band; stub it out to exercise quantize -> entropy.
    enc._fused_native_band = lambda band: None
    out = b""
    for band in bands:
        out += b"".join(enc.encode_band(band))
    out += b"".join(enc.finish())
    return out


def _encode_fused(width, height, quality, bands):
    enc = StreamingJpegEncoder(width, height, quality)
    out = b""
    for band in bands:
        out += b"".join(enc.encode_band(band))
    out += b"".join(enc.finish())
    return out


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_fused_band_bytes_equal_split(quality):
    rng = np.random.default_rng(3)
    h, w = 64, 128
    bands = [
        rng.integers(0, 256, (16, w, 4), dtype=np.uint8) for _ in range(h // 16)
    ]
    assert _encode_fused(w, h, quality, bands) == _encode_split(w, h, quality, bands)


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
def test_fused_band_bytes_equal_split_odd_width_padding():
    # Width 100 -> pad_w 4 exercises the edge-repetition path inside
    # _fused_native_band.
    rng = np.random.default_rng(5)
    w, h = 100, 32
    bands = [rng.integers(0, 256, (h, w, 4), dtype=np.uint8)]
    assert _encode_fused(w, h, 85, bands) == _encode_split(w, h, 85, bands)


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
def test_fused_band_bytes_equal_split_partial_tail():
    # A 20-row band leaves a 4-row pending tail that finish() pads and
    # routes through _encode_strip (also fused).
    rng = np.random.default_rng(7)
    w = 64
    bands = [rng.integers(0, 256, (20, w, 4), dtype=np.uint8)]
    assert _encode_fused(w, 20, 85, bands) == _encode_split(w, 20, 85, bands)


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
def test_restart_mode_unchanged_by_fused_tier():
    # Restart intervals bypass the fused tier (markers interleave per MCU
    # row); bytes must match a decoder-visible reference: the split path
    # with restarts produces the same stream whether or not the fused
    # branch exists.
    rng = np.random.default_rng(9)
    w, h = 64, 64
    band = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)

    def run(stub):
        enc = StreamingJpegEncoder(w, h, 85)
        enc._restart_rows = 2
        if stub:
            enc._fused_native_band = lambda b: None
        out = b"".join(enc.encode_band(band))
        out += b"".join(enc.finish())
        return out

    assert run(False) == run(True)


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
def test_fused_matches_numpy_tier():
    # Cross-tier anchor: full encode via the native fused path equals the
    # pure-numpy tier (STITCH_TPU_NO_NATIVE exercises that path in its own
    # suite; here we call the numpy block pipeline directly).
    from image_stitch_tpu.codecs.jpeg import encoder as enc_mod

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (24, 48, 4), dtype=np.uint8)
    fused = encode_jpeg(arr, 48, 24, quality=85)

    enc = StreamingJpegEncoder(48, 24, 85)
    enc._fused_native_band = lambda band: None
    enc._native_coder = None  # numpy Huffman tier
    enc._quantize_band = lambda band: enc_mod._band_to_blocks_numpy(
        np.concatenate(
            [band, np.repeat(band[:, -1:, :], enc._pad_w, axis=1)], axis=1
        ) if enc._pad_w else band,
        enc.luma_q, enc.chroma_q,
    )
    out = b"".join(enc.encode_band(arr))
    out += b"".join(enc.finish())
    assert fused == out


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
def test_native_420_quant_matches_numpy():
    from image_stitch_tpu.codecs.jpeg.encoder import _band_to_blocks_numpy_420
    from image_stitch_tpu.native import jpeg_quant_band_420_native
    from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables

    rng = np.random.default_rng(13)
    for q in (50, 85, 95):
        lq, cq = quality_scaled_tables(q)
        for h, w in [(16, 16), (32, 64), (64, 128)]:
            band = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            nat = jpeg_quant_band_420_native(band, lq, cq)
            ref = _band_to_blocks_numpy_420(band, lq, cq)
            for a, b in zip(nat, ref):
                assert np.array_equal(a, b)


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
@pytest.mark.parametrize("shape", [(32, 64), (48, 100), (20, 30)])
def test_420_fused_split_numpy_bytes_equal(shape):
    from image_stitch_tpu.codecs.jpeg.encoder import (
        _band_to_blocks_numpy_420,
    )

    h, w = shape
    rng = np.random.default_rng(h * 100 + w)
    band = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)

    def enc(stub_fused, numpy_quant):
        e = StreamingJpegEncoder(w, h, 85, sampling="420")
        if stub_fused:
            e._fused_native_band = lambda b: None
        if numpy_quant:
            e._quantize_band = lambda b: _band_to_blocks_numpy_420(
                np.concatenate(
                    [b, np.repeat(b[:, -1:, :], e._pad_w, axis=1)], axis=1
                ) if e._pad_w else b,
                e.luma_q, e.chroma_q,
            )
        out = b"".join(e.encode_band(band))
        out += b"".join(e.finish())
        return out

    fused, split, numpy_tier = enc(False, False), enc(True, False), enc(True, True)
    assert fused == split == numpy_tier


@pytest.mark.skipif(not native_available(), reason="native tier unavailable")
@pytest.mark.parametrize("sampling", ["444", "420"])
@pytest.mark.parametrize("ri", [1, 2, 3])
def test_fused_restart_groups_equal_split(sampling, ri):
    # The grouped fused restart path (one fused native call per restart
    # group + shared _restart_boundary bookkeeping) must be byte-identical
    # to the split quantize -> per-strip entropy path. Bands deliberately
    # do NOT align to group boundaries so groups span band edges, and the
    # image tail leaves a short final group.
    rng = np.random.default_rng(13 * ri + (0 if sampling == "444" else 1))
    w = 100 if sampling == "444" else 96  # 444: pad_w=4 exercises padding
    h = 8 * (16 if sampling == "420" else 8) + (8 if sampling == "444" else 16)
    band_h = 3 * (16 if sampling == "420" else 8)  # 3 MCU rows per band
    bands = []
    row = 0
    while row < h:
        take = min(band_h, h - row)
        bands.append(rng.integers(0, 256, (take, w, 4), dtype=np.uint8))
        row += take

    def run(force_split):
        enc = StreamingJpegEncoder(
            w, h, 85, sampling=sampling, restart_interval_rows=ri
        )
        if force_split:
            enc._fused_native_band = lambda b: None
        out = b""
        for band in bands:
            out += b"".join(enc.encode_band(band))
        out += b"".join(enc.finish())
        return out

    fused = run(False)
    split = run(True)
    assert fused == split
    # Sanity: restart markers actually present (not vacuously equal).
    n_rst = sum(fused.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_rst > 0
