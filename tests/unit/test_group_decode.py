"""Batched small-tile PNG decode (codecs/png/group_decode): bit-exact vs
the per-tile path, clean fallback on corrupt members, posture guards.

The group path is an optimization of the grid hot loop for many-tiny-tile
configs (reference hot loop being beaten: image-concat-core.ts:389-549);
its contract is byte-identical output to the standalone decoder chain."""

import os

import numpy as np
import pytest

from image_stitch_tpu.codecs.factory import create_decoders
from image_stitch_tpu.codecs.png.group_decode import (
    MIN_GROUP,
    plan_group_providers,
)
from image_stitch_tpu.core import image_header_to_png_header
from image_stitch_tpu.ops.pixel import convert_band

from tests.conftest import PNGSUITE_DIR


@pytest.fixture(autouse=True)
def _disable_auto_cache(monkeypatch):
    """These tests duplicate inputs to FORCE grouping; the factory's
    budgeted decode-once sharing would otherwise absorb the duplicates
    before the group planner ever sees them (production behavior, but
    not what is under test here)."""
    monkeypatch.setenv("STITCH_TPU_AUTO_CACHE_MB", "0")


def _suite_paths():
    return [
        os.path.join(PNGSUITE_DIR, n)
        for n in sorted(os.listdir(PNGSUITE_DIR))
        if n.endswith(".png") and not n.startswith("x")
    ]


def _oracle(path, target_depth):
    """Standalone per-tile decode -> convert (the path being replaced)."""
    from image_stitch_tpu.codecs.png.decoder import PngDecoder

    dec = PngDecoder(path)
    ih = dec.get_header()
    h = image_header_to_png_header(ih)
    bands = np.vstack(list(dec.bands(64)))
    meta = ih.metadata or {}
    out = convert_band(
        bands, h.width, h.bit_depth, h.color_type, target_depth,
        palette=meta.get("palette"), trns=meta.get("trns"),
    )
    dec.close()
    return out


@pytest.mark.parametrize("target_depth", [8, 16])
def test_group_decode_bit_exact_across_pngsuite(target_depth):
    """Every grouped tile's converted pixels must equal the per-tile
    oracle — across gray/rgb/palette/alpha/sub-byte/16-bit classes."""
    paths = _suite_paths() * MIN_GROUP  # guarantee every class groups
    decoders = create_decoders(paths)
    try:
        ihs = [d.get_header() for d in decoders]
        headers = [image_header_to_png_header(h) for h in ihs]
        providers = plan_group_providers(
            decoders, headers, [h.metadata or {} for h in ihs], target_depth
        )
        assert len(providers) >= len(paths) // 2  # most classes group
        oracles: dict[str, np.ndarray] = {}
        checked = 0
        for i, provider in sorted(providers.items()):
            got = provider()
            assert got is not None, f"group decode failed for {paths[i]}"
            if paths[i] not in oracles:
                oracles[paths[i]] = _oracle(paths[i], target_depth)
            assert np.array_equal(got, oracles[paths[i]]), paths[i]
            checked += 1
        assert checked == len(providers)
    finally:
        for d in decoders:
            d.close()


def test_group_decode_corrupt_member_falls_back_with_attribution():
    """A corrupt member stream fails the WHOLE group decode; every member
    then falls back to the untouched per-tile path, and the corrupt input
    raises with its per-input attribution through the orchestrator."""
    from image_stitch_tpu import concat_to_buffer
    from image_stitch_tpu.errors import StitchError
    from tests.utils.fixtures import png_from_array

    rng = np.random.default_rng(3)
    tile = png_from_array(rng.integers(0, 256, (16, 16, 4), dtype=np.uint8))
    # Corrupt one copy's IDAT payload (keep structure so it plans into the
    # group; use a path-like posture via explicit lenient options so the
    # CRC check doesn't reject it before planning).
    bad = bytearray(tile)
    idat = tile.index(b"IDAT")
    bad[idat + 8] ^= 0xFF
    inputs = [tile, tile, bytes(bad), tile, tile, tile]
    with pytest.raises(StitchError, match="input #3"):
        concat_to_buffer({
            "inputs": inputs, "layout": {"columns": 3},
            "decoderOptions": {"verifyCrc": False},
        })


def test_grouped_grid_output_identical_to_ungrouped():
    """Whole-pipeline guard: the grid output bytes with grouping active
    equal the output with grouping disabled."""
    import image_stitch_tpu.codecs.png.group_decode as gd
    from image_stitch_tpu import concat_to_buffer
    from tests.utils.fixtures import png_from_array

    rng = np.random.default_rng(4)
    tiles = [
        png_from_array(rng.integers(0, 256, (24, 24, 4), dtype=np.uint8))
        for _ in range(3)
    ]
    inputs = [tiles[i % 3] for i in range(12)]
    opts = {
        "inputs": inputs, "layout": {"columns": 4},
        "decoderOptions": {"verifyCrc": False},
    }
    grouped = concat_to_buffer(opts)
    real = gd.plan_group_providers
    gd.plan_group_providers = lambda *a, **k: {}
    try:
        ungrouped = concat_to_buffer(opts)
    finally:
        gd.plan_group_providers = real
    assert grouped == ungrouped


def test_strict_buffers_group_with_full_integrity():
    """Strict (buffer-default) tiles DO group: chunk CRCs were verified
    during the buffer walk and the group inflate checks each tile's
    Adler-32 trailer — the same integrity set as the per-tile strict
    path. Both corruption classes must still be rejected end to end."""
    from image_stitch_tpu import concat_to_buffer
    from image_stitch_tpu.errors import StitchError
    from tests.utils.fixtures import png_from_array

    rng = np.random.default_rng(5)
    tile = png_from_array(rng.integers(0, 256, (16, 16, 4), dtype=np.uint8))
    decoders = create_decoders([tile] * 6)  # buffers: strict by default
    try:
        ihs = [d.get_header() for d in decoders]
        headers = [image_header_to_png_header(h) for h in ihs]
        providers = plan_group_providers(
            decoders, headers, [h.metadata or {} for h in ihs], 8
        )
        assert len(providers) == 6
        for p in providers.values():
            assert p() is not None
    finally:
        for d in decoders:
            d.close()

    # Adler-only corruption: flip trailer bits (last 4 bytes of the zlib
    # stream = end of the final IDAT payload). Chunk CRC must be
    # recomputed so only the Adler check can catch it.
    import struct
    import zlib as _z

    idat = tile.index(b"IDAT")
    length = int.from_bytes(tile[idat - 4:idat], "big")
    bad = bytearray(tile)
    bad[idat + 4 + length - 1] ^= 0xFF  # last zlib byte = Adler trailer
    bad[idat + 4 + length:idat + 8 + length] = struct.pack(
        ">I", _z.crc32(bytes(bad[idat:idat + 4 + length]))
    )
    with pytest.raises(StitchError):
        concat_to_buffer({
            "inputs": [tile, tile, bytes(bad), tile],
            "layout": {"columns": 2},
        })


def test_batch_deinterlace_matches_single_across_random_shapes():
    """deinterlace_adam7_batch must be bit-identical to the per-tile
    deinterlacer for arbitrary dimensions (passes go empty below 5px in
    either axis), depths and color types — including the sub-byte
    pack/unpack fast paths."""
    from image_stitch_tpu.ops.adam7 import (
        ADAM7_PASSES,
        adam7_payload_length,
        deinterlace_adam7,
        deinterlace_adam7_batch,
        get_pass_dimensions,
    )
    from image_stitch_tpu.types import PngHeader
    from image_stitch_tpu.utils import scanline_byte_length

    rng = np.random.default_rng(11)
    cases = []
    for depth, ct in [(8, 6), (8, 0), (16, 2), (8, 3), (4, 3), (2, 3),
                      (1, 0), (4, 0), (2, 0), (16, 6)]:
        for w, h in [(1, 1), (2, 3), (5, 4), (7, 7), (8, 8), (9, 1),
                     (1, 9), (31, 17), (32, 32), (33, 40)]:
            cases.append((w, h, depth, ct))
    for w, h, depth, ct in cases:
        hdr = PngHeader(width=w, height=h, bit_depth=depth, color_type=ct,
                        compression_method=0, filter_method=0,
                        interlace_method=1)
        payload = adam7_payload_length(hdr)
        n = 3
        stack = np.zeros((n, payload), dtype=np.uint8)
        # Random raw pass bytes with VALID filter-type bytes (0..4) at
        # each scanline start.
        for k in range(n):
            row = rng.integers(0, 256, payload, dtype=np.uint8)
            off = 0
            for p in ADAM7_PASSES:
                pw, ph = get_pass_dimensions(w, h, p)
                if pw == 0 or ph == 0:
                    continue
                prb = scanline_byte_length(pw, depth, ct)
                for r in range(ph):
                    row[off + r * (1 + prb)] = rng.integers(0, 5)
                off += ph * (1 + prb)
            stack[k] = row
        got = deinterlace_adam7_batch(stack, hdr)
        for k in range(n):
            want = deinterlace_adam7(stack[k].tobytes(), hdr)
            assert np.array_equal(got[k], want), (w, h, depth, ct, k)


def test_interlaced_corrupt_member_falls_back_with_attribution():
    """A corrupt interlaced member fails the batched Adam7 group decode;
    the fallback re-runs per tile and attributes the error to the right
    input — same contract as the non-interlaced case."""
    import os

    from image_stitch_tpu import concat_to_buffer
    from image_stitch_tpu.errors import StitchError

    path = os.path.join(PNGSUITE_DIR, "basi0g08.png")
    with open(path, "rb") as f:
        tile = f.read()
    bad = bytearray(tile)
    idat = tile.index(b"IDAT")
    bad[idat + 12] ^= 0xFF  # corrupt IDAT payload
    inputs = [tile, tile, tile, bytes(bad), tile, tile]
    with pytest.raises(StitchError, match="input #4"):
        concat_to_buffer({
            "inputs": inputs, "layout": {"columns": 3},
            "decoderOptions": {"verifyCrc": False},
        })
