"""Seeded corruption fuzzing: arbitrary byte damage to valid inputs must
produce either a clean StitchError or decodable output — never a hang,
crash, or non-Stitch exception. Exercises the owned C++ inflate, the PNG
chunk walker, and the owned JPEG decoder on hostile bytes (reference
analog: truncated/invalid-input tests, image-concat.test.ts:133-178)."""

import io

import numpy as np
import pytest

from image_stitch_tpu import concat_to_buffer
from image_stitch_tpu.errors import StitchError
from image_stitch_tpu.types import DecoderOptions

from tests.utils.fixtures import png_from_array


def valid_png() -> bytes:
    rng = np.random.default_rng(0)
    return png_from_array(rng.integers(0, 256, (48, 40, 4), dtype=np.uint8))


def valid_jpeg() -> bytes:
    from PIL import Image

    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)).save(
        buf, "JPEG", quality=85
    )
    return buf.getvalue()


def mutate(data: bytes, rng: np.random.Generator) -> bytes:
    b = bytearray(data)
    op = rng.integers(0, 4)
    if op == 0:  # flip random bytes
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
    elif op == 1:  # truncate
        b = b[: int(rng.integers(1, len(b)))]
    elif op == 2:  # delete a span
        i = int(rng.integers(0, len(b) - 1))
        j = min(len(b), i + int(rng.integers(1, 64)))
        del b[i:j]
    else:  # insert garbage
        i = int(rng.integers(0, len(b)))
        b[i:i] = bytes(rng.integers(0, 256, int(rng.integers(1, 32)), dtype=np.uint8))
    return bytes(b)


def run_concat(data: bytes, **opts) -> None:
    try:
        out = concat_to_buffer({"inputs": [data], "layout": {"columns": 1}, **opts})
        assert isinstance(out, bytes) and len(out) > 0
    except StitchError:
        pass  # clean rejection is equally acceptable


@pytest.mark.parametrize("seed", range(30))
def test_corrupt_png_never_crashes(seed):
    rng = np.random.default_rng(1000 + seed)
    run_concat(mutate(valid_png(), rng), backend="numpy")


@pytest.mark.parametrize("seed", range(30))
def test_corrupt_png_strict_mode_never_crashes(seed):
    rng = np.random.default_rng(2000 + seed)
    data = mutate(valid_png(), rng)
    from image_stitch_tpu.codecs.png.decoder import PngDecoder

    try:
        dec = PngDecoder(data, verify_crc=True)
        for _ in dec.bands(16):
            pass
    except StitchError:
        pass


@pytest.mark.parametrize("seed", range(30))
def test_corrupt_jpeg_owned_decoder_never_crashes(seed):
    rng = np.random.default_rng(3000 + seed)
    run_concat(
        mutate(valid_jpeg(), rng),
        decoderOptions=DecoderOptions(force_owned=True),
        outputFormat="jpeg",
    )


@pytest.mark.parametrize("seed", range(30))
def test_corrupt_jpeg_pil_tier_never_crashes(seed):
    """The PIL (native) JPEG tier leaked raw OSError on damaged streams —
    found by a 2000-seed offline sweep; the owned tier kept the contract.
    Seeds 3-6 of the sweep's mutation sequence reproduce the leak."""
    rng = np.random.default_rng(3 + seed)
    run_concat(mutate(valid_jpeg(), rng))


@pytest.mark.parametrize("seed", range(20))
def test_random_garbage_rejected(seed):
    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(1, 4096))
    garbage = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    # Prefix with a valid magic sometimes to get past format detection.
    prefix = [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0"][seed % 3]
    with pytest.raises(StitchError):
        concat_to_buffer({"inputs": [prefix + garbage], "layout": {"columns": 1}})

def _jpeg_with_segment(seg: bytes) -> bytes:
    """Minimal SOI + crafted segment + EOI, for targeted truncation tests."""
    return b"\xff\xd8" + seg + b"\xff\xd9"


def test_truncated_dht_raises_stitcherror():
    """Fuzz-found: a DHT whose declared length cuts off the 16-byte bits
    array raised IndexError in _HuffDecoder (owned_decoder.py)."""
    from image_stitch_tpu.codecs.jpeg.owned_decoder import decode_baseline_jpeg

    # DHT with seg_len=6 -> body is 4 bytes: class/id byte + 3 bits bytes.
    seg = b"\xff\xc4\x00\x06" + b"\x00\x01\x02\x03"
    with pytest.raises(StitchError):
        decode_baseline_jpeg(_jpeg_with_segment(seg))


def test_truncated_sos_raises_stitcherror():
    """Fuzz-found: an SOS claiming 3 components with a 2-byte body raised
    IndexError at the component-spec parse."""
    from image_stitch_tpu.codecs.jpeg.owned_decoder import decode_baseline_jpeg

    sof = b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    sos = b"\xff\xda\x00\x04\x03\x01"  # ns=3 but only one spec byte follows
    with pytest.raises(StitchError):
        decode_baseline_jpeg(_jpeg_with_segment(sof + sos))


def test_truncated_dht_symbol_table_raises_stitcherror():
    """bits declare 255 symbols but the body ends after the bits array."""
    from image_stitch_tpu.codecs.jpeg.owned_decoder import decode_baseline_jpeg

    bits = bytes([0xFF] + [0] * 15)
    seg = b"\xff\xc4\x00\x13" + b"\x00" + bits
    with pytest.raises(StitchError):
        decode_baseline_jpeg(_jpeg_with_segment(seg))


def test_oversized_png_dimensions_rejected():
    """Fuzz-found: a corrupted IHDR declaring a ~2^32 width drove a 765 GiB
    band allocation (MemoryError). Spec-invalid dims (> 2^31-1) must raise
    StitchError at parse; spec-valid-but-huge canvases are capped by the
    maxCanvasDim option."""
    import struct
    import zlib

    def with_width(data: bytes, width: int) -> bytes:
        # IHDR starts at offset 8 (len+type) + 8 = 16; width is bytes
        # 16:20. Recompute the chunk CRC (type+data, bytes 12:29) so the
        # buffer-default CRC check doesn't fire before the dims guard.
        b = bytearray(data)
        b[16:20] = struct.pack(">I", width)
        b[29:33] = struct.pack(">I", zlib.crc32(bytes(b[12:29])))
        return bytes(b)

    good = valid_png()
    huge = with_width(good, 0xFF00FF28)  # > 2^31-1: spec-invalid
    with pytest.raises(StitchError, match="2\\^31|Invalid"):
        concat_to_buffer({"inputs": [huge], "layout": {"columns": 1}})

    big = with_width(good, (1 << 20) + 1)  # spec-valid, over the cap
    with pytest.raises(StitchError, match="maxCanvasDim"):
        concat_to_buffer({"inputs": [big], "layout": {"columns": 1}})


def test_max_canvas_dim_raisable_and_unlimited():
    arr = __import__("numpy").zeros((4, 4, 4), "uint8")
    out = concat_to_buffer(
        {"inputs": [arr], "layout": {"columns": 1}, "maxCanvasDim": 0}
    )
    assert out[:4] == b"\x89PNG"
