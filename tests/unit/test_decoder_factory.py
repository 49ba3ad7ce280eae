"""Decoder factory / plugin / lazy tests (model: reference
tests/unit/decoder-factory.test.ts, lazy-decoder.test.ts,
format-detection.test.ts)."""

import io

import numpy as np
import pytest

from image_stitch_tpu import (
    DecoderPlugin,
    ImageSource,
    PngDecoder,
    PositionedImage,
    StitchError,
    clear_default_decoder_plugins,
    create_decoder,
    create_decoders,
    detect_format,
    detect_image_format,
    extract_positions,
    get_default_decoder_plugins,
    has_positioned_images,
    read_magic_bytes,
    set_default_decoder_plugins,
    validate_format,
    validate_positioned_inputs,
)
from image_stitch_tpu.codecs.factory import LazyImageDecoder
from tests.utils.fixtures import jpeg_from_array, png_from_array, random_rgba


PNG = png_from_array(random_rgba(4, 4, 0))
JPEG = jpeg_from_array(random_rgba(8, 8, 1)[:, :, :3])


# --- format detection (reference format-detection.test.ts) ------------------

def test_detect_png_jpeg():
    assert detect_image_format(PNG[:32]) == "png"
    assert detect_image_format(JPEG[:32]) == "jpeg"
    assert detect_image_format(b"\x00" * 32) is None


def test_detect_heic_brands():
    magic = b"\x00\x00\x00\x18ftypheic" + b"\x00" * 16
    assert detect_image_format(magic) == "heic"
    # Compatible-brand scan.
    magic = b"\x00\x00\x00\x20ftypisom\x00\x00\x00\x00mif1" + b"\x00" * 8
    assert detect_image_format(magic) == "heic"


def test_read_magic_bytes_sources(tmp_path):
    p = tmp_path / "x.png"
    p.write_bytes(PNG)
    assert read_magic_bytes(PNG) == PNG[:32]
    assert read_magic_bytes(str(p)) == PNG[:32]
    stream = io.BytesIO(PNG)
    assert read_magic_bytes(stream) == PNG[:32]
    assert stream.tell() == 0  # position restored
    assert detect_format(p) == "png"
    assert validate_format(PNG, "png")
    assert not validate_format(PNG, "jpeg")


# --- factory dispatch (reference decoder-factory.test.ts) -------------------

def test_create_decoder_dispatches_by_magic():
    d = create_decoder(PNG)
    assert d.get_header().format == "png"
    d.close()
    d = create_decoder(JPEG)
    assert d.get_header().format == "jpeg"
    d.close()


def test_decoder_passthrough():
    existing = PngDecoder(PNG)
    assert create_decoder(existing) is existing
    existing.close()


def test_positioned_unwrap():
    d = create_decoder(PositionedImage(x=1, y=2, source=PNG))
    assert d.get_header().format == "png"
    d.close()


def test_unknown_format_raises():
    with pytest.raises(StitchError, match="[Uu]nsupported|[Uu]nrecognized"):
        create_decoder(b"garbage data here................")


def test_no_plugin_for_format_raises():
    with pytest.raises(StitchError, match="No decoder plugin"):
        create_decoder(JPEG, plugins=[])
    # plugins=[] means no plugins at all -> unknown format error path differs:
    # use a PNG-only list against a JPEG input for the precise message.
    from image_stitch_tpu import png_plugin

    with pytest.raises(StitchError, match="No decoder plugin"):
        create_decoder(JPEG, plugins=[png_plugin()])


def test_create_decoders_closes_on_failure():
    closed = []

    class Tracking:
        def get_header(self):
            return None

        def scanlines(self):
            return iter(())

        def close(self):
            closed.append(True)

    with pytest.raises(StitchError):
        create_decoders([Tracking(), b"not an image"])
    assert closed == [True]


# --- plugin registry (reference plugin-registry.ts) -------------------------

def test_registry_default_and_override():
    original = get_default_decoder_plugins()
    assert {p.format for p in original} == {"png", "jpeg", "heic"}
    try:
        custom = DecoderPlugin(format="png", create=lambda s, o=None: PngDecoder(s))
        set_default_decoder_plugins([custom])
        assert [p.format for p in get_default_decoder_plugins()] == ["png"]
        clear_default_decoder_plugins()
        # Cleared registry falls back to PNG-only (plugin-registry.ts:6-13).
        assert [p.format for p in get_default_decoder_plugins()] == ["png"]
    finally:
        set_default_decoder_plugins(original)


# --- positioned helpers -----------------------------------------------------

def test_positioned_helpers():
    inputs = [PositionedImage(x=1, y=2, source=PNG, z_index=7), PNG]
    assert has_positioned_images(inputs)
    with pytest.raises(StitchError, match="mix"):
        validate_positioned_inputs(inputs)
    pos = extract_positions(inputs)
    assert pos[0] == {"x": 1, "y": 2, "z_index": 7}
    assert pos[1] is None


# --- lazy decoder (reference lazy-decoder.test.ts) --------------------------

def test_lazy_decoder_defers_factory():
    calls = []

    def factory():
        calls.append(1)
        return PNG

    src = ImageSource(width=4, height=4, factory=factory, format="png")
    d = create_decoder(src)
    assert isinstance(d, LazyImageDecoder)
    header = d.get_header()  # header from declared metadata, no decode
    assert (header.width, header.height) == (4, 4)
    assert calls == []
    rows = list(d.scanlines())
    assert calls == [1]  # factory called exactly once
    assert len(rows) == 4
    d.close()


def test_lazy_decoder_dimension_mismatch():
    src = ImageSource(width=99, height=99, factory=lambda: PNG, format="png")
    d = create_decoder(src)
    with pytest.raises(StitchError, match="declared 99x99"):
        list(d.scanlines())


def test_heic_without_backend_raises_clear_error():
    """HEIC decode without pillow-heif or an injected decoder must fail with
    an actionable message (reference: optional sharp/heic-decode peers,
    heic-decoder.ts:266-285)."""
    import pytest as _pytest

    from image_stitch_tpu import HeicDecoder
    from image_stitch_tpu.codecs.heic import heic_backend_available

    if heic_backend_available():  # pragma: no cover - env without pillow-heif
        _pytest.skip("pillow-heif installed")
    fake_heic = b"\x00\x00\x00\x18ftypheic" + b"\x00" * 64
    dec = HeicDecoder(fake_heic)
    with _pytest.raises(StitchError, match="pillow-heif|custom_decoders"):
        dec.get_header()


def test_heic_custom_decoder_injection():
    import numpy as _np

    from image_stitch_tpu import DecoderOptions, HeicDecoder

    def fake(data):
        out = _np.zeros((3, 5, 4), _np.uint8)
        out[:] = [7, 8, 9, 255]
        return out

    fake_heic = b"\x00\x00\x00\x18ftypheic" + b"\x00" * 64
    dec = HeicDecoder(fake_heic, DecoderOptions(custom_decoders={"heic": fake}))
    header = dec.get_header()
    assert (header.width, header.height) == (5, 3)
    rows = _np.vstack(list(dec.bands(2)))
    assert rows.shape == (3, 20)


def test_non_seekable_stream_decodes():
    """Format detection consumes the first 32 bytes of non-seekable streams;
    create_decoder must hand the plugin a restored (pushback-wrapped) stream
    (detect.PushbackStream)."""
    import io

    import numpy as _np

    from image_stitch_tpu import concat_to_buffer
    from tests.utils.fixtures import png_from_array

    png = png_from_array(_np.full((16, 16, 4), 42, _np.uint8))

    class NonSeekable:
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(n)

    out = concat_to_buffer(
        {"inputs": [NonSeekable(png), NonSeekable(png)], "layout": {"columns": 2}}
    )
    from PIL import Image as _Image

    img = _Image.open(io.BytesIO(out))
    assert img.size == (32, 16)
    arr = _np.array(img.convert("RGBA"))
    assert (arr == 42).all()


def test_create_decoders_parallel_pool_preserves_order_and_results():
    """create_decoders(pool=...) fans construction out across threads
    (reference Promise.all, decoder-factory.ts:222) with order preserved
    and results identical to the serial path."""
    from concurrent.futures import ThreadPoolExecutor

    tiles = [png_from_array(random_rgba(8, 8 + i, seed=i)) for i in range(12)]
    serial = create_decoders(tiles)
    with ThreadPoolExecutor(max_workers=4) as pool:
        parallel = create_decoders(tiles, pool=pool)
    try:
        assert len(parallel) == len(serial) == 12
        for i, (a, b) in enumerate(zip(serial, parallel)):
            ha, hb = a.get_header(), b.get_header()
            assert (ha.width, ha.height) == (hb.width, hb.height) == (8, 8 + i)
    finally:
        for d in serial + parallel:
            d.close()


def test_create_decoders_parallel_pool_cleans_up_on_failure():
    """A failing input mid-list must close every decoder that WAS built
    and raise — same contract as the serial path."""
    from concurrent.futures import ThreadPoolExecutor

    tiles = [png_from_array(random_rgba(8, 8, seed=s)) for s in range(4)]
    bad = b"not an image at all"
    with ThreadPoolExecutor(max_workers=4) as pool:
        with pytest.raises(StitchError):
            create_decoders(tiles[:2] + [bad] + tiles[2:], pool=pool)


def test_create_decoders_dedupes_repeated_inputs_with_identical_output():
    """Repeated inputs (same bytes object / same path) share one probe via
    clone_fresh: later decoders reuse the first's parsed structure, and
    decoded output is identical to independently constructed decoders."""
    import numpy as np

    tile = png_from_array(random_rgba(16, 16, seed=7))
    decs = create_decoders([tile, tile, tile, tile])
    try:
        bufs = {id(getattr(d, "_buf", None)) for d in decs}
        assert len(bufs) == 1  # all four share the first decoder's buffer
        ref = create_decoders([tile])[0]
        want = np.vstack(list(ref.bands(8)))
        ref.close()
        for d in decs:
            assert d.get_header().width == 16
            got = np.vstack(list(d.bands(8)))
            assert np.array_equal(got, want)
    finally:
        for d in decs:
            d.close()


def test_create_decoders_dedupe_same_path(tmp_path, monkeypatch):
    """Same path string repeated: probed once, every instance decodes.
    Auto decode-once sharing disabled so the clone path itself is what
    is under test."""
    import numpy as np

    monkeypatch.setenv("STITCH_TPU_AUTO_CACHE_MB", "0")
    p = tmp_path / "t.png"
    p.write_bytes(png_from_array(random_rgba(12, 12, seed=9)))
    paths = [str(p)] * 5
    decs = create_decoders(paths)
    try:
        outs = [np.vstack(list(d.bands(4))) for d in decs]
        assert all(np.array_equal(o, outs[0]) for o in outs[1:])
        # Path posture survives the clone: lenient CRC (reference fd-scan
        # posture), not the strict buffer default.
        assert all(d._verify_crc is False for d in decs)
    finally:
        for d in decs:
            d.close()


def test_auto_cache_shares_one_decode_for_repeated_inputs():
    """Repeated small inputs decode ONCE through a shared per-call cache
    entry (the reference's input-cache semantics, on by default here with
    a memory budget): all consumers see identical bands, and the whole
    grid output matches the uncached run byte for byte."""
    import numpy as np

    from image_stitch_tpu import concat_to_buffer
    from image_stitch_tpu.codecs.input_cache import CachedDecoder

    tile = png_from_array(random_rgba(192, 192, seed=21))  # above the tiny-PNG group cutoff
    decs = create_decoders([tile, tile, tile])
    try:
        assert all(isinstance(d, CachedDecoder) for d in decs)
        outs = [np.vstack(list(d.bands(8))) for d in decs]
        assert all(np.array_equal(o, outs[0]) for o in outs[1:])
    finally:
        for d in decs:
            d.close()
    opts = {"inputs": [tile] * 6, "layout": {"columns": 3},
            "outputFormat": "png"}
    cached = concat_to_buffer(opts)
    import os

    os.environ["STITCH_TPU_AUTO_CACHE_MB"] = "0"
    try:
        uncached = concat_to_buffer(opts)
    finally:
        del os.environ["STITCH_TPU_AUTO_CACHE_MB"]
    assert cached == uncached


def test_auto_cache_respects_budget():
    """Inputs whose decoded size exceeds the budget stay on the
    clone/per-instance path (the streaming memory posture wins)."""
    import os

    from image_stitch_tpu.codecs.input_cache import CachedDecoder

    tile = png_from_array(random_rgba(192, 192, seed=22))  # 147 KB decoded
    os.environ["STITCH_TPU_AUTO_CACHE_MB"] = "0.05"  # 50 KB budget
    try:
        decs = create_decoders([tile, tile])
    finally:
        del os.environ["STITCH_TPU_AUTO_CACHE_MB"]
    try:
        assert not any(isinstance(d, CachedDecoder) for d in decs)
    finally:
        for d in decs:
            d.close()
