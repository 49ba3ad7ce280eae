"""HEIC end-to-end through the full pipeline via the decoder-injection hook.

The reference's HEIC tier is an optional peer dependency (sharp /
heic-decode, heic-decoder.ts:266-285) and its tests runtime-skip without
one. Here the DI hook (DecoderOptions.custom_decoders, types.py) lets HEIC
participate in a full grid concat with no backend installed: the container
is a real ISO-BMFF box tree (owned header parse), the pixels come from the
injected callable — exactly how a user plugs libheif in.
"""

import io
import zlib

import numpy as np
import pytest

from image_stitch_tpu import concat_to_buffer
from image_stitch_tpu.codecs.heic import heic_backend_available


def box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def fullbox(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def make_heic_container(w: int, h: int) -> bytes:
    """A minimal HEIF: ftyp (heic brand) + meta{pitm, iprp{ipco{ispe}, ipma}}.

    Enough for format detection (ftyp brand scan, detect.py) AND the owned
    header-without-decode parse; pixel decode is supplied by injection.
    """
    ispe = fullbox(b"ispe", w.to_bytes(4, "big") + h.to_bytes(4, "big"))
    ipma_body = (1).to_bytes(4, "big") + (1).to_bytes(2, "big") + bytes([1, 1])
    meta_body = (
        fullbox(b"pitm", (1).to_bytes(2, "big"))
        + box(b"iprp", box(b"ipco", ispe) + fullbox(b"ipma", ipma_body))
    )
    ftyp = box(b"ftyp", b"heic" + (0).to_bytes(4, "big") + b"mif1heic")
    return ftyp + fullbox(b"meta", meta_body)


def heic_tile_pixels(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    arr[..., 3] = 255
    return arr


def make_png(arr: np.ndarray) -> bytes:
    from image_stitch_tpu import PngHeader, build_png

    h, w = arr.shape[:2]
    payload = np.zeros((h, 1 + w * 4), dtype=np.uint8)
    payload[:, 1:] = arr.reshape(h, w * 4)
    return build_png(
        PngHeader(width=w, height=h, bit_depth=8, color_type=6),
        zlib.compress(payload.tobytes(), 6),
    )


def decode_png(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGBA")
    return np.array(img)


def test_heic_grid_concat_via_injected_decoder():
    """2x2 grid mixing PNG and HEIC tiles; HEIC pixels land bit-exactly."""
    w = h = 48
    heic_px = {0: heic_tile_pixels(w, h, 1), 1: heic_tile_pixels(w, h, 2)}
    container = make_heic_container(w, h)
    calls = []

    def inject(data: bytes) -> np.ndarray:
        calls.append(data)
        # Key pixels off the call order: both containers are identical
        # bytes, which also proves decode happens once per input.
        return heic_px[len(calls) - 1]

    png_px = heic_tile_pixels(w, h, 3)
    inputs = [make_png(png_px), container, container, make_png(png_px)]
    out = concat_to_buffer({
        "inputs": inputs,
        "layout": {"columns": 2},
        "decoder_options": {"custom_decoders": {"heic": inject}},
    })
    result = decode_png(out)
    assert result.shape == (2 * h, 2 * w, 4)
    np.testing.assert_array_equal(result[:h, :w], png_px)
    np.testing.assert_array_equal(result[:h, w:], heic_px[0])
    np.testing.assert_array_equal(result[h:, :w], heic_px[1])
    np.testing.assert_array_equal(result[h:, w:], png_px)
    assert len(calls) == 2


def test_heic_header_without_decode_in_pass_one():
    """Pass 1 (headers) must not trigger the injected decode: the owned box
    parse answers get_header, so decode defers to the first pixel pull
    (superset over heic-decoder.ts:256-261 which decodes on getHeader)."""
    w, h = 32, 24
    container = make_heic_container(w, h)
    order = []

    def inject(data: bytes) -> np.ndarray:
        order.append("decode")
        return heic_tile_pixels(w, h, 7)

    def on_progress(done: int, total: int) -> None:
        order.append(("progress", done, total))

    out = concat_to_buffer({
        "inputs": [container],
        "layout": {"columns": 1},
        "decoder_options": {"custom_decoders": {"heic": inject}},
        "on_progress": on_progress,
    })
    assert order[0] == "decode"  # decode happened (once), during pass 2
    assert order.count("decode") == 1
    assert decode_png(out).shape == (h, w, 4)


def test_heic_positioned_mode_with_alpha():
    """HEIC sprite with alpha over a PNG background (positioned mode)."""
    from image_stitch_tpu import PositionedImage

    bg = np.zeros((64, 64, 4), np.uint8)
    bg[..., 0] = 200
    bg[..., 3] = 255
    sprite = np.zeros((16, 16, 4), np.uint8)
    sprite[..., 1] = 255
    sprite[..., 3] = 128

    container = make_heic_container(16, 16)
    out = concat_to_buffer({
        "inputs": [
            PositionedImage(x=0, y=0, source=make_png(bg)),
            PositionedImage(x=8, y=8, source=container),
        ],
        "layout": {"width": 64, "height": 64},
        "decoder_options": {"custom_decoders": {"heic": lambda d: sprite}},
    })
    result = decode_png(out)
    # Alpha-over oracle (pixel-ops.ts:705-734 semantics): a=128/255.
    a = 128 / 255.0
    exp_r = round(200 * 255 / 255.0 * (1 - a) * 255 / 255)  # dst over path
    px = result[12, 12]
    assert px[3] == 255
    assert abs(int(px[1]) - round(255 * a)) <= 1
    assert abs(int(px[0]) - exp_r) <= 1


@pytest.mark.skipif(not heic_backend_available(), reason="pillow-heif not installed")
def test_heic_pillow_heif_tier_e2e():  # pragma: no cover - env-dependent
    """Real-backend e2e for environments with pillow-heif installed."""
    import pillow_heif
    from PIL import Image

    arr = heic_tile_pixels(32, 32, 11)
    heif = pillow_heif.from_pillow(Image.fromarray(arr, "RGBA"))
    buf = io.BytesIO()
    heif.save(buf, quality=-1)  # lossless
    out = concat_to_buffer({"inputs": [buf.getvalue()], "layout": {"columns": 1}})
    assert decode_png(out).shape == (32, 32, 4)
