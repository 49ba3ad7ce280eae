"""Output-side property fuzz: VALID inputs through the public API must
produce outputs an independent codec (PIL) decodes back to exactly the
expected composition.

The input-corruption fuzz (test_corruption_fuzz.py) covers hostile inputs;
this suite covers the dual failure class — a clean run emitting a subtly
invalid or wrong stream. The deflate length-limiter bug (over-subscribed
Huffman codes on exponentially skewed literal frequencies; fixed in
stitchnative.cpp defl_build_lengths) shipped a whole round without being
caught precisely because only corrupt INPUTS were fuzzed: banded-noise
content produced PNG outputs zlib rejected with 'invalid literal/lengths
set'.

Content classes are chosen to stress the encoders: k-bit banded noise
(skews literal frequencies), full noise (incompressible; stored blocks +
literal-run skip), gradients (match-heavy), solids (RLE-extreme), and
mixes. STITCH_TPU_BIG_FUZZ=1 widens the sweep (~500 cases).
"""

import io
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from utils.fixtures import png_from_array

from image_stitch_tpu import concat_to_buffer

N_SEEDS = 500 if os.environ.get("STITCH_TPU_BIG_FUZZ") else 24


def _content(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    kind = rng.integers(0, 6)
    if kind == 0:  # k-bit banded noise (the Kraft-bug content class)
        k = int(rng.integers(1, 8))
        base = int(rng.integers(0, 256 - (1 << k)))
        return (rng.integers(0, 1 << k, (h, w, 4)) + base).astype(np.uint8)
    if kind == 1:  # full-range noise (incompressible)
        return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    if kind == 2:  # smooth gradient (match-heavy after filtering)
        x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
        y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
        out = np.empty((h, w, 4), np.uint8)
        out[:, :, 0] = x.astype(np.uint8)
        out[:, :, 1] = y.astype(np.uint8)
        out[:, :, 2] = ((x + y) / 2).astype(np.uint8)
        out[:, :, 3] = 255
        return out
    if kind == 3:  # solid
        return np.full((h, w, 4), rng.integers(0, 256, 4, dtype=np.uint8)[None, None])
    if kind == 4:  # exponentially skewed symbol histogram (deep Huffman tree)
        vals = (rng.exponential(8.0, (h, w, 4)) % 256).astype(np.uint8)
        return vals
    # mixed: gradient + sparse noise speckles
    out = _content_grad(h, w)
    mask = rng.random((h, w)) < 0.05
    out[mask] = rng.integers(0, 256, (int(mask.sum()), 4), dtype=np.uint8)
    return out


def _content_grad(h: int, w: int) -> np.ndarray:
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    out = np.empty((h, w, 4), np.uint8)
    out[:, :, 0] = x.astype(np.uint8)
    out[:, :, 1] = 128
    out[:, :, 2] = (255 - x).astype(np.uint8)
    out[:, :, 3] = 255
    return out


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_png_roundtrip_exact(seed):
    from PIL import Image

    rng = np.random.default_rng(1000 + seed)
    cols = int(rng.integers(1, 5))
    rows = int(rng.integers(1, 4))
    tw = int(rng.integers(8, 200))
    th = int(rng.integers(8, 200))
    tiles_arr = [_content(rng, th, tw) for _ in range(cols * rows)]
    tiles = [png_from_array(a) for a in tiles_arr]
    opts = {
        "inputs": tiles,
        "layout": {"columns": cols},
        "bandHeight": int(rng.integers(4, 300)),
        "pngCompressionLevel": int(rng.choice([1, 6, 9])),
        "hostThreads": int(rng.choice([1, 4])),
    }
    if rng.random() < 0.2:
        opts["pngCompressionStrategy"] = "rle"
    out = concat_to_buffer(opts)
    arr = np.asarray(Image.open(io.BytesIO(out)))
    assert arr.shape == (rows * th, cols * tw, 4)
    for i, tile in enumerate(tiles_arr):
        r, c = divmod(i, cols)
        np.testing.assert_array_equal(
            arr[r * th : (r + 1) * th, c * tw : (c + 1) * tw], tile,
            err_msg=f"seed {seed} tile {i}",
        )


@pytest.mark.parametrize("seed", range(0, N_SEEDS, 3))
def test_jpeg_roundtrip_close(seed):
    from PIL import Image

    rng = np.random.default_rng(5000 + seed)
    cols = int(rng.integers(1, 4))
    tw = int(rng.integers(16, 160))
    th = int(rng.integers(16, 160))
    # JPEG closeness only holds for smooth content; use gradients + solids
    tiles_arr = []
    for _ in range(cols * 2):
        if rng.random() < 0.5:
            tiles_arr.append(_content_grad(th, tw))
        else:
            tiles_arr.append(
                np.full((th, tw, 4), rng.integers(30, 220, 4, dtype=np.uint8)[None, None])
            )
    tiles = [png_from_array(a) for a in tiles_arr]
    opts = {
        "inputs": tiles,
        "layout": {"columns": cols},
        "outputFormat": "jpeg",
        "jpegQuality": int(rng.choice([70, 85, 95])),
        "bandHeight": int(rng.integers(8, 200)),
        "jpegRestartIntervalRows": int(rng.choice([0, 1, 3])),
    }
    out = concat_to_buffer(opts)
    arr = np.asarray(Image.open(io.BytesIO(out)).convert("RGB")).astype(np.int16)
    exp = np.concatenate(
        [np.concatenate(tiles_arr[r * cols : (r + 1) * cols], axis=1) for r in range(2)],
        axis=0,
    )[:, :, :3].astype(np.int16)
    assert arr.shape == exp.shape
    err = np.abs(arr - exp)
    assert float(np.mean(err)) < 4.0, f"seed {seed}: mean err {float(np.mean(err)):.2f}"


@pytest.mark.parametrize("seed", range(0, N_SEEDS, 2))
def test_png_roundtrip_color_types_exact(seed):
    """Same property across 8-bit input color types: grayscale, gray+alpha,
    RGB, RGBA. Expected pixels come from PIL decoding each input tile
    independently (the oracle), composed on the documented conversion rules
    (all-same-type grids keep the common format trivial). 16-bit paths are
    excluded here because PIL's 16-bit modes don't round-trip faithfully as
    a naive oracle — the dedicated suites (test_pngsuite.py high-byte
    comparisons, goldens) cover those."""
    from PIL import Image

    rng = np.random.default_rng(9000 + seed)
    channels, depth = [
        (1, 8), (2, 8), (3, 8), (4, 8)
    ][int(rng.integers(0, 4))]
    cols = int(rng.integers(1, 4))
    tw = int(rng.integers(8, 96))
    th = int(rng.integers(8, 96))
    n = cols * int(rng.integers(1, 3))
    hi = 256 if depth == 8 else 65536
    dt = np.uint8 if depth == 8 else np.uint16
    tiles_arr = [
        rng.integers(0, hi, (th, tw, channels)).astype(dt).squeeze()
        for _ in range(n)
    ]
    tiles = [png_from_array(a.reshape(th, tw, channels) if a.ndim == 2 else a,
                            bit_depth=depth) for a in tiles_arr]
    out = concat_to_buffer({
        "inputs": tiles,
        "layout": {"columns": cols},
        "bandHeight": int(rng.integers(4, 120)),
        "hostThreads": int(rng.choice([1, 4])),
    })
    img = Image.open(io.BytesIO(out))
    # Compare via PIL's independent decode of each input tile, promoted to
    # the output's mode.
    arr = np.asarray(img)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        exp = np.asarray(Image.open(io.BytesIO(tile)).convert(img.mode))
        got = arr[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
        np.testing.assert_array_equal(
            got, exp, err_msg=f"seed {seed} tile {i} ct={channels} depth={depth}"
        )


@pytest.mark.filterwarnings("ignore::UserWarning")  # expected clip warnings
@pytest.mark.parametrize("seed", range(0, N_SEEDS, 2))
def test_positioned_roundtrip_exact(seed):
    """Positioned mode with random sprites, alpha, z-order, clipping and
    negative offsets: output must equal the float64 oracle compositor
    (ops/pixel.composite_band placed back-to-front)."""
    from PIL import Image

    from image_stitch_tpu import PositionedImage
    from image_stitch_tpu.ops.pixel import composite_band

    rng = np.random.default_rng(12000 + seed)
    cw = int(rng.integers(40, 200))
    ch = int(rng.integers(40, 160))
    n = int(rng.integers(1, 7))
    sprites = []
    for i in range(n):
        sw = int(rng.integers(8, 80))
        sh = int(rng.integers(8, 80))
        arr = rng.integers(0, 256, (sh, sw, 4), dtype=np.uint8)
        if rng.random() < 0.3:
            arr[:, :, 3] = 255  # opaque fast path
        x = int(rng.integers(-20, cw - 4))
        y = int(rng.integers(-20, ch - 4))
        z = int(rng.integers(0, 4)) if rng.random() < 0.7 else None
        sprites.append((arr, x, y, z, i))
    inputs = [
        PositionedImage(x=x, y=y, source=png_from_array(arr), z_index=z)
        for arr, x, y, z, _i in sprites
    ]
    out = concat_to_buffer({
        "inputs": inputs,
        "layout": {"width": cw, "height": ch},
        "bandHeight": int(rng.integers(4, 100)),
        "hostThreads": int(rng.choice([1, 4])),
    })
    arr_out = np.asarray(Image.open(io.BytesIO(out)))
    # Oracle: reference z semantics — default z_index is the INPUT INDEX
    # (positioned-layout :184), ties broken by input index.
    exp = np.zeros((ch, cw, 4), np.uint8)
    ordered = sorted(sprites, key=lambda s: (s[3] if s[3] is not None else s[4], s[4]))
    for sp, x, y, _z, _i in ordered:
        sh, sw = sp.shape[:2]
        sx0, sy0 = max(0, -x), max(0, -y)
        dx0, dy0 = max(0, x), max(0, y)
        dx1, dy1 = min(cw, x + sw), min(ch, y + sh)
        if dx1 <= dx0 or dy1 <= dy0:
            continue
        sub = sp[sy0 : sy0 + dy1 - dy0, sx0 : sx0 + dx1 - dx0]
        composite_band(exp[dy0:dy1, dx0:dx1], sub, 0, True)
    np.testing.assert_array_equal(arr_out, exp, err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", range(0, N_SEEDS, 2))
def test_jpeg_encoder_fuzz_decodable_and_structured(seed):
    """Randomized owned-encoder sweep: size x quality x sampling x restart
    cadence on mixed content. Every output must parse as exactly one
    SOI..EOI stream, decode through PIL, and stay within a quality-scaled
    error bound on smooth content."""
    from PIL import Image

    rng = np.random.default_rng(15000 + seed)
    w = int(rng.integers(8, 150))
    h = int(rng.integers(8, 150))
    arr = _content_grad(h, w)
    q = int(rng.choice([30, 60, 85, 95, 100]))
    opts = {
        "inputs": [png_from_array(arr)],
        "layout": {"columns": 1},
        "outputFormat": "jpeg",
        "jpegQuality": q,
        "jpegSampling": str(rng.choice(["444", "420"])),
        "bandHeight": int(rng.integers(8, 120)),
        "jpegRestartIntervalRows": int(rng.choice([0, 1, 2, 5])),
    }
    out = concat_to_buffer(opts)
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"
    assert out.count(b"\xff\xd8") >= 1 and out[2:].count(b"\xff\xd8\xff\xe0") == 0
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB")).astype(np.int16)
    exp = arr[:, :, :3].astype(np.int16)
    bound = 3.0 if q >= 85 else 14.0
    assert float(np.abs(dec - exp).mean()) < bound, f"seed {seed} q{q}"
