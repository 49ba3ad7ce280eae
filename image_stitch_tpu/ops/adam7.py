"""Adam7 deinterlacing.

Counterpart of the reference's ``src/adam7.ts``: the 7 standard passes
(adam7.ts:23-31), per-pass defiltering with a pass-local previous row
(adam7.ts:75-92), and a scatter of pass pixels into the final image
(distributePassPixels, adam7.ts:115-155; sub-byte path :158-184). The
reference scatters one pixel at a time in JS; here each pass is defiltered as
a band and scattered with strided array assignment, and sub-byte depths go
through an unpack -> strided scatter -> repack path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import StitchError
from ..types import PngHeader
from ..utils import get_bytes_per_pixel, get_samples_per_pixel, scanline_byte_length
from .png_filter import defilter_band


@dataclass(frozen=True)
class Adam7Pass:
    x_start: int
    y_start: int
    x_step: int
    y_step: int


ADAM7_PASSES: tuple[Adam7Pass, ...] = (
    Adam7Pass(0, 0, 8, 8),
    Adam7Pass(4, 0, 8, 8),
    Adam7Pass(0, 4, 4, 8),
    Adam7Pass(2, 0, 4, 4),
    Adam7Pass(0, 2, 2, 4),
    Adam7Pass(1, 0, 2, 2),
    Adam7Pass(0, 1, 1, 2),
)


def get_pass_dimensions(width: int, height: int, p: Adam7Pass) -> tuple[int, int]:
    """Pass sub-image dimensions (reference: getPassDimensions, adam7.ts:36-44)."""
    pw = -(-(width - p.x_start) // p.x_step) if width > p.x_start else 0
    ph = -(-(height - p.y_start) // p.y_step) if height > p.y_start else 0
    return max(0, pw), max(0, ph)


def has_adam7_passes(header: PngHeader) -> bool:
    """True if interlaced (reference: hasAdam7Passes, adam7.ts:190-198)."""
    return header.interlace_method == 1


def _unpack_row_bits(rows: np.ndarray, width: int, bit_depth: int) -> np.ndarray:
    bits = np.unpackbits(rows, axis=1)
    per = bits.shape[1] // bit_depth
    units = bits[:, : per * bit_depth].reshape(rows.shape[0], per, bit_depth)
    weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
    return (units * weights).sum(axis=2).astype(np.uint8)[:, :width]


def _pack_row_bits(values: np.ndarray, bit_depth: int) -> np.ndarray:
    h, w = values.shape
    bits = (
        (values[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
    ).astype(np.uint8).reshape(h, w * bit_depth)
    return np.packbits(bits, axis=1)


def deinterlace_adam7(decompressed: bytes | np.ndarray, header: PngHeader) -> np.ndarray:
    """Deinterlace the full decompressed IDAT payload into raw (unfiltered)
    scanlines, row-major (reference: deinterlaceAdam7, adam7.ts:52-112).

    Returns (height, scanline_bytes) uint8 in the source pixel format.
    """
    data = np.frombuffer(bytes(decompressed), dtype=np.uint8) if not isinstance(
        decompressed, np.ndarray
    ) else decompressed
    bpp = get_bytes_per_pixel(header.bit_depth, header.color_type)
    samples = get_samples_per_pixel(header.color_type)
    row_bytes = scanline_byte_length(header.width, header.bit_depth, header.color_type)
    out = np.zeros((header.height, row_bytes), dtype=np.uint8)
    sub_byte = header.bit_depth < 8
    if sub_byte:
        out_vals = np.zeros((header.height, header.width), dtype=np.uint8)

    offset = 0
    for p in ADAM7_PASSES:
        pw, ph = get_pass_dimensions(header.width, header.height, p)
        if pw == 0 or ph == 0:
            continue
        pass_row_bytes = scanline_byte_length(pw, header.bit_depth, header.color_type)
        needed = ph * (1 + pass_row_bytes)
        if offset + needed > data.shape[0]:
            raise StitchError(
                f"Truncated interlaced data: pass needs {needed} bytes, "
                f"have {data.shape[0] - offset}"
            )
        block = data[offset : offset + needed].reshape(ph, 1 + pass_row_bytes)
        offset += needed
        # Native SIMD defilter when available (pass defilters dominated
        # small interlaced tiles at ~7 numpy calls each); same kernels and
        # bytes as the streaming decoder's band path.
        from ..native import defilter_units_native

        raw = defilter_units_native(block, pass_row_bytes, bpp, None)
        if raw is None:
            raw = defilter_band(block[:, 0], block[:, 1:], None, bpp)

        ys = slice(p.y_start, p.y_start + ph * p.y_step, p.y_step)
        if sub_byte:
            vals = _unpack_row_bits(raw, pw, header.bit_depth)
            out_vals[ys, p.x_start : p.x_start + pw * p.x_step : p.x_step] = vals
        else:
            # Scatter whole pixels: view pass rows as (ph, pw, bytes/pixel).
            bytes_per = samples * (2 if header.bit_depth == 16 else 1)
            src = raw[:, : pw * bytes_per].reshape(ph, pw, bytes_per)
            dst = out[ys].reshape(ph, header.width, bytes_per)
            dst[:, p.x_start : p.x_start + pw * p.x_step : p.x_step] = src
            out[ys] = dst.reshape(ph, row_bytes)

    if sub_byte:
        out = _pack_row_bits(out_vals, header.bit_depth)
        # Pad/trim to the exact scanline byte length.
        if out.shape[1] != row_bytes:
            fixed = np.zeros((header.height, row_bytes), dtype=np.uint8)
            fixed[:, : min(row_bytes, out.shape[1])] = out[:, :row_bytes]
            out = fixed
    return out
