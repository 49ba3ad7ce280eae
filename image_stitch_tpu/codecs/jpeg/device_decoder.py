"""Device JPEG band decoder: host Huffman once, TPU pixel math per band.

SURVEY §2 native item 4 / build-plan step 6, replacing the reference's
sharp/jpeg-js decode (/root/reference/src/decoders/jpeg-decoder.ts:241-279)
with the split the blueprint plans: the serial entropy stage runs on the
host (codecs/jpeg/owned_decoder.decode_coefficients), everything after —
dequant, islow IDCT, fancy upsampling, color — runs as one fused XLA
program per band (ops/jpeg_idct_device), bit-identical to the host tiers.

Link economics: the upload is the band's ZIGZAG-PREFIX of quantized
coefficients in int16 — K leading zigzag positions where K is the image's
max nonzero index (bucketed to multiples of 8). Photo content at q85
keeps K around 16-32 and chroma subsampled, so ~0.5-1.5 B/px crosses the
link instead of 3-4 B/px of decoded RGBA — and the decoded band can stay
device-resident to feed the device compositor/encoder, so pixels never
cross the link at all in a JPEG -> JPEG pipeline.

Band windowing: vertical fancy (h2v2) upsampling reads one neighbor row
beyond each band edge, so the per-band component window includes one
extra row on the non-image-edge sides and the contaminated outputs are
cropped after upsampling; the filter's own edge replication then fires
only at TRUE image edges, which keeps every band bit-identical to the
whole-image decode (tested band-split-invariant).

Safety: the exact two-limb IDCT is proven for |coef * q| <= M_SAFE and
int16 transport needs |coef| < 2^15; streams outside either bound (only
reachable via hostile DC-accumulation games — legal baseline maxes at
2047) report ``safe == False`` and the caller stays on the host tier.
"""

from __future__ import annotations

import numpy as np

from ...errors import StitchError
from .owned_decoder import decode_coefficients
from .tables import ZIGZAG


def _band_window(y0: int, y1: int, comp_h: int, v_exp: int, fancy_v: bool):
    """Component-row window [wa, wb) needed for image rows [y0, y1), and
    the upsampled-window row offset of image row y0."""
    if v_exp == 1:
        wa, wb = y0, y1
        r0 = y0 - wa
    elif fancy_v:
        wa = max(0, y0 // 2 - 1)
        wb = min(comp_h, (y1 - 1) // 2 + 2)
        r0 = y0 - 2 * wa
    else:
        wa = y0 // v_exp
        wb = (y1 - 1) // v_exp + 1
        r0 = y0 - wa * v_exp
    return wa, wb, r0


def _decode_band_trace(comp_zz, qtabs, geoms, k_list, band_h, width, gray,
                       packed=False):
    """Fused band decode: per component (zz slice, q, static geometry) ->
    (band_h, width, 4) uint8 RGBA (opaque alpha), or — ``packed`` — the
    byte-identical (band_h, width) uint32 little-endian pack
    r | g<<8 | b<<16 | 255<<24, built by shifts/ORs on the int32 color
    planes so the program never pays the (H, W, 4) channel-interleave
    relayout (the device encoder's ycbcr_int ingests the packed form
    directly).

    geoms rows: (n_brows, bx, w0l, w1l, comp_w, h_exp, v_exp, r0).
    """
    import jax.numpy as jnp

    from ...ops.jpeg_idct_device import (
        decode_plane_trace,
        upsample_plane_x,
        ycc_to_rgb_planes_x,
        ycc_to_rgb_x,
    )

    planes = []
    for zz, q, geom, k in zip(comp_zz, qtabs, geoms, k_list):
        n_brows, bx, w0l, w1l, comp_w, h_exp, v_exp, r0 = geom
        plane = decode_plane_trace(zz, q, n_brows, bx, k, jnp)
        plane = plane[w0l:w1l, :comp_w]
        plane = upsample_plane_x(plane, h_exp, v_exp, jnp)
        planes.append(plane[r0 : r0 + band_h, :width])
    if packed:
        if gray:
            g = planes[0].astype(jnp.uint32)
            r, gg, b = g, g, g
        else:
            r, gg, b = ycc_to_rgb_planes_x(
                planes[0], planes[1], planes[2], jnp
            )
            r, gg, b = (c.astype(jnp.uint32) for c in (r, gg, b))
        return r | (gg << 8) | (b << 16) | jnp.uint32(0xFF000000)
    if gray:
        g = planes[0]
        rgb = jnp.stack([g, g, g], axis=-1)
    else:
        rgb = ycc_to_rgb_x(planes[0], planes[1], planes[2], jnp)
    alpha = jnp.full(rgb.shape[:2] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


_JIT = None


def _get_jit():
    """Module-level jit singleton: every decoder instance shares one
    compiled-program cache (a per-instance jax.jit would recompile the
    same band shapes for every tile of a grid)."""
    global _JIT
    if _JIT is None:
        import jax

        _JIT = jax.jit(
            _decode_band_trace,
            static_argnames=(
                "geoms", "k_list", "band_h", "width", "gray", "packed",
            ),
        )
    return _JIT


class DeviceJpegDecoder:
    """Host-Huffman-once, device-decode-per-band JPEG decoder."""

    def __init__(self, data: bytes):
        blocks, qtabs, geom, width, height = decode_coefficients(data)
        self.width = width
        self.height = height
        self._geom = geom  # (by, bx, comp_w, comp_h, h_exp, v_exp) per comp
        self._qtabs = [np.asarray(q, dtype=np.int32) for q in qtabs]
        zz_idx = np.asarray(ZIGZAG)
        self._zz_blocks: list[np.ndarray] = []
        self._k: list[int] = []
        self.safe = len(blocks) in (1, 3)
        for b, q in zip(blocks, self._qtabs):
            maxabs = int(np.abs(b).max()) if b.size else 0
            from ...ops.jpeg_idct_device import M_SAFE

            if maxabs >= (1 << 15) or maxabs * int(q.max()) > M_SAFE:
                self.safe = False
            zz = np.ascontiguousarray(b[:, zz_idx].astype(np.int16))
            # Image-wide zigzag prefix: K = max nonzero index + 1, bucketed
            # to a multiple of 8 (bounds the executable count; K is the
            # per-band upload's proportionality factor).
            nz = np.nonzero(zz.any(axis=0))[0]
            k = int(nz[-1]) + 1 if len(nz) else 1
            k = min(64, -(-k // 8) * 8)
            self._k.append(k)
            self._zz_blocks.append(zz)
        self._jit = _get_jit()

    def decode_band(self, y0: int, y1: int, return_device: bool = False,
                    packed: bool = False):
        """Decode image rows [y0, y1) to (y1-y0, width, 4) uint8 RGBA —
        a device-resident array when ``return_device``. ``packed`` emits
        the byte-identical (y1-y0, width) uint32 little-endian RGBA pack
        instead (device-side: skips the channel-interleave relayout; host
        returns are bitcast back to the uint8 view)."""
        if not (0 <= y0 < y1 <= self.height):
            raise StitchError(f"Invalid band range [{y0}, {y1})")
        import jax.numpy as jnp

        from ...ops.program_cache import note_program

        comp_zz, qtabs, geoms, k_list = [], [], [], []
        for zz, q, (by, bx, comp_w, comp_h, h_exp, v_exp), k in zip(
            self._zz_blocks, self._qtabs, self._geom, self._k
        ):
            fancy_v = v_exp == 2 and h_exp == 2 and comp_w > 2
            wa, wb, r0 = _band_window(y0, y1, comp_h, v_exp, fancy_v)
            bb, be = wa // 8, min(by, -(-wb // 8))
            n_brows = be - bb
            comp_zz.append(jnp.asarray(zz[bb * bx : be * bx, :k]))
            qtabs.append(jnp.asarray(q))
            geoms.append(
                (n_brows, bx, wa - bb * 8, wb - bb * 8, comp_w, h_exp,
                 v_exp, r0)
            )
            k_list.append(k)
        band_h = y1 - y0
        gray = len(comp_zz) == 1
        note_program(
            "jpeg_decode_band", tuple(geoms), tuple(k_list), band_h,
            self.width, gray, packed,
        )
        out = self._jit(
            tuple(comp_zz), tuple(qtabs), tuple(geoms), tuple(k_list),
            band_h, self.width, gray, packed,
        )
        if return_device:
            return out
        if packed:
            return (
                np.asarray(out).view(np.uint8).reshape(band_h, self.width, 4)
            )
        return np.asarray(out)

    def decode_full(self, band_height: int = 512) -> np.ndarray:
        """Whole image via banded device decode (host assembly)."""
        parts = [
            self.decode_band(y0, min(self.height, y0 + band_height))
            for y0 in range(0, self.height, band_height)
        ]
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
