"""HEIC decoder plugin (host-side, gated on an available backend).

Counterpart of the reference's ``src/decoders/heic-decoder.ts``: HEIC has no
cheap header-without-decode path, so ``get_header`` triggers the full decode
(reference has the same wart: parseHeicHeader stub at heic-decoder.ts:256-261,
getHeader :326-360). Backend tiers mirror the reference's
sharp → heic-decode/libheif-js ladder (:266-285): here pillow-heif (libheif)
when installed, else a custom-injected decoder, else a clear error. Decode
happens once, then rows stream out in bands (:362-380).
"""

from __future__ import annotations

import io
import os
from typing import Iterator

import numpy as np

from ..errors import StitchError
from ..types import DecoderOptions, ImageHeader

DEFAULT_BAND_HEIGHT = 256


def heic_backend_available() -> bool:
    try:
        import pillow_heif  # noqa: F401

        return True
    except ImportError:
        return False


def decode_heic_to_rgba(data: bytes, options: DecoderOptions | None = None) -> np.ndarray:
    options = options or DecoderOptions()
    custom = (options.custom_decoders or {}).get("heic")
    if custom is not None:
        return np.asarray(custom(data), dtype=np.uint8)
    try:
        import pillow_heif
        from PIL import Image

        pillow_heif.register_heif_opener()
        img = Image.open(io.BytesIO(data))
        return np.array(img.convert("RGBA"))
    except ImportError as exc:
        raise StitchError(
            "HEIC decoding requires a backend: install pillow-heif, or inject "
            "a decoder via DecoderOptions(custom_decoders={'heic': fn}) "
            "(reference parity: optional sharp/heic-decode peers, "
            "heic-decoder.ts:266-285)",
            exc,
        ) from exc


class HeicDecoder:
    """Decode-once-then-stream HEIC decoder (reference: heic-decoder.ts:286-435)."""

    format = "heic"

    def __init__(self, source, options: DecoderOptions | None = None):
        self._options = options or DecoderOptions()
        if isinstance(source, (str, os.PathLike)):
            with open(source, "rb") as f:
                self._data = f.read()
        elif isinstance(source, (bytes, bytearray, memoryview)):
            self._data = bytes(source)
        elif isinstance(source, np.ndarray):
            self._data = source.tobytes()
        elif hasattr(source, "read"):
            self._data = source.read()
        else:
            raise StitchError(f"Unsupported HEIC source type: {type(source).__name__}")
        self._pixels: np.ndarray | None = None
        self._band_height = self._options.band_height or DEFAULT_BAND_HEIGHT

    def _decode(self) -> np.ndarray:
        if self._pixels is None:
            self._pixels = decode_heic_to_rgba(self._data, self._options)
        return self._pixels

    def get_header(self) -> ImageHeader:
        """Requires full decode — HEIC header parsing is a container-format
        rabbit hole the reference also skips (heic-decoder.ts:256-261)."""
        pixels = self._decode()
        return ImageHeader(
            width=pixels.shape[1],
            height=pixels.shape[0],
            channels=4,
            bit_depth=8,
            format="heic",
        )

    def bands(self, band_height: int | None = None) -> Iterator[np.ndarray]:
        band_height = band_height or self._band_height
        pixels = self._decode()
        h, w = pixels.shape[:2]
        flat = pixels.reshape(h, w * 4)
        for y0 in range(0, h, band_height):
            yield flat[y0 : y0 + band_height]

    def scanlines(self) -> Iterator[np.ndarray]:
        for band in self.bands():
            for row in band:
                yield row

    def close(self) -> None:
        self._pixels = None


class HeicFileDecoder(HeicDecoder):
    """File-path HEIC decoder (reference parity)."""


class HeicBufferDecoder(HeicDecoder):
    """Byte-buffer HEIC decoder (reference parity)."""


def heic_plugin():
    """(reference: heicDecoder plugin, heic-decoder.ts:437-460)."""
    from .registry import DecoderPlugin

    return DecoderPlugin(
        format="heic",
        create=lambda source, options=None: HeicDecoder(source, options),
    )
