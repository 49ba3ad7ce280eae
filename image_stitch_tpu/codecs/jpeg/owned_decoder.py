"""Owned (from-scratch) baseline JPEG decoder — host Huffman + device IDCT.

Tier-2 decoder used when PIL is unavailable or ``force_owned`` is set,
mirroring the reference's jpeg-js fallback (jpeg-decoder.ts:250-262).

Implemented in codecs/jpeg/owned_decoder.py milestone; currently gated.
"""

from __future__ import annotations

import numpy as np

from ...errors import StitchError


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (H, W, 3) uint8 RGB."""
    raise StitchError(
        "Owned JPEG decoder not yet available in this build; "
        "PIL tier is required for JPEG decode"
    )
