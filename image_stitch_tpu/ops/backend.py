"""Compute backends for the band pipeline.

The orchestrator is backend-agnostic: ``numpy`` (the host oracle — float64
semantics identical to the reference's JS) and ``tpu``/``jax`` (device
compute: vectorized filter selection and JPEG DCT/quantization on the
accelerator via XLA/Pallas; see :mod:`image_stitch_tpu.ops.device`).

Both backends are bit-exact for everything the reference's grid mode does
(pure integer math); see ops/device.py for the alpha-blend exactness notes.
"""

from __future__ import annotations

import numpy as np

from .pixel import band_to_bytes
from .png_filter import filter_select_band


class NumpyBackend:
    """Host-side oracle backend. The async API is the sync one (compute on
    submit, identity on wait) so the orchestrator has one pipeline shape."""

    name = "numpy"

    def png_filter_band(
        self, canvas: np.ndarray, prev_row: np.ndarray | None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Filter-select a canvas band.

        ``canvas``: (H, W, 4) uint8/uint16. ``prev_row``: previous *raw* row
        bytes (W*bpp,) or None. Returns (filter_types (H,), filtered rows
        (H, W*bpp), last raw row (W*bpp,)) — the carry for the next band.
        """
        bpp = 8 if canvas.dtype == np.uint16 else 4
        raw = band_to_bytes(canvas)
        from ..native import filter_select_band_native

        native = filter_select_band_native(raw, prev_row, bpp)
        if native is not None:
            types, filtered = native
        else:
            types, filtered = filter_select_band(raw, prev_row, bpp)
        return types, filtered, raw[-1]

    def png_filter_band_async(self, canvas, prev_row):
        return self.png_filter_band(canvas, prev_row)

    @staticmethod
    def png_filter_band_wait(pending):
        return pending


_BACKENDS: dict[str, object] = {}

# Below this many canvas pixels the per-call XLA dispatch overhead beats the
# device win; host numpy is faster end-to-end.
AUTO_DEVICE_THRESHOLD_PIXELS = 1 << 21


def resolve_backend_name(name: str, canvas_pixels: int | None = None) -> str:
    """Map option strings to a concrete backend.

    'auto' policy: use the device for large canvases when either the host
    C++ tier is unavailable or STITCH_TPU_PREFER_DEVICE=1 is set. On
    PCIe-attached TPU VMs set the env var — the fused device pipeline wins
    by a wide margin there; on high-latency tunneled links the host native
    tier is faster end-to-end (see CLAUDE.md measurements).
    """
    import os

    key = {"oracle": "numpy", "tpu": "jax"}.get(name, name)
    if key == "auto":
        big = (
            canvas_pixels is not None
            and canvas_pixels >= AUTO_DEVICE_THRESHOLD_PIXELS
        )
        if big and os.environ.get("STITCH_TPU_PREFER_DEVICE") == "1":
            return "jax"
        if big:
            from ..native import native_available

            if not native_available():
                return "jax"
        return "numpy"
    return key


def get_backend(name: str, canvas_pixels: int | None = None):
    """'oracle'/'numpy' -> NumpyBackend; 'tpu'/'jax' -> JaxBackend;
    'auto' -> sized choice."""
    key = resolve_backend_name(name, canvas_pixels)
    if key not in _BACKENDS:
        if key == "numpy":
            _BACKENDS[key] = NumpyBackend()
        elif key == "jax":
            from .device import JaxBackend

            _BACKENDS[key] = JaxBackend()
        else:
            raise ValueError(f"Unknown backend: {name}")
    return _BACKENDS[key]
