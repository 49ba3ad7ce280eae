"""Pipeline "models" — the deployable compute graphs of this framework.

This domain has no neural models; the framework's equivalents of "model
families" are its end-to-end device programs, assembled from ops/ the way a
model is assembled from layers:

- :func:`fused_grid_dual_step` — the flagship: uniform-grid compose + PNG
  filter-select + JPEG DCT/quantize in one XLA program (ops/fused.py).
- :func:`jpeg_encode_band_trace` — the full JPEG band encoder incl.
  on-device entropy packing (ops/jpeg_entropy_device.py).
- :class:`DeviceJpegEncoder` — the streaming wrapper with device-resident
  carry state.
- sharded variants over a ``("band", "x")`` mesh (parallel/mesh.py).

Re-exported here so deployment code has one import point for the compute
graphs, mirroring a models/ package in a training framework.
"""

from ..ops.fused import (
    assemble_uniform_grid,
    fused_grid_dual_step,
    fused_grid_jpeg_step,
    fused_grid_png_step,
)
from ..ops.jpeg_entropy_device import (
    DeviceJpegEncoder,
    entropy_pack_trace,
    entropy_pack_trace_v2,
    jpeg_encode_band_trace,
)
from ..ops.device import filter_select_trace, jpeg_quantize_trace
from ..parallel.mesh import (
    make_mesh,
    shard_grid_dual_step,
    shard_grid_jpeg_step,
    shard_grid_png_step,
)

__all__ = [
    "assemble_uniform_grid",
    "fused_grid_dual_step",
    "fused_grid_jpeg_step",
    "fused_grid_png_step",
    "DeviceJpegEncoder",
    "entropy_pack_trace",
    "entropy_pack_trace_v2",
    "jpeg_encode_band_trace",
    "filter_select_trace",
    "jpeg_quantize_trace",
    "make_mesh",
    "shard_grid_dual_step",
    "shard_grid_jpeg_step",
    "shard_grid_png_step",
]
