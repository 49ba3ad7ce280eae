"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is single-process with no distributed backend (SURVEY §2
"Parallelism & communication": no NCCL/MPI/Gloo; its only concurrency is
interleaved async generators). The TPU build *introduces* parallel structure
rather than porting one:

- mesh axis ``"band"`` — data parallelism over canvas row-bands. PNG
  filter-selection carries only a 1-row dependency between bands, and JPEG
  blocks are fully independent, so band parallelism is near-embarrassing;
  the 1-row halo rides ICI as a collective-permute XLA inserts from the
  sharding annotations.
- mesh axis ``"x"`` — spatial parallelism across canvas width (the
  tensor-parallel analog). Filter candidates need a bytes-per-pixel left
  halo; XLA again inserts the halo exchange automatically from the shifted
  slices inside the program.

No hand-written collectives: the program is written once (ops/fused.py,
ops/device.py) and resharded by annotation — the scaling-book recipe
(pick a mesh, annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fused import fused_grid_dual_step, fused_grid_jpeg_step, fused_grid_png_step


def make_mesh(
    n_devices: int | None = None, axes: tuple[str, ...] = ("band", "x")
) -> Mesh:
    """Build a mesh over available devices.

    With 2 axes the device list is factored as evenly as possible
    (band-major). With 1 axis all devices go to that axis.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        from ..errors import StitchError

        raise StitchError(
            f"mesh requests {n} devices but only {len(devices)} are "
            f"available (jax.devices())"
        )
    devices = devices[:n]
    if len(axes) == 1:
        return Mesh(np.array(devices), axes)
    # Factor n into (band, x) as near-square as possible.
    b = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            b = cand
            break
    return Mesh(np.array(devices).reshape(b, n // b), axes)


def shard_grid_png_step(mesh: Mesh):
    """Jit the fused PNG step with tiles sharded over both mesh axes:
    tile rows over 'band' (dp) and tile columns over 'x' (spatial/tp)."""
    tiles_sharding = NamedSharding(mesh, P("band", "x", None, None, None))
    prev_sharding = NamedSharding(mesh, P())
    return jax.jit(
        fused_grid_png_step,
        in_shardings=(tiles_sharding, prev_sharding),
        out_shardings=NamedSharding(mesh, P()),
    )


def shard_grid_jpeg_step(mesh: Mesh):
    tiles_sharding = NamedSharding(mesh, P("band", "x", None, None, None))
    q_sharding = NamedSharding(mesh, P())
    return jax.jit(
        fused_grid_jpeg_step,
        in_shardings=(tiles_sharding, q_sharding, q_sharding),
        out_shardings=NamedSharding(mesh, P()),
    )


def shard_grid_dual_step(mesh: Mesh):
    """The full forward step (PNG + JPEG encoders off one canvas), sharded."""
    tiles_sharding = NamedSharding(mesh, P("band", "x", None, None, None))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fused_grid_dual_step,
        in_shardings=(tiles_sharding, rep, rep, rep),
        out_shardings=rep,
    )


def run_multichip_demo(n_devices: int, gy: int = 2, gx: int = 8, th: int = 16, tw: int = 16):
    """Compile + execute the sharded dual step on tiny shapes.

    Used by __graft_entry__.dryrun_multichip with N virtual CPU devices to
    prove the multi-chip sharding compiles and runs. The demo tile grid is
    scaled up so both mesh axes divide it, whatever (band, x) factoring
    make_mesh picks for ``n_devices``.
    """
    from ..codecs.jpeg.tables import quality_scaled_tables

    mesh = make_mesh(n_devices)
    band_n, x_n = mesh.shape["band"], mesh.shape["x"]
    gy = -(-gy // band_n) * band_n  # round up to a band-axis multiple
    gx = -(-gx // x_n) * x_n  # round up to an x-axis multiple
    step = shard_grid_dual_step(mesh)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.integers(0, 256, size=(gy, gx, th, tw, 4), dtype=np.uint8)
    )
    prev = jnp.zeros((gx * tw * 4,), dtype=jnp.uint8)
    lq, cq = quality_scaled_tables(85)
    out = step(tiles, prev, jnp.asarray(lq), jnp.asarray(cq))
    jax.block_until_ready(out)
    return out
