"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
fused programs must produce bit-identical results to the single-device
trace (XLA inserts the halo collectives from the sharding annotations)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_stitch_tpu.codecs.jpeg.tables import quality_scaled_tables
from image_stitch_tpu.ops.fused import (
    assemble_uniform_grid,
    fused_grid_dual_step,
    fused_grid_jpeg_step,
    fused_grid_png_step,
)
from image_stitch_tpu.parallel.mesh import (
    make_mesh,
    run_multichip_demo,
    shard_grid_dual_step,
    shard_grid_jpeg_step,
    shard_grid_png_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tiles_fixture(gy=2, gx=8, th=16, tw=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (gy, gx, th, tw, 4), dtype=np.uint8))


def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("band", "x")
    single = make_mesh(1)
    assert single.devices.size == 1


def test_assemble_uniform_grid_layout():
    tiles = tiles_fixture(2, 4, 8, 8, 1)
    canvas = assemble_uniform_grid(tiles)
    assert canvas.shape == (16, 32, 4)
    np.testing.assert_array_equal(
        np.asarray(canvas[0:8, 8:16]), np.asarray(tiles[0, 1])
    )
    np.testing.assert_array_equal(
        np.asarray(canvas[8:16, 24:32]), np.asarray(tiles[1, 3])
    )


def test_sharded_png_step_matches_single_device():
    tiles = tiles_fixture()
    prev = jnp.zeros((8 * 16 * 4,), jnp.uint8)
    mesh = make_mesh(8)
    sharded = shard_grid_png_step(mesh)(tiles, prev)
    local = jax.jit(fused_grid_png_step)(tiles, prev)
    for a, b in zip(sharded, local):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_jpeg_step_matches_single_device():
    tiles = tiles_fixture(seed=2)
    lq, cq = quality_scaled_tables(85)
    mesh = make_mesh(8)
    sharded = shard_grid_jpeg_step(mesh)(tiles, jnp.asarray(lq), jnp.asarray(cq))
    local = jax.jit(fused_grid_jpeg_step)(tiles, jnp.asarray(lq), jnp.asarray(cq))
    for a, b in zip(sharded, local):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_dual_step_runs_on_2d_mesh():
    out = run_multichip_demo(8, gy=2, gx=8, th=16, tw=16)
    ftypes, filtered, last, yb, cbb, crb = out
    assert filtered.shape == (2 * 16, 8 * 16 * 4)
    assert yb.shape[1] == 64


def test_sharded_on_subset_of_devices():
    # Meshes smaller than the device count must also work (2x2).
    mesh = make_mesh(4)
    tiles = tiles_fixture(2, 4, 8, 8, 3)
    prev = jnp.zeros((4 * 8 * 4,), jnp.uint8)
    sharded = shard_grid_png_step(mesh)(tiles, prev)
    local = jax.jit(fused_grid_png_step)(tiles, prev)
    np.testing.assert_array_equal(np.asarray(sharded[1]), np.asarray(local[1]))


@pytest.mark.parametrize("n", [6, 8])
def test_multichip_demo_scales_tile_grid_to_mesh(n):
    """run_multichip_demo must divide its demo tile grid by whatever
    (band, x) factoring make_mesh picks — n=6 factors as (2, 3), which the
    old fixed gy=2/gx=8 demo could not shard (fuzz-found at n=16: gy=2 vs
    band=4)."""
    from image_stitch_tpu.parallel.mesh import run_multichip_demo

    out = run_multichip_demo(n, gy=2, gx=8, th=16, tw=16)
    assert out is not None
