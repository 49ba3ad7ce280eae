"""Shared helpers for the device benchmarking scripts.

The bench band (gradient + uniform noise in [-10, 10], opaque alpha) is
synthesized ON DEVICE by default: the device-resident protocols then need
only KB-scale transfers (tables + one dependent scalar fetch), so they
yield numbers in ANY link window where the chip answers — a 16 MB band
upload was the budget-killer on degraded tunnels (0.1 MB/s h2d observed
=> ~160 s for the band alone). Pass ``host=True`` (TIME_HOST_BAND=1 in
the scripts) only to A/B against archived numbers measured with the
host-RNG content.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


NOISE_AMP = 12
"""Noise amplitude calibrated against REAL bench content (r5 A/B,
scripts/ab_synth_vs_real.py): band 4 of the production grid_jpeg canvas
codes at 1.982 bits/px; uniform +-12 noise on the gradient base gives
1.934 bits/px (+-10 gave 1.588, a 20% friendlier stream). The program's
ms/band is content-INSENSITIVE (real 15.03 vs synth 14.90 ms same
window, 0.9%), but the artifact's device row should still time
production-density content."""


def make_bench_band(band_h: int, canvas_w: int, host: bool = False):
    """(band_h, canvas_w, 4) uint8 bench band, device-resident."""
    if host:
        rng = np.random.default_rng(0)
        base = np.linspace(0, 255, canvas_w, dtype=np.float32)
        band_np = np.empty((band_h, canvas_w, 4), np.uint8)
        band_np[..., 0] = base[None, :].astype(np.uint8)
        band_np[..., 1] = 128
        band_np[..., 2] = base[None, ::-1].astype(np.uint8)
        band_np[..., 3] = 255
        band_np[:, :, :3] = np.clip(
            band_np[:, :, :3].astype(np.int16)
            + rng.integers(-NOISE_AMP, NOISE_AMP + 1, (band_h, canvas_w, 3)),
            0, 255,
        ).astype(np.uint8)
        return jax.device_put(jnp.asarray(band_np), jax.devices()[0])

    def synth_band():
        base = jnp.floor(jnp.linspace(0.0, 255.0, canvas_w)).astype(jnp.int16)
        r = jnp.broadcast_to(base[None, :], (band_h, canvas_w))
        g = jnp.full((band_h, canvas_w), 128, jnp.int16)
        b = jnp.broadcast_to(base[::-1][None, :], (band_h, canvas_w))
        rgb = jnp.stack([r, g, b], axis=-1)
        noise = jax.random.randint(
            jax.random.PRNGKey(0), (band_h, canvas_w, 3),
            -NOISE_AMP, NOISE_AMP + 1, jnp.int16,
        )
        rgb = jnp.clip(rgb + noise, 0, 255).astype(jnp.uint8)
        alpha = jnp.full((band_h, canvas_w, 1), 255, jnp.uint8)
        return jnp.concatenate([rgb, alpha], axis=-1)

    band = jax.jit(synth_band)()
    band.block_until_ready()
    return band
