"""Multi-chip stitching over a jax.sharding.Mesh.

Usage: python examples/multichip_mesh.py out.jpg [n_devices]

Passes ``mesh=N`` so the band programs (PNG filter-select / JPEG
restart-group entropy) run SPMD over a ('band', 'x') mesh; output bytes are
identical to single-chip. On a CPU-only machine export
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu first.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container may force a single-chip backend; honor a cpu request before
# the backend initializes (env vars alone are overridden).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from image_stitch_tpu import concat_to_buffer


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "mesh_out.jpg"
    n_devices = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if not n_devices:
        import jax

        n_devices = len(jax.devices())

    rng = np.random.default_rng(0)
    tiles = [
        (rng.integers(0, 256, (256, 256, 4), dtype=np.uint8))
        for _ in range(16)
    ]
    # PNG: every stage is integer math, so ANY sharding is byte-identical.
    png_opts = {"inputs": tiles, "layout": {"columns": 4}}
    sharded_png = concat_to_buffer({**png_opts, "mesh": n_devices})
    host_png = concat_to_buffer({**png_opts, "backend": "numpy"})
    assert sharded_png == host_png, "sharded PNG must be byte-identical"

    # JPEG: the exact integer DCT/quantize pipeline (ops/jpeg_dct) makes
    # bytes bit-identical across numpy/C++/XLA and ANY mesh by
    # construction — assert it, same as PNG.
    jpg_opts = {**png_opts, "outputFormat": "jpeg",
                "jpeg_restart_interval_rows": 1}
    sharded_jpg = concat_to_buffer({**jpg_opts, "mesh": n_devices})
    host_jpg = concat_to_buffer({**jpg_opts, "backend": "numpy"})
    assert sharded_jpg == host_jpg, "sharded JPEG must be byte-identical"
    with open(out_path, "wb") as f:
        f.write(sharded_jpg)
    print(f"PNG byte-identical across {n_devices} devices; wrote {out_path} "
          f"({len(sharded_jpg)} bytes, restart groups sharded per chip)")


if __name__ == "__main__":
    main()
