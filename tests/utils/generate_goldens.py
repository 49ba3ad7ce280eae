"""Regenerate golden outputs (regression anchors, not independent truth —
same caveat as the reference's generate-expected-outputs.js).

Run: python tests/utils/generate_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from image_stitch_tpu import PositionedImage, concat_to_buffer
from tests.utils.fixtures import gradient_png, png_from_array, random_rgba, solid_png

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "fixtures", "goldens")


def cases():
    g1 = [png_from_array(random_rgba(40, 30, s)) for s in range(4)]
    yield "example1_grid_columns.png", {
        "inputs": g1, "layout": {"columns": 2}, "backend": "numpy",
    }
    yield "example2_rows_background.png", {
        "inputs": [gradient_png(33, 21), solid_png(20, 40, (0, 200, 100, 255)),
                   gradient_png(25, 25)],
        "layout": {"rows": 2}, "backgroundColor": "#336699AA", "backend": "numpy",
    }
    yield "example3_positioned_alpha.png", {
        "inputs": [
            PositionedImage(x=0, y=0, source=solid_png(50, 50, (255, 0, 0, 255))),
            PositionedImage(x=20, y=15, source=solid_png(40, 30, (0, 0, 255, 128))),
            PositionedImage(x=-10, y=35, source=solid_png(30, 30, (0, 255, 0, 200)), z_index=9),
        ],
        "layout": {"width": 70, "height": 60}, "backend": "numpy",
    }
    yield "example4_grid.jpg", {
        "inputs": [png_from_array(random_rgba(32, 32, 7)),
                   gradient_png(32, 32)],
        "layout": {"columns": 2}, "outputFormat": "jpeg", "jpegQuality": 85,
        "backend": "numpy",
    }
    yield "example5_16bit.png", {
        "inputs": [png_from_array((random_rgba(24, 24, 9).astype(np.uint16)) * 257,
                                   bit_depth=16),
                   png_from_array(random_rgba(24, 24, 10))],
        "layout": {"columns": 2}, "backend": "numpy",
    }


def main() -> None:
    import warnings

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, opts in cases():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            data = concat_to_buffer(opts)
        path = os.path.join(GOLDEN_DIR, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
