"""Stitch a grid of images into one PNG or JPEG.

Usage: python examples/grid_stitch.py out.jpg a.png b.png c.jpg d.png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_stitch_tpu import concat_to_file

out, *inputs = sys.argv[1:]
concat_to_file(
    {
        "inputs": inputs,
        "layout": {"columns": 2},
        "outputFormat": "jpeg" if out.endswith((".jpg", ".jpeg")) else "png",
        "jpegQuality": 90,
        "backgroundColor": "white",
        "onProgress": lambda done, total: print(f"  {done}/{total} inputs done"),
    },
    out,
)
print(f"wrote {out}")
