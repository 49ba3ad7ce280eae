"""Free-form composite: background + sprites with z-order and alpha.

Usage: python examples/positioned_composite.py out.png bg.png sprite.png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_stitch_tpu import PositionedImage, concat_to_file

out, bg, sprite = sys.argv[1:4]
concat_to_file(
    {
        "inputs": [
            PositionedImage(x=0, y=0, source=bg),
            PositionedImage(x=40, y=30, source=sprite, z_index=10),
            PositionedImage(x=80, y=60, source=sprite, z_index=5),
        ],
        "layout": {},  # canvas auto-sized to max(x+w), max(y+h)
        "enableAlphaBlending": True,
    },
    out,
)
print(f"wrote {out}")
