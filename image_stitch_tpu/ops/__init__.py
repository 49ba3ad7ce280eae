"""Pixel/compute ops: numpy oracles + device (XLA/Pallas) band programs.

Oracle forms define semantics (ops/pixel.py, ops/png_filter.py, ops/adam7.py);
device forms (ops/device.py, ops/fused.py, ops/jpeg_entropy_device.py,
ops/pallas_kernels.py) are verified against them — exact for integer paths,
byte-exact for entropy coding.
"""
