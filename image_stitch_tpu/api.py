"""Public entry points.

Counterpart of the reference's ``src/image-concat.ts`` +
``src/image-concat-browser.ts`` surface: ``concat_to_buffer`` (:34),
``concat_to_stream`` (:38), ``concat_to_file`` (:43), ``concat_streaming``
and the ``StreamingConcatenator`` wrapper (:9-28), plus the deprecated
``concat`` alias (:50) and an array-in/array-out convenience
(``concat_arrays``) standing in for the browser's ``concatCanvases``
(image-concat-browser.ts:287-323 — canvases become numpy arrays here).
"""

from __future__ import annotations

import io
import os
import warnings
from typing import Any, Iterator, Mapping

import numpy as np

from .core import CoreStreamingConcatenator
from .types import ConcatOptions


class StreamingConcatenator:
    """Streaming facade (reference: NodeStreamingConcatenator,
    image-concat.ts:9-28). Iterate it, or pipe it to a writable."""

    def __init__(self, options: ConcatOptions | Mapping[str, Any]):
        self._core = CoreStreamingConcatenator(options)

    def __iter__(self) -> Iterator[bytes]:
        return self._core.stream()

    def stream(self) -> Iterator[bytes]:
        return self._core.stream()

    def to_stream(self, writable) -> None:
        """Write all chunks to a file-like object (demand-driven)."""
        for chunk in self._core.stream():
            writable.write(chunk)


def concat_streaming(options: ConcatOptions | Mapping[str, Any]) -> Iterator[bytes]:
    """Generator of encoded output chunks (reference: concatStreaming,
    image-concat-core.ts:1505-1511)."""
    return CoreStreamingConcatenator(options).stream()


def concat_to_buffer(options: ConcatOptions | Mapping[str, Any]) -> bytes:
    """Concatenate and return the full encoded file
    (reference: concatToBuffer, image-concat.ts:34-36)."""
    return b"".join(concat_streaming(options))


def concat_to_stream(options: ConcatOptions | Mapping[str, Any]):
    """Return a lazy byte-chunk iterator (reference: concatToStream,
    image-concat.ts:38-41 — Python's iterator protocol is the
    backpressure-pulling Readable here)."""
    return StreamingConcatenator(options)


def concat_to_file(
    options: ConcatOptions | Mapping[str, Any], path: str | os.PathLike
) -> None:
    """Stream output directly into a file (reference: concatToFile,
    image-concat.ts:43-45)."""
    with open(path, "wb") as f:
        for chunk in concat_streaming(options):
            f.write(chunk)


def concat(options: ConcatOptions | Mapping[str, Any]) -> bytes:
    """Deprecated alias of concat_to_buffer (reference: concat,
    image-concat.ts:50-52)."""
    warnings.warn(
        "concat() is deprecated; use concat_to_buffer()",
        DeprecationWarning,
        stacklevel=2,
    )
    return concat_to_buffer(options)


def concat_arrays(
    arrays: list[np.ndarray],
    layout: Mapping[str, int] | None = None,
    output: str = "array",
    **kwargs,
):
    """Array-native convenience (stand-in for the browser concatCanvases,
    image-concat-browser.ts:287-323): stitch (H, W, 3|4) uint8 arrays.

    ``output``: 'array' assembles the result directly into an (H, W, 4)
    array — bands come straight from the compositing pipeline with NO
    encode/decode round trip, matching concatCanvases rendering onto a
    canvas; 'png'/'jpeg' return encoded bytes.
    """
    inputs = list(arrays)
    opts: dict[str, Any] = {"inputs": inputs, "layout": dict(layout or {})}
    if output == "jpeg":
        opts["output_format"] = "jpeg"
    opts.update(kwargs)
    if output in ("png", "jpeg"):
        return concat_to_buffer(opts)
    from .core import CoreStreamingConcatenator

    core = CoreStreamingConcatenator(opts)
    return np.vstack(list(core.stream_bands()))


