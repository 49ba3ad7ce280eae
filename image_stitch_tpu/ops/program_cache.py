"""Bounded executable-cache hygiene for long-lived device services.

XLA compiles ONE executable per distinct jitted input shape. The device
compositor buckets canvas shapes (W to 256-multiples, H to pow2), but the
encode programs cannot be bucketed — the output bytes depend on the true
band widths — so an adversarial long-running mixed-shape stream
accumulates executables without bound until LLVM itself fails with
"Cannot allocate memory" (observed in the round-3 mesh soak; the soak's
manual mitigation was a periodic jax.clear_caches()).

This module makes that mitigation automatic and production-default: every
device program dispatch registers its signature (program name + input
shape + static parameters); once the number of DISTINCT signatures since
the last flush exceeds ``STITCH_TPU_PROGRAM_CACHE_LIMIT`` (default 128,
0 disables), ``jax.clear_caches()`` drops the jit executables and the
counter resets. Recompiles after a flush are cheap: the persistent
on-disk compilation cache (ops/device.py) still holds every lowered
program, so only the in-process executable wrappers are rebuilt.

Steady-shape pipelines (the common case: one band shape per stream) never
hit the limit — a flush can only trigger on genuinely shape-diverse
workloads, exactly the ones that OOM otherwise.
"""

from __future__ import annotations

import os
import threading

_seen: set = set()
_flushes: int = 0
_lock = threading.Lock()


def _limit() -> int:
    return int(os.environ.get("STITCH_TPU_PROGRAM_CACHE_LIMIT", "128"))


def note_program(*signature) -> None:
    """Register a device-program dispatch signature; flush the jit
    executable caches when the distinct-signature count exceeds the limit.
    """
    limit = _limit()
    if limit <= 0:
        return
    with _lock:
        _seen.add(signature)
        if len(_seen) <= limit:
            return
        _seen.clear()
        global _flushes
        _flushes += 1
    import jax

    jax.clear_caches()


def flush_count() -> int:
    """Number of automatic cache flushes so far (observability/tests)."""
    return _flushes
