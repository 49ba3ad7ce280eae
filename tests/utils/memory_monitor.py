"""Heap sampling around an operation.

Counterpart of the reference's tests/utils/memory-monitor.ts: sample RSS
every ~50ms during the op with a forced GC before/after (:77-126), assert
budgets (assertMemoryBelow :135) and the streaming-efficiency invariant
peak <= 15x output size (:213-234).
"""

from __future__ import annotations

import gc
import os
import threading
import time
from dataclasses import dataclass


def _rss_bytes() -> int:
    with open(f"/proc/{os.getpid()}/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")


@dataclass
class MemoryReport:
    baseline: int
    peak: int
    samples: int

    @property
    def peak_delta(self) -> int:
        return max(0, self.peak - self.baseline)


def monitor_memory(fn, interval: float = 0.05):
    """Run ``fn`` while sampling RSS; returns (result, MemoryReport)."""
    gc.collect()
    baseline = _rss_bytes()
    peak = baseline
    samples = 0
    stop = threading.Event()

    def sampler():
        nonlocal peak, samples
        while not stop.is_set():
            peak = max(peak, _rss_bytes())
            samples += 1
            time.sleep(interval)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    try:
        result = fn()
    finally:
        stop.set()
        t.join(timeout=2.0)
    peak = max(peak, _rss_bytes())
    gc.collect()
    return result, MemoryReport(baseline=baseline, peak=peak, samples=samples)


def assert_memory_below(report: MemoryReport, limit_bytes: int, label: str = "") -> None:
    assert report.peak_delta < limit_bytes, (
        f"{label}: peak memory delta {report.peak_delta / 1e6:.1f} MB "
        f"exceeds limit {limit_bytes / 1e6:.1f} MB"
    )


def assert_streaming_efficiency(
    report: MemoryReport, output_bytes: int, factor: float = 15.0, floor: int = 64 << 20
) -> None:
    """Peak delta <= factor x output size (with an allocator-noise floor)
    (reference: assertStreamingEfficiency, memory-monitor.ts:213-234)."""
    limit = max(factor * output_bytes, floor)
    assert report.peak_delta <= limit, (
        f"streaming efficiency violated: peak delta {report.peak_delta / 1e6:.1f} MB "
        f"> {factor}x output ({output_bytes / 1e6:.1f} MB)"
    )
