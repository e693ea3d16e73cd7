"""Tracing / profiling hooks.

Reference parity: percivaltts has no profiling subsystem beyond wall-clock
prints and a system/GPU info dump (SURVEY.md §5 "Tracing/profiling"). The
TPU rebuild provides: ``jax.profiler`` trace capture around training steps
(viewable in TensorBoard/Perfetto), a lightweight per-step timer that feeds
the JSONL metrics log, and a device/system info dump.
"""

from __future__ import annotations

import contextlib
import os
import platform
import time
from typing import Dict, Iterator, Optional

import jax

from percivaltts_tpu.utils.logging import print_log


def system_info() -> Dict[str, object]:
    """Device/system info dump (reference: the GPU-info print in utils)."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "devices": [str(d) for d in devs],
        "device_count": len(devs),
        "process_count": jax.process_count(),
        "python": platform.python_version(),
        "jax": jax.__version__,
        "host": platform.node(),
        "cpus": os.cpu_count(),
    }


@contextlib.contextmanager
def trace(workdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace into ``workdir/traces`` (TensorBoard /
    Perfetto readable). Wrap a few steady-state steps, not the whole run."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(workdir, "traces")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print_log(f"profiler trace written to {trace_dir}")


class StepTimer:
    """Per-step wall-clock timing with jitter stats for the metrics log."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.count = 0
        self.total = 0.0
        self.max = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.count += 1
        self.total += dt
        self.max = max(self.max, dt)
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def summary(self) -> Dict[str, float]:
        return {"steps": self.count, "mean_s": self.mean, "max_s": self.max}
