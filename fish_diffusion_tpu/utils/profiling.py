"""Profiling utilities — the tracing subsystem the reference lacks
(SURVEY.md §5 "no profiler integration in the main path").

- ``profile_trace``: context manager around ``jax.profiler`` writing a
  Perfetto/XProf trace directory (open with TensorBoard's profile plugin or
  ui.perfetto.dev)
- ``StepTimer``: rolling per-step wall-time stats for the train loop
- ``device_memory_report``: per-device live HBM usage from
  ``jax.Device.memory_stats()`` (the OOM-debugging view torch users get from
  ``torch.cuda.memory_summary``)
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: str = "logs/profile", create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {log_dir}")


def device_memory_report(devices=None) -> str:
    """Human-readable per-device HBM usage table.

    Uses ``Device.memory_stats()`` where the backend provides it (TPU does);
    falls back to live-buffer accounting via ``jax.live_arrays`` elsewhere.
    """
    import jax

    devices = devices if devices is not None else jax.devices()
    lines = ["device               in-use       peak        limit"]
    for d in devices:
        stats = d.memory_stats() if hasattr(d, "memory_stats") else None
        if stats:
            in_use = stats.get("bytes_in_use", 0)
            peak = stats.get("peak_bytes_in_use", 0)
            limit = stats.get("bytes_limit", 0)
        else:
            in_use = sum(
                a.nbytes for a in jax.live_arrays() if d in a.devices()
            )
            peak = limit = 0
        fmt = lambda b: f"{b / 2**20:9.1f}MB" if b else "        --"
        lines.append(
            f"{str(d):<20} {fmt(in_use)} {fmt(peak)} {fmt(limit)}"
        )
    return "\n".join(lines)


class StepTimer:
    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def mean_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)
