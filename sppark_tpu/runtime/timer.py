"""Wall-clock device timing (cuda_timer_t analogue, util/cuda_timer_t.cuh).

XLA dispatch is async; the stop() fence is block_until_ready — the same
role as the cudaEvent pair.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax


class DeviceTimer:
    def __init__(self):
        self._t0: Optional[float] = None
        self.elapsed_ms: float = 0.0

    def start(self) -> "DeviceTimer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, fence: Any = None) -> float:
        """Stop; `fence` (array/pytree) is blocked on first so queued device
        work is included, like recording the stop event after the kernel."""
        if fence is not None:
            jax.block_until_ready(fence)
        assert self._t0 is not None, "timer not started"
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        return self.elapsed_ms

    def __repr__(self):
        return f"{self.elapsed_ms:.3f} ms"
