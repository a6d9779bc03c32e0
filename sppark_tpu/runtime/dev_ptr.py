"""Device-resident handle (gpu_ptr_t/dev_ptr_t analogue, util/gpu_t.cuh:269).

jax Arrays are already refcounted device buffers; DevPtr adds the explicit
clone/drop lifecycle the reference exposes across FFI (clone_gpu_ptr_t /
drop_gpu_ptr_t, util/all_gpus.cpp:56-76) so the ffi layer can hand opaque
integer handles to foreign callers, plus device pinning on upload.
"""

from __future__ import annotations

import itertools
import threading
from typing import Any, Optional

import jax


class DevPtr:
    """Opaque handle over a device-resident pytree (points, twiddles, ...)."""

    _registry: dict = {}
    _ids = itertools.count(1)
    _lock = threading.Lock()

    def __init__(self, value: Any, device: Optional[Any] = None):
        if device is not None:
            value = jax.tree.map(lambda a: jax.device_put(a, device), value)
        self.value = value
        self.device = device
        with DevPtr._lock:
            self.handle = next(DevPtr._ids)
            DevPtr._registry[self.handle] = self
            self._refs = 1

    @classmethod
    def from_handle(cls, handle: int) -> "DevPtr":
        ptr = cls._registry.get(handle)
        if ptr is None:
            raise KeyError(f"dangling DevPtr handle {handle}")
        return ptr

    def clone(self) -> "DevPtr":
        """Bump the refcount and return self (clone_gpu_ptr_t semantics:
        shared underlying buffer, by-value handle)."""
        with DevPtr._lock:
            self._refs += 1
        return self

    def drop(self) -> None:
        with DevPtr._lock:
            self._refs -= 1
            if self._refs <= 0:
                DevPtr._registry.pop(self.handle, None)
                self.value = None
