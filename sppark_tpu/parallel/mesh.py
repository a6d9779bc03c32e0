"""Mesh construction helpers (role of gpus_t/select_gpu, util/all_gpus.cpp).

The reference enumerates CUDA devices and hands out per-device handles;
here the unit of scale-out is a jax Mesh over however many chips the
process sees (one slice) or `jax.distributed` gives it (multi-host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "shards"


def make_mesh(devices: Optional[Sequence] = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def local_mesh(n: Optional[int] = None, axis: str = AXIS) -> Mesh:
    """Mesh over the first n local devices (n defaults to all)."""
    devs = jax.devices()
    if n is not None:
        if n > len(devs):
            raise ValueError(f"requested {n} devices, have {len(devs)}")
        devs = devs[:n]
    return make_mesh(devs, axis)
