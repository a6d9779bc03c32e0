"""Mesh construction helpers (role of gpus_t/select_gpu, util/all_gpus.cpp).

The reference enumerates CUDA devices and hands out per-device handles;
here the unit of scale-out is a jax Mesh over however many chips the
process sees (one slice) or `jax.distributed` gives it (multi-host).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "shards"

_DISTRIBUTED = {"initialized": False}


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host runtime initialization (jax.distributed wrapper).

    The reference has NO multi-device communication design (SURVEY §2.10 —
    independent GPUs addressed by device_id); this is the sppark-tpu
    scale-out entry point: call once per host before building meshes, after
    which `jax.devices()` spans the whole slice/pod and `make_mesh()`
    produces a global mesh whose collectives ride ICI within a slice and
    DCN across slices.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods all three are auto-detected by jax.distributed itself.  Safe to
    call when single-process (no coordinator configured): it no-ops so the
    same program runs on one host or many.  Returns the process count.
    """
    if _DISTRIBUTED["initialized"]:
        return jax.process_count()
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    npros = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", 0) or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", -1))
    if addr is None and npros == 0:
        return 1                      # single-process run: nothing to do
    kwargs = {}
    if addr is not None:
        kwargs = dict(coordinator_address=addr, num_processes=npros,
                      process_id=max(pid, 0))
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED["initialized"] = True
    return jax.process_count()


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
