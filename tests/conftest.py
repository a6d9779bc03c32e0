"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benching happens in bench.py; tests must pass on GPU-less/TPU-less
CI the way the reference's CI compiles without GPUs (.github/workflows/ci.yml).

NOTE: in this image jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon, so env vars are too late — we switch platforms through
jax.config before any computation runs.
"""

import os
import resource

# XLA/LLVM recurses deeply on big-field graphs; the default 8 MiB main-thread
# stack flakily segfaults mid-suite (Linux grows the main stack up to the
# rlimit, so raising it at runtime is effective).
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Trim the costliest LLVM passes (big-field EC graphs take minutes through
# LLVM on this single-core box).  Do NOT drop the backend opt level: at
# --xla_backend_optimization_level=0 the generated CODE is ~100x slower
# (loop bodies run essentially interpreted), which turns a 20-round MSM
# accumulate into minutes of runtime.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NOTE: the persistent compilation cache is intentionally NOT enabled here —
# executable serialization during cache writes segfaulted flakily on this
# jaxlib (jax/_src/compilation_cache.py:put_executable_and_time); the
# backend-opt-level-0 flag above keeps cold compiles acceptable instead.

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0x5BBA2C)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full-suite run accumulates ~17 GB of live jitted executables (big-field
    MSM/NTT graphs); past ~60 compiles the XLA CPU JIT segfaulted
    deterministically mid-compile (reproduced twice at the same test, never
    in any file run in isolation).  Clearing per module keeps the process
    state small at the cost of some recompiles within later modules."""
    yield
    jax.clear_caches()
