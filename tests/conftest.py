"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benching happens in bench.py; tests must pass on GPU-less/TPU-less
CI the way the reference's CI compiles without GPUs (.github/workflows/ci.yml).

NOTE: in this image jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon, so env vars are too late — we switch platforms through
jax.config before any computation runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The big-field EC graphs take minutes through LLVM at full opt on this
# single-core CI box; tests are correctness-only, so drop the backend opt
# level (results are identical, compiles ~2x faster).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: the big-field graphs take seconds each to build
jax.config.update("jax_compilation_cache_dir", "/tmp/sppark_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0x5BBA2C)
