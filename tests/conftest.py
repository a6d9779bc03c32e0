"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benching happens in bench.py; tests must pass on GPU-less/TPU-less
CI the way the reference's CI compiles without GPUs (.github/workflows/ci.yml).
"""

import os

# Must be set before jax imports anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0x5BBA2C)
