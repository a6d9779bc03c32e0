"""sppark-tpu: TPU-native performance primitives for arguments of knowledge.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
supranational/sppark (README.md:3): multi-scalar multiplication (MSM),
number-theoretic transforms (NTT), low-degree extension (LDE) and polynomial
operations over the SNARK/STARK fields, designed TPU-first:

  - field elements live in limb-major ``(n_limbs, batch)`` u32 planes sized
    for the 8x128 VPU;
  - hot kernels are Pallas; orchestration is jit-compiled JAX;
  - multi-chip scaling uses ``jax.sharding`` meshes with psum/all_to_all
    collectives instead of per-device dispatch.
"""

from . import params
from .params import get_field, get_curve, FIELDS, CURVES
from .util.errors import SpparkError

__version__ = "0.1.0"

__all__ = [
    "params", "get_field", "get_curve", "FIELDS", "CURVES", "SpparkError",
    "__version__",
]
