"""JAX/TPU field arithmetic layer (the reference's ff/ directory).

``get_jax_field(name)`` returns a cached field-ops object for any field in
sppark_tpu.params.FIELDS, choosing the right limb engine:

  * <= 32-bit primes -> Mont32Field (or Mersenne31Field's direct reduction)
  * Goldilocks       -> GoldilocksField (2x u32 words, 2^64 ≡ 2^32-1 trick)
  * everything else  -> BigMontField (L x 16-bit limb planes)
"""

from __future__ import annotations

import functools

from ..params import FieldParams, get_field
from .base import BaseField
from .mont32 import Mont32Field, Mersenne31Field
from .gl64 import GoldilocksField
from .bigmont import BigMontField
from .ext import Fp2Field, BabyBear4Field

__all__ = [
    "BaseField", "Mont32Field", "Mersenne31Field", "GoldilocksField",
    "BigMontField", "Fp2Field", "BabyBear4Field", "get_jax_field",
]


@functools.lru_cache(maxsize=None)
def _build(params: FieldParams) -> BaseField:
    if params.engine == "bigmont":
        return BigMontField(params)
    if params.name.startswith("mersenne31"):
        return Mersenne31Field(params)
    if params.modulus == (1 << 64) - (1 << 32) + 1:
        return GoldilocksField(params)
    if params.bits <= 32:
        return Mont32Field(params)
    return BigMontField(params)


def get_jax_field(name_or_params) -> BaseField:
    params = (name_or_params if isinstance(name_or_params, FieldParams)
              else get_field(name_or_params))
    return _build(params)
