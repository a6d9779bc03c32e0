"""Pippenger MSM layer (msm/ directory analogue)."""

from .pippenger import MSMContext, mult_pippenger, demont_scalar_words
from .batch_addition import batch_addition

__all__ = ["MSMContext", "mult_pippenger", "demont_scalar_words",
           "batch_addition"]
