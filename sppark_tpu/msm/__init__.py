"""Pippenger MSM layer (msm/ directory analogue)."""

from .pippenger import MSMContext, mult_pippenger, demont_scalar_words

__all__ = ["MSMContext", "mult_pippenger", "demont_scalar_words"]
