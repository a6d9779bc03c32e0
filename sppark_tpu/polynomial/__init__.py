"""Polynomial kernels (polynomial/ directory analogue).

All three reference kernels are prefix-scan shaped cooperative CUDA kernels;
on TPU they become `jax.lax.associative_scan` / `lax.scan` dataflow:

  * prefix_op        — grid-wide inclusive scan with Add/Multiply
                       (polynomial/prefix_op.cuh:17-47, 324-397)
  * div_by_x_minus_z — synthetic division by (x - z) as a reverse Horner
                       suffix scan (polynomial/div_by_x_minus_z.cuh:22-121)
  * evaluate         — multi-point Horner evaluation via powers-of-x scans
                       and a tree dot-reduction (polynomial/evaluate.cuh)
"""

from .core import prefix_op, prefix_sum, prefix_product, div_by_x_minus_z, \
    evaluate

__all__ = ["prefix_op", "prefix_sum", "prefix_product", "div_by_x_minus_z",
           "evaluate"]
