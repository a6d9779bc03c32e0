"""Elliptic-curve point layer (ec/affine_t.hpp, jacobian_t.hpp, xyzz_t.hpp).

Vectorized, branchless point arithmetic over JAX field arrays; see
ec/core.py for the representation contract.
"""

from .core import CurveOps, get_curve_ops, tree_take, tree_concat

__all__ = ["CurveOps", "get_curve_ops", "tree_take", "tree_concat"]
