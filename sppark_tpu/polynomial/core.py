"""Prefix-scan shaped polynomial kernels on JAX arrays.

The reference implements these as grid-cooperative CUDA kernels with warp
`add_up`/`mul_up`/`madd_up` scans (ff/shfl.cuh:62-129,
polynomial/div_by_x_minus_z.cuh:22-39).  The TPU formulation is pure
dataflow: `associative_scan` gives the log-depth scans and XLA maps the
lane parallelism onto the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import get_field, FieldParams
from ..ff import get_jax_field


def _field(field):
    name = field.name if isinstance(field, FieldParams) else str(field)
    return get_field(name), get_jax_field(name)


def _scan_axis(F, x):
    return x.ndim - 1


# ---------------------------------------------------------------------------
# prefix_op (polynomial/prefix_op.cuh)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def _prefix_dev(field_name: str, x, op: str):
    F = get_jax_field(field_name)
    fn = F.add if op == "add" else F.mul
    return jax.lax.associative_scan(fn, x, axis=_scan_axis(F, x))


def prefix_op(field, x, op: str = "add"):
    """Inclusive prefix scan along the last axis; `op` in {add, multiply}
    (the Add/Multiply operation templates, prefix_op.cuh:18-47)."""
    name = field.name if isinstance(field, FieldParams) else str(field)
    if op not in ("add", "multiply"):
        raise ValueError(f"op must be add|multiply, got {op!r}")
    return _prefix_dev(name, x, op)


def prefix_sum(field, x):
    return prefix_op(field, x, "add")


def prefix_product(field, x):
    return prefix_op(field, x, "multiply")


# ---------------------------------------------------------------------------
# div_by_x_minus_z (polynomial/div_by_x_minus_z.cuh)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3))
def _div_dev(field_name: str, coeffs, z, rotate: bool):
    """Synthetic (Ruffini) division of sum_i c_i x^i by (x - z).

    d_k = c_k + z * d_{k+1} with d_n = 0; quotient q_k = d_{k+1} and the
    remainder p(z) = d_0.  Computed as a reverse associative scan over
    (value, z-power) pairs: combining segments L (low degrees) then R,
      V = V_L + z^|L| * V_R,   P = P_L * P_R,
    the exact pairing of the reference's hierarchical z-power scans
    (div_by_x_minus_z.cuh:41-121) without the grid choreography.
    """
    F = get_jax_field(field_name)
    axis = _scan_axis(F, coeffs)
    n = coeffs.shape[-1]
    zb = jnp.broadcast_to(z, coeffs.shape)

    def combine(a, b):
        # with reverse=True the FIRST argument is the segment nearer the
        # high-degree end; the combined base sits in `b` (lower degrees):
        # V = v_b + z^|b| * v_a
        v_a, p_a = a
        v_b, p_b = b
        return (F.add(v_b, F.mul(p_b, v_a)), F.mul(p_a, p_b))

    d, _ = jax.lax.associative_scan(combine, (coeffs, zb), axis=axis,
                                    reverse=True)
    # d[k] = sum_{j>=k} c_j z^(j-k); quotient q_k = d[k+1], remainder d[0]
    rem = jax.lax.slice_in_dim(d, 0, 1, axis=axis)
    quot = jax.lax.slice_in_dim(d, 1, n, axis=axis)
    zero = jax.lax.slice_in_dim(jnp.zeros_like(coeffs), 0, 1, axis=axis)
    if rotate:
        # remainder lands at [0] (rev_ptr_t indexing, div_by_x_minus_z.cuh:156)
        return jnp.concatenate([rem, quot], axis=axis)
    return jnp.concatenate([quot, zero], axis=axis), rem


def div_by_x_minus_z(field, coeffs, z, rotate: bool = False):
    """Divide the coefficient array by (x - z).

    rotate=False: returns (quotient zero-padded to n, remainder p(z)).
    rotate=True : returns one array [remainder, quotient...] in place —
    the reference's in-place rotate layout."""
    name = field.name if isinstance(field, FieldParams) else str(field)
    return _div_dev(name, coeffs, z, rotate)


# ---------------------------------------------------------------------------
# evaluate (polynomial/evaluate.cuh)
# ---------------------------------------------------------------------------

# per-pass live-element budget for evaluate (n * B); the reference bounds
# this the same way with its N-points-per-pass template (evaluate.cuh:330)
_EVAL_PASS_ELEMS = 1 << 22


def _evaluate_batched(field_name: str, coeffs, xs):
    """p(x_i) for a batch of points: per-point powers ladder via an
    associative mul-scan (the powers-of-x grid scan, evaluate.cuh) and a
    log-tree dot reduction (per-warp redux, evaluate.cuh:32-47)."""
    F = get_jax_field(field_name)
    n = coeffs.shape[-1]
    npts = xs.shape[-1]

    def one_point(x_elem):
        # x_elem: single field element (leading limb planes, no batch)
        xb = jnp.broadcast_to(
            x_elem[..., None] if F.n_limbs else x_elem[None],
            coeffs.shape)
        # powers[j] = x^j: shift the mul-scan right by one (x^0 = 1)
        pows = jax.lax.associative_scan(F.mul, xb, axis=xb.ndim - 1)
        # pows[j] = x^(j+1); we need x^j: p(x) = c0 + sum_{j>=1} c_j x^j
        terms = F.mul(coeffs, jnp.roll(pows, 1, axis=-1))
        c0 = jax.lax.slice_in_dim(coeffs, 0, 1, axis=coeffs.ndim - 1)
        terms = jnp.concatenate(
            [c0, jax.lax.slice_in_dim(terms, 1, n, axis=terms.ndim - 1)],
            axis=-1)
        # tree reduction
        size = n
        acc = terms
        while size > 1:
            half = size // 2
            lo = jax.lax.slice_in_dim(acc, 0, half, axis=acc.ndim - 1)
            hi = jax.lax.slice_in_dim(acc, half, 2 * half, axis=acc.ndim - 1)
            rest = (jax.lax.slice_in_dim(acc, 2 * half, size,
                                         axis=acc.ndim - 1)
                    if size % 2 else None)
            acc = F.add(lo, hi)
            if rest is not None:
                acc = jnp.concatenate([acc, rest], axis=-1)
                size = half + 1
            else:
                size = half
        return acc[..., 0]

    # bound live memory to O(n * B) by processing B points per pass (the
    # reference batches N points per pass for exactly this reason,
    # evaluate.cuh:330-333): vmapping ALL points at once materializes the
    # full O(n * npts) powers ladder
    B = max(1, min(npts, _EVAL_PASS_ELEMS // max(n, 1)))
    if B >= npts:
        return jax.vmap(one_point, in_axes=-1, out_axes=-1)(xs)
    nb = -(-npts // B)
    pad = nb * B - npts
    xs_p = jnp.pad(xs, ((0, 0),) * (xs.ndim - 1) + ((0, pad),),
                   mode="edge") if pad else xs
    xs_b = jnp.moveaxis(
        xs_p.reshape(xs_p.shape[:-1] + (nb, B)), -2, 0)   # (nb, limb?, B)
    out_b = jax.lax.map(
        jax.vmap(one_point, in_axes=-1, out_axes=-1), xs_b)
    if F.n_limbs:
        out = jnp.moveaxis(out_b, 0, -2)       # (limb, nb, B)
        out = out.reshape(out.shape[:-2] + (nb * B,))
    else:
        out = out_b.reshape((nb * B,))
    return out[..., :npts]


@functools.partial(jax.jit, static_argnums=(0,))
def _evaluate_dev(field_name: str, coeffs, xs):
    return _evaluate_batched(field_name, coeffs, xs)


def evaluate(field, coeffs, xs):
    """Evaluate the polynomial given by `coeffs` (last axis = degree) at
    each point in `xs` (last axis = points)."""
    name = field.name if isinstance(field, FieldParams) else str(field)
    return _evaluate_dev(name, coeffs, xs)
