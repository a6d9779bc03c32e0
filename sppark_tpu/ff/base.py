"""Common JAX field interface.

Design (SURVEY.md §7 "Field representation"): field elements live in
**limb-major u32 planes** — shape ``(n_limbs, *batch)`` (or just ``(*batch,)``
for single-word fields) — so that the batch axis is minor and fills the
8x128 VPU lanes, while limb indexing is static sublane addressing.  All ops
are pure jittable functions over these arrays; a field object only carries
static constants.

This replaces the reference's register-level field classes
(ff/mont_t.cuh:33, ff/mont32_t.cuh:19, ff/gl64_t.cuh:39) whose parallelism
axis was the CUDA thread; ours is the vector lane.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FieldParams


class BaseField:
    """Shared helpers; subclasses provide add/sub/neg/mul and layout.

    Public ring ops are jit-wrapped per instance: a big-field mul unrolls to
    ~10^3 primitive ops, far too many for eager dispatch; under jit each
    (op, shape) traces once and runs as one XLA computation.  Calls from
    inside an enclosing jit simply inline.
    """

    #: number of u32 planes (0 => plain (*batch,) array)
    n_limbs: int = 0
    #: bits carried per limb plane (16 for big fields, 32 for gl64 words)
    limb_bits: int = 32

    _JIT_OPS = ("add", "sub", "neg", "mul", "sqr", "inv")

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.modulus

    def _finalize(self):
        """Wrap hot ops in jax.jit (call at the end of subclass __init__)."""
        for name in self._JIT_OPS:
            setattr(self, name, jax.jit(getattr(self, name)))
        self._pow_cache = {}
        _orig_pow = type(self).pow_const

        def pow_const(x, e: int, _self=self, _orig=_orig_pow):
            fn = _self._pow_cache.get(e)
            if fn is None:
                fn = jax.jit(lambda v: _orig(_self, v, e))
                _self._pow_cache[e] = fn
            return fn(x)

        self.pow_const = pow_const

    # -- subclass responsibilities -----------------------------------------
    def add(self, x, y):  # pragma: no cover - interface
        raise NotImplementedError

    def sub(self, x, y):  # pragma: no cover - interface
        raise NotImplementedError

    def neg(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def mul(self, x, y):  # pragma: no cover - interface
        raise NotImplementedError

    def to_int_list(self, arr) -> list:  # pragma: no cover - interface
        raise NotImplementedError

    def from_int_list(self, values, batch_shape=None):  # pragma: no cover
        raise NotImplementedError

    # -- defaults -----------------------------------------------------------
    def sqr(self, x):
        return self.mul(x, x)

    def select(self, cond, x, y):
        """Branchless per-element select (csel, ff/mont_t.cuh:574-594).

        `cond` is a boolean array over the *batch* shape; limb planes
        broadcast against it.
        """
        if self.n_limbs:
            cond = jnp.broadcast_to(cond, x.shape[1:])[None]
        return jnp.where(cond, x, y)

    def zeros(self, batch_shape: tuple):
        shape = ((self.n_limbs,) if self.n_limbs else ()) + tuple(batch_shape)
        return jnp.zeros(shape, jnp.uint32)

    def is_zero(self, x):
        if self.n_limbs:
            return jnp.all(x == 0, axis=0)
        return x == 0

    def eq(self, x, y):
        if self.n_limbs:
            return jnp.all(x == y, axis=0)
        return x == y

    # wire value of 1 (Montgomery one for Montgomery-wire fields)
    def one_wire_int(self) -> int:
        return (self.params.one_mont if self.params.montgomery_wire
                else 1)

    def ones(self, batch_shape: tuple):
        return self.from_int_list(
            [self.params.from_mont(self.params.one_mont)
             if self.params.montgomery_wire else 1],
            batch_shape=batch_shape, broadcast=True)

    def const(self, value: int, batch_shape: tuple = ()):
        """Broadcast a canonical int constant into wire/device form."""
        return self.from_int_list([value % self.p], batch_shape=batch_shape,
                                  broadcast=True)

    # -- exponentiation / inversion -----------------------------------------
    def pow_const(self, x, e: int):
        """x^e for a static integer exponent, via an MSB-first scan ladder
        (pow_byref, ff/pow.hpp:24-75 — but log-depth graph instead of an
        unrolled chain)."""
        if e == 0:
            return self.ones(x.shape[1:] if self.n_limbs else x.shape)
        bits = np.array([int(b) for b in bin(e)[2:]], dtype=np.bool_)
        if len(bits) == 1:
            return x

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(jnp.asarray(bit), self.mul(acc, x), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, x, jnp.asarray(bits[1:]))
        return acc

    def inv(self, x):
        """Fermat inversion x^(p-2); maps 0 -> 0 (zero-tolerant, the same
        contract as ff/batch_inversion.hpp:18-52)."""
        return self.pow_const(x, self.p - 2)

    def batch_inv(self, x, axis: int = -1):
        """Montgomery-trick batch inversion along a batch axis using
        prefix/suffix products (log-depth scans) and ONE Fermat inversion.

        Zero-tolerant: zero inputs produce zero outputs without poisoning
        the chain (ff/batch_inversion.hpp:18-52).
        """
        batch_axis = axis if axis >= 0 else (x.ndim + axis)
        if self.n_limbs and batch_axis == 0:
            raise ValueError("axis 0 is the limb axis")
        one = jnp.broadcast_to(
            self.ones(x.shape[1:] if self.n_limbs else x.shape), x.shape)
        zero_mask = self.is_zero(x)
        safe = self.select(zero_mask, one, x)
        pre = jax.lax.associative_scan(self.mul, safe, axis=batch_axis)
        suf = jax.lax.associative_scan(self.mul, safe, axis=batch_axis,
                                       reverse=True)
        # total product == last prefix; invert once
        n = x.shape[batch_axis]
        total = jax.lax.index_in_dim(pre, n - 1, axis=batch_axis,
                                     keepdims=True)
        total_inv = self.inv(total)
        # inv[i] = pre[i-1] * suf[i+1] * total_inv
        pre_shift = jnp.roll(pre, 1, axis=batch_axis)
        pre_shift = _set_index(pre_shift, 0, one, batch_axis)
        suf_shift = jnp.roll(suf, -1, axis=batch_axis)
        suf_shift = _set_index(suf_shift, n - 1, one, batch_axis)
        out = self.mul(self.mul(pre_shift, suf_shift),
                       jnp.broadcast_to(total_inv, x.shape))
        return self.select(zero_mask, jnp.zeros_like(x), out)

    # -- host conversion helpers ---------------------------------------------
    def rand_ints(self, rng, n: int) -> list:
        return [rng.randrange(self.p) for _ in range(n)]


def _set_index(arr, idx: int, value, axis: int):
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(idx, idx + 1)
    return arr.at[tuple(sl)].set(
        jax.lax.slice_in_dim(value, idx, idx + 1, axis=axis)
        if value.shape == arr.shape else value)
