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


def barrier(x):
    """optimization_barrier over a pytree of field values — CPU backend only.

    XLA's CPU emitter for fusions inside while/scan bodies emits one
    `alwaysinline` helper per operand USE; multi-use (diamond) dataflow
    then inlines exponentially in LLVM — a chain of a dozen field muls
    never finishes compiling, and bodies that do compile re-evaluate
    shared subexpressions per use (measured 32 s/iteration vs 2 ms for
    one MSM bucket round at (6, 512) lanes).  Pinning each field-op
    result to a buffer keeps both compile and runtime linear.

    On TPU the (XLA-TPU/Mosaic) emitters share subexpressions properly,
    so this is the identity there — fusion stays intact on the perf
    path."""
    if jax.default_backend() != "cpu":
        return x
    return jax.lax.optimization_barrier(x)


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
        """Wrap hot ops in jax.jit (call at the end of subclass __init__).

        Each op result additionally passes through `barrier` (no-op on
        TPU) so that arbitrarily long field-op chains inside lax loop
        bodies compile linearly on the CPU test backend (see barrier)."""
        for name in self._JIT_OPS:
            fn = jax.jit(getattr(self, name))

            def wrapped(*args, _fn=fn):
                return barrier(_fn(*args))

            setattr(self, name, wrapped)
        self._pow_cache = {}
        _orig_pow = type(self).pow_const

        def pow_const(x, e: int, _self=self, _orig=_orig_pow):
            fn = _self._pow_cache.get(e)
            if fn is None:
                fn = jax.jit(lambda v: _orig(_self, v, e))
                _self._pow_cache[e] = fn
            return barrier(fn(x))

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
            return barrier(acc), None

        acc, _ = jax.lax.scan(body, x, jnp.asarray(bits[1:]))
        return acc

    def inv(self, x):
        """Fermat inversion x^(p-2); maps 0 -> 0 (zero-tolerant, the same
        contract as ff/batch_inversion.hpp:18-52)."""
        return self.pow_const(x, self.p - 2)

    def nth_root(self, x, k: int):
        """x^(1/k) for gcd(k, p-1) == 1 — the heptaroot/pentaroot family
        used by Poseidon S-boxes (ff/gl64_t.cuh:549-565 heptaroot,
        ff/baby_bear.hpp:52-67, ff/mersenne31.hpp:425 pentaroot), computed
        as x^(k^-1 mod p-1) instead of hand-rolled addition chains."""
        import math
        if math.gcd(k, self.p - 1) != 1:
            raise ValueError(f"k={k} shares a factor with p-1")
        return self.pow_const(x, pow(k, -1, self.p - 1))

    def heptaroot(self, x):
        return self.nth_root(x, 7)

    def pentaroot(self, x):
        return self.nth_root(x, 5)

    def sqrt(self, x):
        """Square root for p = 3 (mod 4) fields: x^((p+1)/4)
        (ff/mersenne31.hpp:407; returns *a* root — garbage for
        non-residues, matching the reference contract)."""
        if self.p % 4 != 3:
            raise NotImplementedError("sqrt needs p = 3 (mod 4)")
        return self.pow_const(x, (self.p + 1) // 4)

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

    def batch_inv_tree(self, x):
        """Batch inversion over the LAST axis via a product tree: up-sweep
        pair products, ONE Fermat inversion of each root, down-sweep
        child inverses — ~3 muls per element at log depth (the parallel
        form of Montgomery's trick, ff/batch_inversion.hpp:18-52).

        Requires a power-of-two axis length and NON-ZERO inputs (callers
        select degenerate lanes to 1 beforehand)."""
        n = x.shape[-1]
        assert n & (n - 1) == 0, "batch_inv_tree needs a power-of-two axis"
        levels = [x]
        while levels[-1].shape[-1] > 1:
            cur = levels[-1]
            levels.append(self.mul(cur[..., 0::2], cur[..., 1::2]))
        inv = self.inv(levels[-1])
        for lvl in reversed(levels[:-1]):
            left = lvl[..., 0::2]
            right = lvl[..., 1::2]
            inv_l = self.mul(inv, right)
            inv_r = self.mul(inv, left)
            # interleave back: (.., m, 2) -> (.., 2m)
            pair = jnp.stack([inv_l, inv_r], axis=-1)
            inv = pair.reshape(pair.shape[:-2] + (lvl.shape[-1],))
        return inv

    # -- host conversion helpers ---------------------------------------------
    def rand_ints(self, rng, n: int) -> list:
        return [rng.randrange(self.p) for _ in range(n)]


def _set_index(arr, idx: int, value, axis: int):
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(idx, idx + 1)
    return arr.at[tuple(sl)].set(
        jax.lax.slice_in_dim(value, idx, idx + 1, axis=axis)
        if value.shape == arr.shape else value)
