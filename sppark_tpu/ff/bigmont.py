"""Multi-limb Montgomery fields (BN254/BLS12-381/377/Pasta) — mont_t analogue.

The reference's mont_t (ff/mont_t.cuh:33-36) rides PTX add-with-carry chains;
TPUs have no carry flag, so the design is different:

  * Elements are ``(L, *batch)`` uint32 planes, little-endian **16-bit
    limbs** (each plane holds values < 2^16 between ops).  L = mont_bits/16,
    so R = 2^(16*L) equals the reference's R = 2^(32*n) and Montgomery wire
    forms match bit-exactly.
  * Products of 16-bit limbs fit u32 exactly; anti-diagonal accumulation of
    the schoolbook product keeps every accumulator < 4*L*2^16 < 2^32 for all
    supported L (<= 24), so **no carries are materialized inside the hot
    loop** — one normalization pass at the end.
  * Montgomery reduction is interleaved word-by-word (CIOS-flavoured): at
    step i only position i must be exact, which needs just the running
    carry, not a full normalization (analogous to mad_n_redc,
    ff/mont_t.cuh:381-423).

All loops below are unrolled over the *limb* index (static, <= 24) and
vectorized over the batch, which is what the VPU wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FieldParams
from .base import BaseField

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


class BigMontField(BaseField):
    limb_bits = 16

    def __init__(self, params: FieldParams):
        super().__init__(params)
        L = params.mont_bits // 16
        self.L = L
        self.n_limbs = L
        assert 4 * L * (1 << 16) < (1 << 32), "accumulator bound violated"
        self.P_LIMBS = np.asarray(
            [(params.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
            dtype=np.uint32)
        self.M0 = np.uint32(params.m0(16))
        self.RR_LIMBS = self._int_to_limbs(params.RR)
        self.ONE_LIMBS = self._int_to_limbs(params.one_mont)
        self._finalize()

    # -- host limb packing ------------------------------------------------------
    def _int_to_limbs(self, v: int) -> np.ndarray:
        return np.asarray([(v >> (16 * i)) & 0xFFFF for i in range(self.L)],
                          dtype=np.uint32)

    def _limbs_to_int(self, limbs) -> int:
        return sum(int(x) << (16 * i) for i, x in enumerate(limbs))

    # -- carry utilities ----------------------------------------------------------
    def _norm(self, planes):
        """Propagate carries through a list of u32 planes holding values
        < 2^32; returns (16-bit planes, final carry plane)."""
        out = []
        carry = jnp.zeros_like(planes[0])
        for x in planes:
            s = x + carry
            out.append(s & _MASK16)
            carry = s >> 16
        return out, carry

    def _sub_limbs(self, x_planes, y_limbs_const):
        """x - const_p with borrow; returns (planes, borrow in {0,1})."""
        out = []
        borrow = jnp.zeros_like(x_planes[0])
        for i in range(self.L):
            t = x_planes[i] + np.uint32(0x10000) - y_limbs_const[i] - borrow
            out.append(t & _MASK16)
            borrow = 1 - (t >> 16)
        return out, borrow

    def _cond_sub_p(self, planes, force=None):
        """Subtract p where (value >= p) or force; planes must be 16-bit."""
        sub, borrow = self._sub_limbs(planes, self.P_LIMBS)
        need = borrow == 0
        if force is not None:
            need = need | (force != 0)
        return [jnp.where(need, s, x) for s, x in zip(sub, planes)]

    def _stack(self, planes):
        return jnp.stack(planes)

    def _unstack(self, arr):
        return [arr[i] for i in range(self.L)]

    # -- ring ops --------------------------------------------------------------------
    def add(self, x, y):
        s = [x[i] + y[i] for i in range(self.L)]     # each < 2^17
        planes, carry = self._norm(s)
        return self._stack(self._cond_sub_p(planes, force=carry))

    def sub(self, x, y):
        d, borrow = self._sub_limbs(self._unstack(x),
                                    [y[i] for i in range(self.L)])
        # on borrow, add p back
        addp = [d[i] + self.P_LIMBS[i] for i in range(self.L)]
        addp, _ = self._norm(addp)
        return self._stack([jnp.where(borrow == 1, a, b)
                            for a, b in zip(addp, d)])

    def neg(self, x):
        zero = self.is_zero(x)
        d, _ = self._sub_limbs(
            [jnp.broadcast_to(jnp.asarray(self.P_LIMBS[i]), x[i].shape)
             for i in range(self.L)],
            self._unstack(x))
        return self._stack([jnp.where(zero, jnp.zeros_like(v), v) for v in d])

    def mul(self, x, y):
        """Montgomery product x*y*R^-1, anti-diagonal accumulation +
        interleaved REDC (see module docstring for the carry-free bound).

        Structured as L slice-adds on a stacked (2L, *batch) accumulator —
        not per-limb scalar chains — so the XLA graph stays O(L) ops and the
        VPU sees wide adds."""
        L = self.L
        batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        acc = jnp.zeros((2 * L,) + batch, _U32)
        zrow = jnp.zeros((1,) + batch, _U32)
        # schoolbook product: row i of x against all of y
        for i in range(L):
            prod = x[i][None] * y             # (L, *batch) u32, exact
            contrib = (jnp.concatenate([prod & _MASK16, zrow])
                       + jnp.concatenate([zrow, prod >> 16]))
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, jax.lax.dynamic_slice_in_dim(acc, i, L + 1) + contrib,
                i, axis=0)
        # interleaved Montgomery reduction
        carry = jnp.zeros(batch, _U32)
        pl_b = jnp.asarray(self.P_LIMBS).reshape((L,) + (1,) * len(batch))
        for i in range(L):
            v = acc[i] + carry
            m = (v * self.M0) & _MASK16
            prod = pl_b * m[None]             # (L, *batch) u32, exact
            lo = prod & _MASK16
            hi = prod >> 16
            carry = (v + lo[0]) >> 16
            contrib = (jnp.concatenate([lo[1:], hi[L - 1:]])
                       + jnp.concatenate([hi[:L - 1], zrow]))
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, jax.lax.dynamic_slice_in_dim(acc, i + 1, L) + contrib,
                i + 1, axis=0)
        # normalize the top half + the running carry
        top = [acc[L] + carry] + [acc[L + j] for j in range(1, L)]
        planes, carry_out = self._norm(top)
        return self._stack(self._cond_sub_p(planes, force=carry_out))

    # -- Montgomery domain -----------------------------------------------------------
    def to_mont(self, x):
        rr = self._stack([jnp.broadcast_to(jnp.asarray(self.RR_LIMBS[i]),
                                           x[i].shape) for i in range(self.L)])
        return self.mul(x, rr)

    def from_mont(self, x):
        one = self._stack([
            jnp.broadcast_to(jnp.asarray(np.uint32(1 if i == 0 else 0)),
                             x[i].shape) for i in range(self.L)])
        return self.mul(x, one)

    # -- host conversion -----------------------------------------------------------------
    def from_int_list(self, values, batch_shape=None, broadcast=False):
        """Canonical ints -> device planes (Montgomery wire form)."""
        wire = [self.params.to_mont(v % self.p) for v in values]
        arr = np.zeros((self.L, len(wire)), dtype=np.uint32)
        for c, v in enumerate(wire):
            for i in range(self.L):
                arr[i, c] = (v >> (16 * i)) & 0xFFFF
        if broadcast and batch_shape is not None:
            one = jnp.asarray(arr[:, 0].reshape(
                (self.L,) + (1,) * len(batch_shape)))
            return jnp.broadcast_to(one, (self.L,) + tuple(batch_shape))
        if batch_shape is not None:
            arr = arr.reshape((self.L,) + tuple(batch_shape))
        return jnp.asarray(arr)

    def to_int_list(self, arr) -> list:
        host = np.asarray(arr, dtype=np.uint64)
        flat = host.reshape(self.L, -1)
        out = []
        for c in range(flat.shape[1]):
            v = sum(int(flat[i, c]) << (16 * i) for i in range(self.L))
            out.append(self.params.from_mont(v))
        return out

    def from_wire_np(self, arr: np.ndarray):
        """Wire: (..., n32) little-endian u32 words (the reference FFI layout)
        -> device 16-bit planes."""
        a = np.ascontiguousarray(arr, dtype=np.uint32)
        n32 = self.L // 2
        a = a.reshape(-1, n32)
        planes = np.empty((self.L, a.shape[0]), dtype=np.uint32)
        for w in range(n32):
            planes[2 * w] = a[:, w] & 0xFFFF
            planes[2 * w + 1] = a[:, w] >> 16
        return jnp.asarray(planes)

    def to_wire_np(self, arr) -> np.ndarray:
        host = np.asarray(arr, dtype=np.uint32)
        flat = host.reshape(self.L, -1)
        n32 = self.L // 2
        out = np.empty((flat.shape[1], n32), dtype=np.uint32)
        for w in range(n32):
            out[:, w] = flat[2 * w] | (flat[2 * w + 1] << 16)
        return out
