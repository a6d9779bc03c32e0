"""Single-u32 Montgomery fields (BabyBear & friends) — mont32_t analogue.

The reference implements these as one 32-bit register per thread with PTX
`mul.lo/mul.hi` + fused Montgomery reduction (ff/mont32_t.cuh:196-223).  TPUs
have no 32x32->64 widening multiply on the VPU, so the 64-bit product is
assembled from 16-bit halves (4 u32 multiplies) — the classic mulhi
emulation — and the REDC carry `(T + m*p) >> 32` uses the identity
carry == (lo != 0) since the low word cancels exactly.

Element layout: plain ``(*batch,)`` uint32 in Montgomery form, canonically
reduced to [0, p).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import FieldParams
from .base import BaseField

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def mul32_wide(a, b):
    """(hi, lo) of the full 64-bit product of two u32 arrays."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    cross = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)   # < 3*2^16, fits
    hi = hh + (lh >> 16) + (hl >> 16) + (cross >> 16)
    lo = (cross << 16) | (ll & _MASK16)
    return hi, lo


def mulhi32(a, b):
    return mul32_wide(a, b)[0]


class Mont32Field(BaseField):
    """Montgomery field with a 31/32-bit prime (mont32_t, ff/mont32_t.cuh:19)."""

    n_limbs = 0
    limb_bits = 32

    def __init__(self, params: FieldParams):
        super().__init__(params)
        assert params.bits <= 32
        self.P = np.uint32(params.modulus)
        self.M0 = np.uint32(params.m0(32))
        self.RR = np.uint32(params.RR)
        self.ONE = np.uint32(params.one_mont)
        self._finalize()

    # -- ring ops -------------------------------------------------------------
    def add(self, x, y):
        s = x + y                      # < 2p <= 2^32 (p < 2^31), no overflow
        return jnp.where(s >= self.P, s - self.P, s)

    def sub(self, x, y):
        d = x - y                      # u32 wraparound
        return jnp.where(x < y, d + self.P, d)

    def neg(self, x):
        return jnp.where(x == 0, x, self.P - x)

    def redc(self, hi, lo):
        """(hi:lo) * R^-1 mod p — Montgomery reduction of a 64-bit value.
        Requires hi < p (true for products of reduced inputs)."""
        m = lo * self.M0
        t = hi + mulhi32(m, self.P) + (lo != 0).astype(_U32)
        return jnp.where(t >= self.P, t - self.P, t)

    def mul(self, x, y):
        hi, lo = mul32_wide(x, y)
        return self.redc(hi, lo)

    # -- Montgomery domain --------------------------------------------------
    def to_mont(self, x):
        return self.mul(x, jnp.broadcast_to(jnp.asarray(self.RR), x.shape))

    def from_mont(self, x):
        return self.redc(jnp.zeros_like(x), x)

    # -- host conversion -----------------------------------------------------
    def from_int_list(self, values, batch_shape=None, broadcast=False):
        """Canonical ints -> device wire form (Montgomery).  broadcast=True
        expands in-graph (jnp.broadcast_to), never materializing an O(n)
        host array/HLO constant."""
        mont = [self.params.to_mont(v % self.p) for v in values]
        arr = np.asarray(mont, dtype=np.uint32)
        if broadcast and batch_shape is not None:
            return jnp.broadcast_to(jnp.asarray(arr[0]), tuple(batch_shape))
        if batch_shape is not None:
            arr = arr.reshape(batch_shape)
        return jnp.asarray(arr)

    def to_int_list(self, arr) -> list:
        host = np.asarray(arr, dtype=np.uint32).reshape(-1)
        return [self.params.from_mont(int(v)) for v in host]

    # wire <-> device (wire IS the device format here)
    def from_wire_np(self, arr: np.ndarray):
        return jnp.asarray(arr.astype(np.uint32))

    def to_wire_np(self, arr) -> np.ndarray:
        return np.asarray(arr, dtype=np.uint32)


class Mersenne31Field(Mont32Field):
    """Mersenne-31 with direct (non-Montgomery) reduction.

    p = 2^31 - 1 makes 2^32 ≡ 2, so a 64-bit product folds in two shifts —
    cheaper than Montgomery on a TPU (the reference's mont32_t reuse,
    ff/mersenne31.hpp:14-39, is a CUDA-ism: it saves a PTX instruction there,
    not here).  Wire format is canonical, matching mersenne31 mem_t.
    """

    def mul(self, x, y):
        hi, lo = mul32_wide(x, y)
        # x*y = hi*2^32 + lo ≡ 2*hi + lo (mod p); 2*hi < 2^32 needs care:
        # hi < 2^30 (inputs < 2^31), so 2*hi < 2^31: safe.
        lo_lo = lo & np.uint32(0x7FFFFFFF)
        lo_hi = lo >> 31
        s = lo_lo + lo_hi + (hi << 1)      # < 2^31 + 1 + 2^31 < 2^32
        s = (s & np.uint32(0x7FFFFFFF)) + (s >> 31)
        return jnp.where(s >= self.P, s - self.P, s)

    def to_mont(self, x):
        return x

    def from_mont(self, x):
        return x

    def from_int_list(self, values, batch_shape=None, broadcast=False):
        arr = np.asarray([v % self.p for v in values], dtype=np.uint32)
        if broadcast and batch_shape is not None:
            return jnp.broadcast_to(jnp.asarray(arr[0]), tuple(batch_shape))
        if batch_shape is not None:
            arr = arr.reshape(batch_shape)
        return jnp.asarray(arr)

    def to_int_list(self, arr) -> list:
        return [int(v) for v in np.asarray(arr, dtype=np.uint32).reshape(-1)]
