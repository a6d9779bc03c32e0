"""Goldilocks field p = 2^64 - 2^32 + 1 — gl64_t analogue.

The reference (ff/gl64_t.cuh:241-298) multiplies via 4 32-bit cross products
and reduces with the identities 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p).
We use the same reduction, with 64-bit words emulated as (hi, lo) u32 pairs
since the TPU VPU is a 32-bit machine.  No Montgomery form (gl64_t stores raw
values, ff/gl64_t.cuh:56), so wire format == canonical u64.

Element layout: ``(2, *batch)`` uint32, plane 0 = low word, plane 1 = high.
Values canonically reduced to [0, p) at op boundaries (the reference's
GL64_PARTIALLY_REDUCED lazy mode is an optimization we can layer into the
Pallas kernels later).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import FieldParams, GOLDILOCKS
from .base import BaseField
from .mont32 import mul32_wide

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _add64(alo, ahi, blo, bhi):
    """64-bit add on u32 pairs -> (lo, hi, carry_out)."""
    lo = alo + blo
    c = (lo < alo).astype(_U32)
    hi1 = ahi + bhi
    c1 = (hi1 < ahi).astype(_U32)
    hi = hi1 + c
    c2 = (hi < hi1).astype(_U32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract a-b on u32 pairs -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b = (alo < blo).astype(_U32)
    hi = ahi - bhi - b
    bout = ((ahi < bhi) | ((b == 1) & (ahi == bhi))).astype(_U32)
    return lo, hi, bout


class GoldilocksField(BaseField):
    n_limbs = 2
    limb_bits = 32

    PLO = np.uint32(0x00000001)
    PHI = np.uint32(0xFFFFFFFF)
    EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 == 2^64 mod p

    def __init__(self, params: FieldParams = GOLDILOCKS):
        super().__init__(params)
        assert params.modulus == (1 << 64) - (1 << 32) + 1
        self._finalize()

    # -- canonicalization helpers --------------------------------------------
    def _geq_p(self, lo, hi):
        return (hi == self.PHI) & (lo >= self.PLO)

    def _sub_p(self, lo, hi):
        """Subtract p once where value >= p."""
        need = self._geq_p(lo, hi)
        slo, shi, _ = _sub64(lo, hi, jnp.broadcast_to(jnp.asarray(self.PLO), lo.shape),
                             jnp.broadcast_to(jnp.asarray(self.PHI), hi.shape))
        return jnp.where(need, slo, lo), jnp.where(need, shi, hi)

    # -- ring ops --------------------------------------------------------------
    def add(self, x, y):
        lo, hi, c = _add64(x[0], x[1], y[0], y[1])
        # +2^64 ≡ +eps (2^32-1); sum < 2p < 2^65 so at most one wrap, and the
        # post-wrap value < eps + (2p - 2^64) < 2^33 — adding eps can't carry
        # past 2^64 again... (lo+eps may carry into hi; hi is small then)
        lo2 = lo + self.EPS
        c2 = (lo2 < lo).astype(_U32)
        hi2 = hi + c2
        lo = jnp.where(c == 1, lo2, lo)
        hi = jnp.where(c == 1, hi2, hi)
        lo, hi = self._sub_p(lo, hi)
        return jnp.stack([lo, hi])

    def sub(self, x, y):
        lo, hi, b = _sub64(x[0], x[1], y[0], y[1])
        # -2^64 ≡ -eps
        lo2 = lo - self.EPS
        b2 = (lo < self.EPS).astype(_U32)
        hi2 = hi - b2
        lo = jnp.where(b == 1, lo2, lo)
        hi = jnp.where(b == 1, hi2, hi)
        lo, hi = self._sub_p(lo, hi)
        return jnp.stack([lo, hi])

    def neg(self, x):
        z = self.is_zero(x)
        plo = jnp.broadcast_to(jnp.asarray(self.PLO), x[0].shape)
        phi = jnp.broadcast_to(jnp.asarray(self.PHI), x[1].shape)
        lo, hi, _ = _sub64(plo, phi, x[0], x[1])
        lo = jnp.where(z, jnp.zeros_like(lo), lo)
        hi = jnp.where(z, jnp.zeros_like(hi), hi)
        return jnp.stack([lo, hi])

    def mul(self, x, y):
        # full 128-bit product as 4 u32 words w0..w3 via 32x32 wide products
        xl, xh, yl, yh = x[0], x[1], y[0], y[1]
        h_ll, l_ll = mul32_wide(xl, yl)
        h_lh, l_lh = mul32_wide(xl, yh)
        h_hl, l_hl = mul32_wide(xh, yl)
        h_hh, l_hh = mul32_wide(xh, yh)
        w0 = l_ll
        # w1 = h_ll + l_lh + l_hl  (collect carries into w2)
        w1 = h_ll + l_lh
        c1 = (w1 < h_ll).astype(_U32)
        w1b = w1 + l_hl
        c1 = c1 + (w1b < w1).astype(_U32)
        w1 = w1b
        # w2 = h_lh + h_hl + l_hh + c1 (carries into w3)
        w2 = h_lh + h_hl
        c2 = (w2 < h_lh).astype(_U32)
        w2b = w2 + l_hh
        c2 = c2 + (w2b < w2).astype(_U32)
        w2c = w2b + c1
        c2 = c2 + (w2c < w2b).astype(_U32)
        w2 = w2c
        w3 = h_hh + c2
        return self._reduce_words(w0, w1, w2, w3)

    def _reduce_words(self, w0, w1, w2, w3):
        """Reduce w0 + w1*2^32 + w2*2^64 + w3*2^96 mod p using
        2^64 ≡ 2^32-1, 2^96 ≡ -1 (ff/gl64_t.cuh:273-298)."""
        # step 1: t = (w1:w0) - w3; on borrow subtract eps (== add p twice
        # ... -2^64 ≡ -eps exactly)
        lo, hi, b = _sub64(w0, w1, w3, jnp.zeros_like(w3))
        lo2 = lo - self.EPS
        b2 = (lo < self.EPS).astype(_U32)
        hi2 = hi - b2
        lo = jnp.where(b == 1, lo2, lo)
        hi = jnp.where(b == 1, hi2, hi)
        # step 2: add w2 * eps = (w2<<32) - w2
        ulo = jnp.zeros_like(w2) - w2            # low word of (w2<<32) - w2
        uhi = w2 - (w2 != 0).astype(_U32)        # high word
        lo, hi, c = _add64(lo, hi, ulo, uhi)
        lo2 = lo + self.EPS
        c2 = (lo2 < lo).astype(_U32)
        hi2 = hi + c2
        lo = jnp.where(c == 1, lo2, lo)
        hi = jnp.where(c == 1, hi2, hi)
        lo, hi = self._sub_p(lo, hi)
        return jnp.stack([lo, hi])

    # -- lazy (partially-reduced) ops ------------------------------------------
    # The GL64_PARTIALLY_REDUCED mode of the reference (ff/gl64_t.cuh:23-37):
    # representatives live anywhere in [0, 2^64) — congruence mod p is the
    # only invariant — so the >= p compare-and-subtract disappears from every
    # op inside a kernel; `canon()` restores canonical form once at the end.

    @staticmethod
    def _fold_add(lo, hi, c):
        """Fold an add carry: value + c*2^64 == value + c*eps (mod p)."""
        m = jnp.zeros_like(c) - c                 # c ? eps : 0
        lo2 = lo + m
        c2 = (lo2 < m).astype(_U32)
        hi2 = hi + c2
        c3 = ((hi2 < c2)).astype(_U32)            # wrapped past 2^64 again
        return lo2, hi2, c3

    @staticmethod
    def _fold_sub(lo, hi, b):
        """Fold a sub borrow: value - b*2^64 == value - b*eps (mod p)."""
        m = jnp.zeros_like(b) - b                 # b ? eps : 0
        lo2 = lo - m
        bb = (lo < m).astype(_U32)
        hi2 = hi - bb
        b3 = ((hi < bb)).astype(_U32)             # wrapped below 0 again
        return lo2, hi2, b3

    def add_lazy(self, x, y):
        lo, hi, c = _add64(x[0], x[1], y[0], y[1])
        lo, hi, c = self._fold_add(lo, hi, c)
        lo, hi, _ = self._fold_add(lo, hi, c)     # second fold: < 2^33 now
        return jnp.stack([lo, hi])

    def sub_lazy(self, x, y):
        lo, hi, b = _sub64(x[0], x[1], y[0], y[1])
        lo, hi, b = self._fold_sub(lo, hi, b)
        lo, hi, _ = self._fold_sub(lo, hi, b)
        return jnp.stack([lo, hi])

    def mul_lazy(self, x, y):
        # identical wide product; reduction keeps any (lo, hi) representative
        xl, xh, yl, yh = x[0], x[1], y[0], y[1]
        h_ll, l_ll = mul32_wide(xl, yl)
        h_lh, l_lh = mul32_wide(xl, yh)
        h_hl, l_hl = mul32_wide(xh, yl)
        h_hh, l_hh = mul32_wide(xh, yh)
        w0 = l_ll
        w1 = h_ll + l_lh
        c1 = (w1 < h_ll).astype(_U32)
        w1b = w1 + l_hl
        c1 = c1 + (w1b < w1).astype(_U32)
        w1 = w1b
        w2 = h_lh + h_hl
        c2 = (w2 < h_lh).astype(_U32)
        w2b = w2 + l_hh
        c2 = c2 + (w2b < w2).astype(_U32)
        w2c = w2b + c1
        c2 = c2 + (w2c < w2b).astype(_U32)
        w2 = w2c
        w3 = h_hh + c2
        # (w1:w0) - w3, single -eps fold suffices (w3 < 2^32, see _reduce_words)
        lo, hi, b = _sub64(w0, w1, w3, jnp.zeros_like(w3))
        lo, hi, _ = self._fold_sub(lo, hi, b)
        # + w2*eps = (w2<<32) - w2
        ulo = jnp.zeros_like(w2) - w2
        uhi = w2 - (w2 != 0).astype(_U32)
        lo, hi, c = _add64(lo, hi, ulo, uhi)
        lo, hi, c = self._fold_add(lo, hi, c)
        lo, hi, _ = self._fold_add(lo, hi, c)
        return jnp.stack([lo, hi])

    def canon(self, x):
        """Reduce a lazy representative (< 2^64) to canonical [0, p)."""
        lo, hi = self._sub_p(x[0], x[1])
        return jnp.stack([lo, hi])

    # -- Montgomery stubs (gl64 is not Montgomery) -----------------------------
    def to_mont(self, x):
        return x

    def from_mont(self, x):
        return x

    # -- host conversion ---------------------------------------------------------
    def from_int_list(self, values, batch_shape=None, broadcast=False):
        vals = [v % self.p for v in values]
        lo = np.asarray([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
        hi = np.asarray([v >> 32 for v in vals], dtype=np.uint32)
        if broadcast and batch_shape is not None:
            pair = jnp.asarray(np.stack([lo[:1], hi[:1]]))   # (2, 1)
            return jnp.broadcast_to(
                pair.reshape((2,) + (1,) * len(batch_shape)),
                (2,) + tuple(batch_shape))
        if batch_shape is not None:
            lo = lo.reshape(batch_shape)
            hi = hi.reshape(batch_shape)
        return jnp.asarray(np.stack([lo, hi]))

    def to_int_list(self, arr) -> list:
        host = np.asarray(arr, dtype=np.uint32)
        lo = host[0].reshape(-1)
        hi = host[1].reshape(-1)
        return [int(l) | (int(h) << 32) for l, h in zip(lo, hi)]

    def from_wire_np(self, arr: np.ndarray):
        """Wire format: little-endian u64 (or (..., 2) u32) array."""
        a = np.asarray(arr)
        if a.dtype == np.uint64:
            lo = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (a >> np.uint64(32)).astype(np.uint32)
        else:
            v = a.view(np.uint32).reshape(-1, 2)   # little-endian word pairs
            lo, hi = v[:, 0].copy(), v[:, 1].copy()
        return jnp.asarray(np.stack([lo, hi]))

    def to_wire_np(self, arr) -> np.ndarray:
        host = np.asarray(arr, dtype=np.uint32)
        return (host[0].astype(np.uint64)
                | (host[1].astype(np.uint64) << np.uint64(32)))
