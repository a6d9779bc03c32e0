"""Extension fields: generic Fp2 and the BabyBear degree-4 tower.

The reference's device fp2 spreads the two coefficients across a warp lane
pair (ff/alt_bn128-fp2.hpp:25-60); on TPU we instead carry an explicit
leading coefficient axis — elements are pytrees ``(c0, c1, ...)`` of base
field arrays — which vectorizes with no cross-lane traffic.

BabyBear4: F_p[x]/(x^4 - BETA), BETA = 11 (canonical) or -11 (RISC-Zero)
per ff/baby_bear.hpp:75-79; schoolbook mul like ff/baby_bear.hpp:106-395.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..params import Fp2Params, BABY_BEAR
from .base import BaseField
from .mont32 import Mont32Field


class Fp2Field:
    """Quadratic extension over any BaseField; elements are (c0, c1) tuples."""

    def __init__(self, params: Fp2Params, base: BaseField):
        self.params = params
        self.base = base
        # nonresidue as a device constant in the base field's wire form
        self._nr_int = params.nonresidue % base.p
        self.degree = 2

    def _nr(self, like):
        return self.base.const(self._nr_int, batch_shape=_batch_shape(self.base, like))

    def add(self, a, b):
        return (self.base.add(a[0], b[0]), self.base.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1]))

    def neg(self, a):
        return (self.base.neg(a[0]), self.base.neg(a[1]))

    def mul(self, a, b):
        F = self.base
        t0 = F.mul(a[0], b[0])
        t1 = F.mul(a[1], b[1])
        # Karatsuba middle term: (a0+a1)(b0+b1) - t0 - t1
        mid = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        c1 = F.sub(F.sub(mid, t0), t1)
        c0 = F.add(t0, F.mul(t1, self._nr(t1)))
        return (c0, c1)

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        return self.base.is_zero(a[0]) & self.base.is_zero(a[1])

    def eq(self, a, b):
        return self.base.eq(a[0], b[0]) & self.base.eq(a[1], b[1])

    def select(self, cond, a, b):
        return (self.base.select(cond, a[0], b[0]),
                self.base.select(cond, a[1], b[1]))

    def zeros(self, batch_shape):
        return (self.base.zeros(batch_shape), self.base.zeros(batch_shape))

    def ones(self, batch_shape):
        return (self.base.ones(batch_shape), self.base.zeros(batch_shape))

    def const(self, value: int, batch_shape=()):
        """Base-field constant embedded as (c, 0)."""
        return (self.base.const(value, batch_shape),
                self.base.zeros(batch_shape))

    def inv(self, a):
        """1/(a0+a1 u) = conj(a)/norm(a); norm inverted in the base field
        (paired-lane reciprocal, ff/alt_bn128-fp2.hpp:135-144)."""
        F = self.base
        norm = F.sub(F.mul(a[0], a[0]),
                     F.mul(self._nr(a[0]), F.mul(a[1], a[1])))
        ninv = F.inv(norm)
        return (F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv)))

    def batch_inv(self, a, axis=-1):
        F = self.base
        norm = F.sub(F.mul(a[0], a[0]),
                     F.mul(self._nr(a[0]), F.mul(a[1], a[1])))
        ninv = F.batch_inv(norm, axis=axis)
        return (F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv)))

    def batch_inv_tree(self, a):
        """Tree batch inversion via the norm map: norm(a) = a0^2 - nr*a1^2
        lives in the BASE field, so one base-field product tree + Fermat
        inversion serves the whole Fp2 batch (conj/norm,
        ff/alt_bn128-fp2.hpp:135-144 + ff/batch_inversion.hpp:18-52).
        Same contract as BaseField.batch_inv_tree: power-of-two last axis,
        non-zero inputs."""
        F = self.base
        norm = F.sub(F.mul(a[0], a[0]),
                     F.mul(self._nr(a[0]), F.mul(a[1], a[1])))
        ninv = F.batch_inv_tree(norm)
        return (F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv)))

    # host conversion: values are (c0_int, c1_int) pairs
    def from_int_list(self, values, batch_shape=None):
        c0 = self.base.from_int_list([v[0] for v in values], batch_shape)
        c1 = self.base.from_int_list([v[1] for v in values], batch_shape)
        return (c0, c1)

    def to_int_list(self, a):
        return list(zip(self.base.to_int_list(a[0]),
                        self.base.to_int_list(a[1])))


class BabyBear4Field:
    """bb31_4_t analogue: degree-4 extension of BabyBear mod x^4 - BETA.

    Elements are tuples of 4 BabyBear arrays.  Schoolbook negacyclic-ish
    convolution (ff/baby_bear.hpp:106-395); inversion via the 2x2-block
    method (recip_b0/recip_b2, ff/baby_bear.hpp:502-588) is replaced by the
    norm-tower: treat as (c0 + c2 y) + (c1 + c3 y) x over F_p[y]/(y^2-BETA).
    """

    degree = 4

    def __init__(self, canonical: bool = True, base: Mont32Field | None = None):
        self.base = base or Mont32Field(BABY_BEAR)
        self.beta_int = 11 if canonical else BABY_BEAR.modulus - 11

    def _beta(self, like):
        return self.base.const(self.beta_int,
                               batch_shape=_batch_shape(self.base, like))

    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.base.neg(x) for x in a)

    def mul(self, a, b):
        F = self.base
        beta = self._beta(a[0])
        # c_k = sum_{i+j=k} a_i b_j + BETA * sum_{i+j=k+4} a_i b_j
        def m(i, j):
            return F.mul(a[i], b[j])
        c0 = F.add(m(0, 0), F.mul(beta, F.add(F.add(m(1, 3), m(2, 2)), m(3, 1))))
        c1 = F.add(F.add(m(0, 1), m(1, 0)),
                   F.mul(beta, F.add(m(2, 3), m(3, 2))))
        c2 = F.add(F.add(m(0, 2), F.add(m(1, 1), m(2, 0))),
                   F.mul(beta, m(3, 3)))
        c3 = F.add(F.add(m(0, 3), m(1, 2)), F.add(m(2, 1), m(3, 0)))
        return (c0, c1, c2, c3)

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        z = self.base.is_zero(a[0])
        for c in a[1:]:
            z = z & self.base.is_zero(c)
        return z

    def eq(self, a, b):
        e = self.base.eq(a[0], b[0])
        for x, y in zip(a[1:], b[1:]):
            e = e & self.base.eq(x, y)
        return e

    def select(self, cond, a, b):
        return tuple(self.base.select(cond, x, y) for x, y in zip(a, b))

    def zeros(self, batch_shape):
        return tuple(self.base.zeros(batch_shape) for _ in range(4))

    def ones(self, batch_shape):
        return (self.base.ones(batch_shape),) + tuple(
            self.base.zeros(batch_shape) for _ in range(3))

    def inv(self, a):
        """Via the quadratic subfield F_p[y]/(y^2 - BETA):
        a = A + B x with A = c0 + c2 y, B = c1 + c3 y, x^2 = y.
        N(a) = A^2 - y B^2 lives in the subfield; invert there (conj/norm
        with the final norm in F_p), then a^-1 = (A - Bx) * N^-1."""
        A, B, N, norm, sub_mul = self._norm_chain(a)
        ninv = self.base.inv(norm)
        return self._finish_inv(A, B, N, ninv, sub_mul)

    def _norm_chain(self, a):
        """a -> (A, B, N, norm): subfield decomposition, subfield norm N,
        and the prime-field norm of N (shared by inv / batch_inv)."""
        F = self.base
        beta = self._beta(a[0])
        c0, c1, c2, c3 = a

        def sub_mul(p, q):
            r0 = F.add(F.mul(p[0], q[0]), F.mul(beta, F.mul(p[1], q[1])))
            r1 = F.add(F.mul(p[0], q[1]), F.mul(p[1], q[0]))
            return (r0, r1)

        A = (c0, c2)
        B = (c1, c3)
        A2 = sub_mul(A, A)
        B2 = sub_mul(B, B)
        yB2 = (F.mul(beta, B2[1]), B2[0])
        N = (F.sub(A2[0], yB2[0]), F.sub(A2[1], yB2[1]))
        norm = F.sub(F.mul(N[0], N[0]), F.mul(beta, F.mul(N[1], N[1])))
        return A, B, N, norm, sub_mul

    def _finish_inv(self, A, B, N, ninv, sub_mul):
        F = self.base
        Ninv = (F.mul(N[0], ninv), F.neg(F.mul(N[1], ninv)))
        Ai = sub_mul(A, Ninv)
        Bi = sub_mul(B, Ninv)
        return (Ai[0], F.neg(Bi[0]), Ai[1], F.neg(Bi[1]))

    def batch_inv(self, a, axis=-1):
        """Batched extension inversion: ONE prime-field batch inversion
        (Montgomery's trick) serves the whole bb31_4 batch through the
        norm tower — the role of the reference's batched extension
        inversion reusing scalar batch_inversion
        (ff/baby_bear.hpp:602-633).  Zero-tolerant: zero inputs yield
        zero outputs (batch_inv maps the zero norm to zero)."""
        A, B, N, norm, sub_mul = self._norm_chain(a)
        ninv = self.base.batch_inv(norm, axis=axis)
        return self._finish_inv(A, B, N, ninv, sub_mul)

    def batch_inv_tree(self, a):
        """Product-tree form (power-of-two last axis, non-zero inputs)."""
        A, B, N, norm, sub_mul = self._norm_chain(a)
        ninv = self.base.batch_inv_tree(norm)
        return self._finish_inv(A, B, N, ninv, sub_mul)

    def from_int_list(self, values, batch_shape=None):
        return tuple(self.base.from_int_list([v[i] for v in values],
                                             batch_shape) for i in range(4))

    def to_int_list(self, a):
        cols = [self.base.to_int_list(c) for c in a]
        return list(zip(*cols))


def _batch_shape(base: BaseField, like):
    return like.shape[1:] if base.n_limbs else like.shape
