"""Vectorized elliptic-curve point arithmetic (ec/ directory analogue).

Point *batches* are pytrees of field-element arrays:

  * affine   = (x, y)            infinity encoded X == Y == 0
                                 (ec/affine_t.hpp:31-36)
  * jacobian = (x, y, z)         infinity Z == 0 (ec/jacobian_t.hpp:16)
  * xyzz     = (x, y, zz, zzz)   infinity ZZ == 0 (ec/xyzz_t.hpp:16)

where each coordinate is a limb-plane array ``(L, *batch)`` (or a tuple of
two for Fp2/G2 — the reference's warp-lane-pair fp2, ff/alt_bn128-fp2.hpp:25,
becomes an explicit coefficient pytree here).

TPU-first notes: there is no warp divergence to manage, so the reference's
`uadd` state machine (ec/xyzz_t.hpp:203-341) is unnecessary; instead every
op is **branchless** — both the add and double legs are evaluated and lanes
select between add / double / infinity / pass-through results, mirroring the
csel style of jacobian_t::dadd (ec/jacobian_t.hpp:92-151) but across vector
lanes instead of within a thread.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CurveParams, get_curve
from ..ff import get_jax_field
from ..ff.base import barrier
from ..ff.ext import Fp2Field


def tree_take(pt, idx, axis: int = -1):
    """Gather along the batch axis for every coordinate/limb leaf."""
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=axis), pt)


def tree_concat(pts, axis: int = -1):
    return jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=axis), *pts)


class CurveOps:
    """All point operations for one curve, vectorized over a batch axis.

    The reference instantiates jacobian_t/xyzz_t templates per curve
    (poc/msm-cuda/cuda/pippenger.cu:11-17); this is the runtime analogue.
    """

    def __init__(self, curve: CurveParams):
        self.curve = curve
        base = get_jax_field(curve.field)
        self.base = base
        if curve.fp2 is not None:
            self.F = Fp2Field(curve.fp2, base)
            self.degree = 2
        else:
            self.F = base
            self.degree = 1
        # a4 != 0 supported for G1 only (matches the reference template's
        # unused-but-present a4 parameter, ec/jacobian_t.hpp:16)
        assert curve.a4 == 0 or curve.fp2 is None

    # -- generic helpers ------------------------------------------------------
    def _sel(self, cond, a, b):
        """Select whole points lane-wise (vec_select analogue)."""
        return tuple(self.F.select(cond, x, y) for x, y in zip(a, b))

    def _ones_like(self, x):
        if self.degree == 2:
            return self.F.ones(_bshape(self.base, x[0]))
        return self.F.ones(_bshape(self.base, x))

    def _zeros_like(self, x):
        if self.degree == 2:
            return self.F.zeros(_bshape(self.base, x[0]))
        return self.F.zeros(_bshape(self.base, x))

    # -- affine -----------------------------------------------------------------
    def affine_is_inf(self, a):
        return self.F.is_zero(a[0]) & self.F.is_zero(a[1])

    def affine_neg(self, a):
        return (a[0], self.F.neg(a[1]))

    def affine_cneg(self, a, flag):
        """Conditionally negate y where flag (the signed-digit path,
        ec/xyzz_t.hpp:362 `subtract`)."""
        return (a[0], self.F.select(flag, self.F.neg(a[1]), a[1]))

    def affine_to_xyzz(self, a):
        one = self._ones_like(a[0])
        zero = self._zeros_like(a[0])
        inf = self.affine_is_inf(a)
        z = self.F.select(inf, zero, one)
        return (a[0], a[1], z, z)

    def affine_to_jacobian(self, a):
        one = self._ones_like(a[0])
        zero = self._zeros_like(a[0])
        inf = self.affine_is_inf(a)
        return (a[0], a[1], self.F.select(inf, zero, one))

    def affine_infinity(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return (z, z)

    # -- xyzz --------------------------------------------------------------------
    def xyzz_is_inf(self, p):
        return self.F.is_zero(p[2])

    def xyzz_infinity(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return (z, z, z, z)

    def xyzz_dbl(self, p):
        """dbl-2008-s-1 (6M + 3S; ec/xyzz_t.hpp:111-116 doubling leg).
        Branchless: y == 0 or zz == 0 yields infinity."""
        F = self.F
        x, y, zz, zzz = p
        U = F.add(y, y)
        V = F.sqr(U)
        W = F.mul(U, V)
        S = F.mul(x, V)
        x2 = F.sqr(x)
        M = F.add(F.add(x2, x2), x2)
        if self.curve.a4:
            a = F.const(self.curve.a4, _any_bshape(self, x))
            M = F.add(M, F.mul(a, F.sqr(zz)))
        X3 = F.sub(F.sqr(M), F.add(S, S))
        Y3 = F.sub(F.mul(M, F.sub(S, X3)), F.mul(W, y))
        ZZ3 = F.mul(V, zz)
        ZZZ3 = F.mul(W, zzz)
        bad = F.is_zero(y) | F.is_zero(zz)
        inf = self.xyzz_infinity(_any_bshape(self, p[0]))
        # barriers cap XLA's per-use subexpression re-expansion when these
        # ops are chained inside lax loop bodies (ff/base.py:barrier)
        return barrier(self._sel(bad, inf, (X3, Y3, ZZ3, ZZZ3)))

    def xyzz_add(self, p, q):
        """Unified full add (add-2008-s, 12M+2S; ec/xyzz_t.hpp:117-201),
        branchless across lanes: handles either-infinity, doubling and
        cancellation."""
        F = self.F
        X1, Y1, ZZ1, ZZZ1 = p
        X2, Y2, ZZ2, ZZZ2 = q
        U1 = F.mul(X1, ZZ2)
        U2 = F.mul(X2, ZZ1)
        S1 = F.mul(Y1, ZZZ2)
        S2 = F.mul(Y2, ZZZ1)
        P = F.sub(U2, U1)
        R = F.sub(S2, S1)
        PP = F.sqr(P)
        PPP = F.mul(P, PP)
        Q = F.mul(U1, PP)
        X3 = F.sub(F.sub(F.sqr(R), PPP), F.add(Q, Q))
        Y3 = F.sub(F.mul(R, F.sub(Q, X3)), F.mul(S1, PPP))
        ZZ3 = F.mul(F.mul(ZZ1, ZZ2), PP)
        ZZZ3 = F.mul(F.mul(ZZZ1, ZZZ2), PPP)
        added = barrier((X3, Y3, ZZ3, ZZZ3))

        p_inf = self.xyzz_is_inf(p)
        q_inf = self.xyzz_is_inf(q)
        same_x = F.is_zero(P)
        same_y = F.is_zero(R)
        out = self._sel(same_x & same_y, self.xyzz_dbl(p), added)
        inf = self.xyzz_infinity(_any_bshape(self, X1))
        out = self._sel(same_x & ~same_y, inf, out)
        out = self._sel(q_inf, p, out)
        out = self._sel(p_inf, q, out)
        return barrier(out)

    def xyzz_madd(self, p, a, sign=None):
        """Unified mixed add of affine points — THE MSM bucket op
        (madd-2008-s, 8M+2S fast leg; ec/xyzz_t.hpp:352-430).  `sign`
        (bool lanes) subtracts the point instead, for signed digits."""
        F = self.F
        ax, ay = a
        if sign is not None:
            ay = F.select(sign, F.neg(ay), ay)
        X1, Y1, ZZ1, ZZZ1 = p
        U2 = F.mul(ax, ZZ1)
        S2 = F.mul(ay, ZZZ1)
        P = F.sub(U2, X1)
        R = F.sub(S2, Y1)
        PP = F.sqr(P)
        PPP = F.mul(P, PP)
        Q = F.mul(X1, PP)
        X3 = F.sub(F.sub(F.sqr(R), PPP), F.add(Q, Q))
        Y3 = F.sub(F.mul(R, F.sub(Q, X3)), F.mul(Y1, PPP))
        ZZ3 = F.mul(ZZ1, PP)
        ZZZ3 = F.mul(ZZZ1, PPP)
        added = barrier((X3, Y3, ZZ3, ZZZ3))

        a_inf = self.affine_is_inf(a)
        p_inf = self.xyzz_is_inf(p)
        same_x = F.is_zero(P)
        same_y = F.is_zero(R)
        out = self._sel(same_x & same_y & ~p_inf & ~a_inf,
                        self.xyzz_dbl(p), added)
        inf = self.xyzz_infinity(_any_bshape(self, X1))
        out = self._sel(same_x & ~same_y, inf, out)
        out = self._sel(p_inf, self.affine_to_xyzz((ax, ay)), out)
        out = self._sel(a_inf, p, out)
        return barrier(out)

    def xyzz_to_affine(self, p):
        """Batch normalization via Montgomery-trick inversion
        (the role of ff/batch_inversion.hpp in bucket collection).
        Infinity lanes map to (0, 0)."""
        F = self.F
        x, y, zz, zzz = p
        zz_i = F.batch_inv(zz)
        zzz_i = F.batch_inv(zzz)
        ax = F.mul(x, zz_i)
        ay = F.mul(y, zzz_i)
        inf = self.xyzz_is_inf(p)
        zero = self._zeros_like(x)
        return (F.select(inf, zero, ax), F.select(inf, zero, ay))

    def xyzz_to_jacobian(self, p):
        """Inversion-free conversion (role of ec/xyzz_t.hpp:87-90): pick
        Z' = zz*zzz = z^5; then X'/Z'^2 = x/zz needs X' = x*zz^4 and
        Y'/Z'^3 = y/zzz needs Y' = y*zz^6."""
        F = self.F
        x, y, zz, zzz = p
        Z3 = F.mul(zz, zzz)
        zz2 = F.sqr(zz)
        zz4 = F.sqr(zz2)
        X3 = F.mul(x, zz4)
        Y3 = F.mul(y, F.mul(zz4, zz2))
        return (X3, Y3, Z3)

    # -- jacobian -------------------------------------------------------------------
    def jacobian_is_inf(self, p):
        return self.F.is_zero(p[2])

    def jacobian_infinity(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return (z, z, z)

    def jacobian_dbl(self, p):
        """dbl-2009-l, a4 = 0 (ec/jacobian_t.hpp:347-384)."""
        F = self.F
        x, y, z = p
        A = F.sqr(x)
        B = F.sqr(y)
        C = F.sqr(B)
        D = F.sub(F.sqr(F.add(x, B)), F.add(A, C))
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        if self.curve.a4:
            a = F.const(self.curve.a4, _any_bshape(self, x))
            E = F.add(E, F.mul(a, F.sqr(F.sqr(z))))
        FF = F.sqr(E)
        X3 = F.sub(FF, F.add(D, D))
        C8 = F.add(C, C)
        C8 = F.add(C8, C8)
        C8 = F.add(C8, C8)
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
        Z3 = F.mul(F.add(y, y), z)
        bad = F.is_zero(y) | F.is_zero(z)
        Z3 = F.select(bad, self._zeros_like(z), Z3)
        return barrier((X3, Y3, Z3))

    def jacobian_add(self, p, q):
        """Unified add (add-2007-bl, ec/jacobian_t.hpp:236-294) with
        branchless special-case handling (the dadd role,
        ec/jacobian_t.hpp:92-151)."""
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = F.sqr(Z1)
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, U1)
        rr = F.sub(S2, S1)
        r = F.add(rr, rr)
        I = F.sqr(F.add(H, H))
        J = F.mul(H, I)
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
        SJ = F.mul(S1, J)
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(SJ, SJ))
        Z3 = F.mul(F.sub(F.sqr(F.add(Z1, Z2)), F.add(Z1Z1, Z2Z2)), H)
        added = barrier((X3, Y3, Z3))

        p_inf = self.jacobian_is_inf(p)
        q_inf = self.jacobian_is_inf(q)
        same_x = F.is_zero(H)
        same_y = F.is_zero(rr)
        out = self._sel(same_x & same_y & ~p_inf & ~q_inf,
                        self.jacobian_dbl(p), added)
        inf = self.jacobian_infinity(_any_bshape(self, X1))
        out = self._sel(same_x & ~same_y, inf, out)
        out = self._sel(q_inf, p, out)
        out = self._sel(p_inf, q, out)
        return barrier(out)

    def jacobian_to_affine(self, p):
        F = self.F
        x, y, z = p
        zi = F.batch_inv(z)
        zi2 = F.sqr(zi)
        ax = F.mul(x, zi2)
        ay = F.mul(y, F.mul(zi2, zi))
        inf = self.jacobian_is_inf(p)
        zero = self._zeros_like(x)
        return (F.select(inf, zero, ax), F.select(inf, zero, ay))

    # -- scalar multiplication (double-and-add; test/SSOT utility) -----------------
    def scalar_mul(self, a, k: int):
        """Single-point k*P on host-chosen constant k (not a hot path —
        MSM is the production route)."""
        k %= self.curve.scalar.modulus
        acc = self.xyzz_infinity(_any_bshape(self, a[0]))
        addj = self.affine_to_xyzz(a)
        while k:
            if k & 1:
                acc = self.xyzz_add(acc, addj)
            k >>= 1
            if k:
                addj = self.xyzz_dbl(addj)
        return acc

    # -- host wire conversion ---------------------------------------------------------
    def affine_from_ints(self, pts):
        """List of oracle AffinePoint (or (x, y, inf) tuples) -> device batch."""
        zero = (0, 0) if self.degree == 2 else 0
        xs, ys = [], []
        for p in pts:
            inf = getattr(p, "inf", False)
            x = zero if inf else p.x
            y = zero if inf else p.y
            xs.append(x)
            ys.append(y)
        if self.degree == 2:
            return (self.F.from_int_list(xs), self.F.from_int_list(ys))
        return (self.base.from_int_list(xs, batch_shape=(len(xs),)),
                self.base.from_int_list(ys, batch_shape=(len(ys),)))

    def affine_to_ints(self, a):
        xs = self.F.to_int_list(a[0])
        ys = self.F.to_int_list(a[1])
        return list(zip(xs, ys))

    # -- zero-copy wire ingestion (ffi_affine_sz path) ------------------------
    def _coord_from_wire(self, words: np.ndarray):
        """(n, degree*n32) wire words -> device coordinate batch."""
        if self.degree == 2:
            n32 = words.shape[-1] // 2
            return (self.base.from_wire_np(np.ascontiguousarray(words[:, :n32])),
                    self.base.from_wire_np(np.ascontiguousarray(words[:, n32:])))
        return self.base.from_wire_np(words)

    def affine_from_wire(self, x_words=None, y_words=None, buf=None,
                         ffi_affine_sz: int = 0):
        """Vectorized wire ingestion of an affine point batch — the role of
        the strided FFI upload (msm/pippenger.cuh:379, 501-503) with the
        Affine_inf_t layout (ec/affine_t.hpp:75-122).

        Either pass `x_words`/`y_words` — (n, n32) u32 little-endian word
        arrays per coordinate (G2: (n, 2*n32), c0||c1), in the field's wire
        form (Montgomery for the big curves, raw for gl64-style fields) —
        or a flat byte `buf` with per-point stride `ffi_affine_sz` holding
        x||y[||inf]; inf-flagged points are zeroed to the (0, 0) infinity
        encoding (affine_t.hpp:31-36).  No per-point Python loop anywhere.
        """
        if buf is not None:
            raw = np.frombuffer(np.ascontiguousarray(buf), dtype=np.uint8)
            cb = self._coord_bytes()
            sz = ffi_affine_sz or 2 * cb
            if sz < 2 * cb or len(raw) % sz:
                raise ValueError(
                    f"buffer length {len(raw)} not a multiple of point "
                    f"stride {sz} (coord bytes {cb})")
            pts = raw.reshape(-1, sz)
            x_words = np.ascontiguousarray(pts[:, :cb]).view(np.uint32)
            y_words = np.ascontiguousarray(pts[:, cb:2 * cb]).view(np.uint32)
            x_words = x_words.reshape(len(pts), cb // 4)
            y_words = y_words.reshape(len(pts), cb // 4)
            if sz > 2 * cb:                       # explicit inf byte
                inf = pts[:, 2 * cb] != 0
                if inf.any():
                    x_words = np.where(inf[:, None], 0,
                                       x_words).astype(np.uint32)
                    y_words = np.where(inf[:, None], 0,
                                       y_words).astype(np.uint32)
        x_words = np.asarray(x_words)
        y_words = np.asarray(y_words)
        return (self._coord_from_wire(x_words),
                self._coord_from_wire(y_words))

    def _coord_bytes(self) -> int:
        bits = self.base.params.mont_bits if self.base.n_limbs else \
            ((self.base.params.bits + 63) // 64) * 64 \
            if self.base.params.bits > 32 else 32
        return (bits // 8) * self.degree

    def affine_to_wire(self, a):
        """Device affine batch -> (x_words, y_words) numpy wire arrays."""
        def conv(c):
            if self.degree == 2:
                w0 = self.base.to_wire_np(c[0])
                w1 = self.base.to_wire_np(c[1])
                return np.concatenate([np.atleast_2d(w0), np.atleast_2d(w1)],
                                      axis=-1)
            return self.base.to_wire_np(c)
        return conv(a[0]), conv(a[1])


def _bshape(base, x):
    return x.shape[1:] if base.n_limbs else x.shape


def _any_bshape(ops: CurveOps, coord):
    if ops.degree == 2:
        return _bshape(ops.base, coord[0])
    return _bshape(ops.base, coord)


@functools.lru_cache(maxsize=None)
def get_curve_ops(name: str) -> CurveOps:
    return CurveOps(get_curve(name))
