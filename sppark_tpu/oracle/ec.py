"""Big-int reference elliptic-curve arithmetic (oracle).

Mirrors the semantics of ec/affine_t.hpp, ec/jacobian_t.hpp and ec/xyzz_t.hpp:
  - affine infinity encoded as X == Y == 0 (ec/affine_t.hpp:31-36)
  - jacobian infinity Z == 0 (ec/jacobian_t.hpp:16)
  - xyzz infinity ZZ == 0 (ec/xyzz_t.hpp:16, add :117-201)
Formulas are the standard EFD ones the reference cites: add-2007-bl,
madd-2007-bl, dbl-2009-l for jacobian (ec/jacobian_t.hpp:236-384) and the
xyzz add/madd set (ec/xyzz_t.hpp:111-116).

Generic over the coordinate field ops object (oracle.field.Fr or Fp2), so the
same code serves G1 and G2.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Any, Optional

from ..params import CurveParams
from .field import Fr, Fp2


def _field_ops(curve: CurveParams):
    if curve.fp2 is not None:
        return Fp2(curve.fp2)
    return Fr(curve.field)


def _b_of(curve: CurveParams, F) -> Any:
    if curve.fp2 is not None:
        return (curve.b % curve.field.modulus, curve.b_c1 % curve.field.modulus)
    return curve.b % curve.field.modulus


def _zero(F):
    return (0, 0) if isinstance(F, Fp2) else 0


def _is_zero(F, a) -> bool:
    return F.is_zero(a) if isinstance(F, Fp2) else a % F.p == 0


@dataclass
class AffinePoint:
    x: Any
    y: Any
    inf: bool = False


@dataclass
class JacobianPoint:
    x: Any
    y: Any
    z: Any


@dataclass
class XyzzPoint:
    x: Any
    y: Any
    zz: Any
    zzz: Any


class CurveOracle:
    """All-in-one reference implementation for one curve."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.F = _field_ops(curve)
        self.b = _b_of(curve, self.F)
        self.scalar = Fr(curve.scalar)

    # -- constructors -----------------------------------------------------
    def infinity_affine(self) -> AffinePoint:
        z = _zero(self.F)
        return AffinePoint(z, z, True)

    def infinity_jacobian(self) -> JacobianPoint:
        z = _zero(self.F)
        return JacobianPoint(z, z, z)

    def infinity_xyzz(self) -> XyzzPoint:
        z = _zero(self.F)
        return XyzzPoint(z, z, z, z)

    def on_curve(self, p: AffinePoint) -> bool:
        if p.inf:
            return True
        F = self.F
        lhs = F.sqr(p.y)
        rhs = F.add(F.mul(F.sqr(p.x), p.x), self.b)
        if self.curve.a4:
            rhs = F.add(rhs, F.mul(self.curve.a4, p.x))
        return lhs == rhs

    # -- conversions -------------------------------------------------------
    def to_jacobian(self, p: AffinePoint) -> JacobianPoint:
        if p.inf:
            return self.infinity_jacobian()
        one = (1, 0) if isinstance(self.F, Fp2) else 1
        return JacobianPoint(p.x, p.y, one)

    def to_xyzz(self, p: AffinePoint) -> XyzzPoint:
        if p.inf:
            return self.infinity_xyzz()
        one = (1, 0) if isinstance(self.F, Fp2) else 1
        return XyzzPoint(p.x, p.y, one, one)

    def jacobian_to_affine(self, p: JacobianPoint) -> AffinePoint:
        F = self.F
        if _is_zero(F, p.z):
            return self.infinity_affine()
        zi = F.inv(p.z)
        zi2 = F.sqr(zi)
        return AffinePoint(F.mul(p.x, zi2), F.mul(p.y, F.mul(zi2, zi)), False)

    def xyzz_to_affine(self, p: XyzzPoint) -> AffinePoint:
        F = self.F
        if _is_zero(F, p.zz):
            return self.infinity_affine()
        return AffinePoint(F.mul(p.x, F.inv(p.zz)), F.mul(p.y, F.inv(p.zzz)), False)

    def xyzz_to_jacobian(self, p: XyzzPoint) -> JacobianPoint:
        # (X*ZZ... ) simplest: through affine (oracle code, clarity > speed)
        return self.to_jacobian(self.xyzz_to_affine(p))

    # -- jacobian group law -------------------------------------------------
    def jacobian_dbl(self, p: JacobianPoint) -> JacobianPoint:
        F = self.F
        if _is_zero(F, p.z) or _is_zero(F, p.y):
            return self.infinity_jacobian()
        # dbl-2009-l generalized with M = 3X^2 + a*Z^4 (the a4 template
        # parameter of ec/jacobian_t.hpp:16; in-tree curves have a = 0)
        A = F.sqr(p.x)
        B = F.sqr(p.y)
        C = F.sqr(B)
        D = F.sub(F.sqr(F.add(p.x, B)), F.add(A, C))
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        if self.curve.a4:
            E = F.add(E, F.mul(self.curve.a4, F.sqr(F.sqr(p.z))))
        Fq = F.sqr(E)
        X3 = F.sub(Fq, F.add(D, D))
        C8 = F.add(F.add(C, C), F.add(C, C))
        C8 = F.add(C8, C8)
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
        Z3 = F.mul(F.add(p.y, p.y), p.z)
        return JacobianPoint(X3, Y3, Z3)

    def jacobian_add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        F = self.F
        if _is_zero(F, p.z):
            return q
        if _is_zero(F, q.z):
            return p
        # add-2007-bl: ec/jacobian_t.hpp:236-294
        Z1Z1 = F.sqr(p.z)
        Z2Z2 = F.sqr(q.z)
        U1 = F.mul(p.x, Z2Z2)
        U2 = F.mul(q.x, Z1Z1)
        S1 = F.mul(F.mul(p.y, q.z), Z2Z2)
        S2 = F.mul(F.mul(q.y, p.z), Z1Z1)
        if U1 == U2 and S1 == S2:
            return self.jacobian_dbl(p)
        H = F.sub(U2, U1)
        if _is_zero(F, H) :
            # same x, opposite y
            return self.infinity_jacobian()
        I = F.sqr(F.add(H, H))
        J = F.mul(H, I)
        r = F.add(F.sub(S2, S1), F.sub(S2, S1))
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(F.mul(S1, J), F.mul(S1, J)))
        Z3 = F.mul(F.sub(F.sqr(F.add(p.z, q.z)), F.add(Z1Z1, Z2Z2)), H)
        return JacobianPoint(X3, Y3, Z3)

    # -- xyzz group law ------------------------------------------------------
    def xyzz_dbl(self, p: XyzzPoint) -> XyzzPoint:
        F = self.F
        if _is_zero(F, p.zz) or _is_zero(F, p.y):
            return self.infinity_xyzz()
        # dbl-2008-s-1 on xyzz (ec/xyzz_t.hpp doubling leg, 6M+3S),
        # M = 3X^2 + a*ZZ^2 for the a4 != 0 template case
        U = F.add(p.y, p.y)
        V = F.sqr(U)
        W = F.mul(U, V)
        S = F.mul(p.x, V)
        M = F.mul(F.sqr(p.x), 3 if not isinstance(F, Fp2) else (3, 0))
        if self.curve.a4:
            M = F.add(M, F.mul(self.curve.a4, F.sqr(p.zz)))
        X3 = F.sub(F.sqr(M), F.add(S, S))
        Y3 = F.sub(F.mul(M, F.sub(S, X3)), F.mul(W, p.y))
        ZZ3 = F.mul(V, p.zz)
        ZZZ3 = F.mul(W, p.zzz)
        return XyzzPoint(X3, Y3, ZZ3, ZZZ3)

    def xyzz_add(self, p: XyzzPoint, q: XyzzPoint) -> XyzzPoint:
        F = self.F
        if _is_zero(F, p.zz):
            return q
        if _is_zero(F, q.zz):
            return p
        # add-2008-s on xyzz (ec/xyzz_t.hpp:117-201, 12M+2S)
        U1 = F.mul(p.x, q.zz)
        U2 = F.mul(q.x, p.zz)
        S1 = F.mul(p.y, q.zzz)
        S2 = F.mul(q.y, p.zzz)
        P = F.sub(U2, U1)
        R = F.sub(S2, S1)
        if _is_zero(F, P):
            if _is_zero(F, R):
                return self.xyzz_dbl(p)
            return self.infinity_xyzz()
        PP = F.sqr(P)
        PPP = F.mul(P, PP)
        Q = F.mul(U1, PP)
        X3 = F.sub(F.sub(F.sqr(R), PPP), F.add(Q, Q))
        Y3 = F.sub(F.mul(R, F.sub(Q, X3)), F.mul(S1, PPP))
        ZZ3 = F.mul(F.mul(p.zz, q.zz), PP)
        ZZZ3 = F.mul(F.mul(p.zzz, q.zzz), PPP)
        return XyzzPoint(X3, Y3, ZZ3, ZZZ3)

    def xyzz_madd(self, p: XyzzPoint, a: AffinePoint,
                  subtract: bool = False) -> XyzzPoint:
        """Mixed add of an affine point, optionally subtracting it — the MSM
        bucket op (ec/xyzz_t.hpp:352-430 with `subtract` negating S2)."""
        F = self.F
        if a.inf:
            return p
        ay = F.neg(a.y) if subtract else a.y
        if _is_zero(F, p.zz):
            one = (1, 0) if isinstance(F, Fp2) else 1
            return XyzzPoint(a.x, ay, one, one)
        U2 = F.mul(a.x, p.zz)
        S2 = F.mul(ay, p.zzz)
        P = F.sub(U2, p.x)
        R = F.sub(S2, p.y)
        if _is_zero(F, P):
            if _is_zero(F, R):
                return self.xyzz_dbl(p)
            return self.infinity_xyzz()
        PP = F.sqr(P)
        PPP = F.mul(P, PP)
        Q = F.mul(p.x, PP)
        X3 = F.sub(F.sub(F.sqr(R), PPP), F.add(Q, Q))
        Y3 = F.sub(F.mul(R, F.sub(Q, X3)), F.mul(p.y, PPP))
        ZZ3 = F.mul(p.zz, PP)
        ZZZ3 = F.mul(p.zzz, PPP)
        return XyzzPoint(X3, Y3, ZZ3, ZZZ3)

    # -- scalar multiplication ------------------------------------------------
    def scalar_mul(self, p: AffinePoint, k: int) -> JacobianPoint:
        acc = self.infinity_jacobian()
        addend = self.to_jacobian(p)
        k %= self.curve.scalar.modulus
        while k:
            if k & 1:
                acc = self.jacobian_add(acc, addend)
            addend = self.jacobian_dbl(addend)
            k >>= 1
        return acc

    def affine_neg(self, p: AffinePoint) -> AffinePoint:
        if p.inf:
            return p
        return AffinePoint(p.x, self.F.neg(p.y), False)

    def affine_eq(self, p: AffinePoint, q: AffinePoint) -> bool:
        if p.inf or q.inf:
            return p.inf == q.inf
        return p.x == q.x and p.y == q.y

    # -- point sampling ---------------------------------------------------------
    def random_point(self, rng: random.Random) -> AffinePoint:
        """Sample a random point of the prime-order subgroup (cofactor
        cleared, so the scalar field acts on it faithfully — matching the
        arkworks-sampled points the reference tests against)."""
        raw = self._random_curve_point(rng)
        if self.curve.cofactor == 1:
            return raw
        return self.jacobian_to_affine(self._int_mul(raw, self.curve.cofactor))

    def _int_mul(self, p: AffinePoint, k: int) -> JacobianPoint:
        """k*P for a plain integer k (no reduction mod the scalar order)."""
        acc = self.infinity_jacobian()
        addend = self.to_jacobian(p)
        while k:
            if k & 1:
                acc = self.jacobian_add(acc, addend)
            addend = self.jacobian_dbl(addend)
            k >>= 1
        return acc

    def _random_curve_point(self, rng: random.Random) -> AffinePoint:
        F = self.F
        if isinstance(F, Fp2):
            return self._find_g2_base(rng)
        p = self.curve.field.modulus
        while True:
            x = rng.randrange(p)
            rhs = (x * x * x + self.curve.a4 * x + self.curve.b) % p
            y = _sqrt_mod(rhs, p)
            if y is not None:
                if rng.randrange(2):
                    y = (-y) % p
                return AffinePoint(x, y, False)

    def _find_g2_base(self, rng: random.Random) -> AffinePoint:
        """Find some Fp2 point by brute-force over small c0/c1 for x."""
        F = self.F
        p = self.curve.field.modulus
        for trial in range(10000):
            x = (rng.randrange(p), rng.randrange(p))
            rhs = F.add(F.mul(F.sqr(x), x), self.b)
            if self.curve.a4:
                rhs = F.add(rhs, F.mul((self.curve.a4, 0), x))
            y = _sqrt_fp2(rhs, p, F.nr)
            if y is not None:
                return AffinePoint(x, y, False)
        raise RuntimeError("no fp2 point found")


def _sqrt_mod(a: int, p: int) -> Optional[int]:
    """Tonelli–Shanks square root mod prime p, or None if non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general Tonelli–Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def _sqrt_fp2(a, p: int, nr: int):
    """Square root in Fp2 = Fp[u]/(u^2 - nr) via norm trick, or None."""
    c0, c1 = a[0] % p, a[1] % p
    if c0 == 0 and c1 == 0:
        return (0, 0)
    # norm = c0^2 - nr*c1^2 must be a QR in Fp
    norm = (c0 * c0 - nr * c1 * c1) % p
    alpha = _sqrt_mod(norm, p)
    if alpha is None:
        return None
    inv2 = pow(2, -1, p)
    for sign in (1, -1):
        delta = (c0 + sign * alpha) % p * inv2 % p
        x0 = _sqrt_mod(delta, p)
        if x0 is None or x0 == 0:
            continue
        x1 = c1 * inv2 % p * pow(x0, -1, p) % p
        # verify
        if ((x0 * x0 + nr * x1 * x1) % p, (2 * x0 * x1) % p) == (c0, c1):
            return (x0, x1)
    return None


_ORACLES: dict = {}


def get_oracle(curve: CurveParams) -> CurveOracle:
    if curve.name not in _ORACLES:
        _ORACLES[curve.name] = CurveOracle(curve)
    return _ORACLES[curve.name]


def curve_generator(curve: CurveParams, rng: Optional[random.Random] = None) -> AffinePoint:
    """A point on the curve (random; deterministic given the rng)."""
    return get_oracle(curve).random_point(rng or random.Random(42))
