"""Fused Pallas EC kernels for big-Montgomery curves.

The MSM bucket op — unified xyzz mixed add (ec/xyzz_t.hpp:352-430) — runs
as ONE Pallas kernel per accumulation round: all ~25K limb intermediates of
the 8M+2S fast leg stay in VMEM/vector registers, where the per-field-op
dispatch path pays an HBM round-trip per multiply.

TPU-first notes:
  * there is no warp divergence, so the reference's uadd state machine is
    unnecessary; but the unified madd's branchless doubling leg (6M+3S,
    xyzz_t.hpp:111-116) would cost ~40% extra on EVERY lane.  Doubling in a
    bucket round only happens when a bucket's run contains the same point
    twice consecutively — rare — so the doubling leg is gated per BLOCK
    with `pl.when(any(dbl))`: blocks without a doubling lane skip it
    entirely (the TPU analogue of the reference's divergence-free uadd).
  * infinity / empty-bucket / cancellation handling is the same csel chain
    as ec/core.py:xyzz_madd, in list form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import get_curve
from ..ff.bigmont import (BigMontField, mul_limbs, sqr_limbs, add_limbs,
                          sub_limbs_mod)

_BLOCK_ROWS = 32

# Mosaic's default scoped-vmem limit (16 MiB) is marginal for the fused
# add/pair kernels at 32-row blocks (measured 16.63 MiB at L=24, rb=32);
# v5e has headroom, so ask for more (same pattern as ntt/pallas_kernels).
_VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params():
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    import os
    return os.environ.get("SPPARK_PALLAS_INTERPRET") == "1"



def _pick_rb(R: int) -> int:
    """Rows per block: Mosaic requires the second-minor block dim be a
    multiple of 8 or the whole axis."""
    for cand in range(min(_BLOCK_ROWS, R), 7, -1):
        if R % cand == 0 and cand % 8 == 0:
            return cand
    return R


def _pad_lanes(n: int) -> int:
    """Pad lane count to a 128 granule; large batches pad to 1024 so the
    row count stays divisible by 8 (see _pick_rb)."""
    g = 1024 if n > 8192 else 128
    return -(-n // g) * g


def _is_zero_list(xs):
    acc = xs[0]
    for x in xs[1:]:
        acc = acc | x
    return acc == 0


def _sel_list(cond, a, b):
    return [jnp.where(cond, u, v) for u, v in zip(a, b)]


def use_fused_madd(ops) -> bool:
    """Fused kernels apply to curves over multi-limb Montgomery base
    fields — G1 and, since round 4, G2 (fp2 Karatsuba inlined over limb
    lists) — on TPU backends (or under SPPARK_PALLAS_INTERPRET)."""
    if not isinstance(ops.base, BigMontField):
        return False
    return _interpret() or jax.default_backend() not in ("cpu",)


class _KCtx:
    """Field-element vocabulary for the fused kernels, closing over one
    curve: elements are limb-plane LISTS for degree-1 curves and
    (c0_list, c1_list) pairs for G2/fp2 curves (the reference's warp-pair
    fp2, ff/alt_bn128-fp2.hpp:25-60, becomes an explicit coefficient pair
    of plane lists; mul is 3 base muls via Karatsuba, matching the fused
    dot_product mul count at :50-60).

    Each point coordinate travels through the pallas_call as ONE stacked
    (planes, rb, 128) block with planes = degree * L."""

    def __init__(self, curve_name: str):
        curve = get_curve(curve_name)
        fp = curve.field
        self.L = L = fp.mont_bits // 16
        self.degree = 2 if curve.fp2 is not None else 1
        self.planes = L * self.degree
        self.P = np.asarray(
            [(fp.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
            dtype=np.uint32)
        self.M0 = np.uint32(fp.m0(16))
        one = [np.uint32((fp.one_mont >> (16 * i)) & 0xFFFF)
               for i in range(L)]
        self._one_limbs = one
        self.A4 = None
        if curve.a4:
            assert self.degree == 1
            a4m = fp.to_mont(curve.a4 % fp.modulus)
            self.A4 = [np.uint32((a4m >> (16 * i)) & 0xFFFF)
                       for i in range(L)]
        if self.degree == 2:
            nr = curve.fp2.nonresidue % fp.modulus
            # small signed nonresidue (-1 for BN254/BLS12-381, -5 for
            # BLS12-377, +7 for the test tower): mul-by-nr = a few adds
            self.nr = nr if nr <= fp.modulus // 2 else nr - fp.modulus
            assert abs(self.nr) < 16, "nonresidue too large to inline"

    # -- base (single-coefficient) limb ops ---------------------------------
    def _bmul(self, a, b):
        return mul_limbs(a, b, self.P, self.M0)

    def _bsqr(self, a):
        return sqr_limbs(a, self.P, self.M0)

    def _badd(self, a, b):
        return add_limbs(a, b, self.P)

    def _bsub(self, a, b):
        return sub_limbs_mod(a, b, self.P)

    def _bsmall(self, a, k: int):
        """a * k for a small positive int k, by double-and-add."""
        acc = None
        run = a
        while k:
            if k & 1:
                acc = run if acc is None else self._badd(acc, run)
            k >>= 1
            if k:
                run = self._badd(run, run)
        return acc

    # -- element ops ---------------------------------------------------------
    def read(self, ref, base: int = 0):
        """Kernel ref -> element (list or pair of lists)."""
        L = self.L
        if self.degree == 1:
            return [ref[base + i] for i in range(L)]
        return ([ref[base + i] for i in range(L)],
                [ref[base + L + i] for i in range(L)])

    def pack(self, el):
        if self.degree == 1:
            return jnp.stack(el)
        return jnp.stack(list(el[0]) + list(el[1]))

    def mul(self, a, b):
        if self.degree == 1:
            return self._bmul(a, b)
        t0 = self._bmul(a[0], b[0])
        t1 = self._bmul(a[1], b[1])
        mid = self._bmul(self._badd(a[0], a[1]), self._badd(b[0], b[1]))
        c1 = self._bsub(self._bsub(mid, t0), t1)
        nt1 = self._bsmall(t1, abs(self.nr))
        c0 = self._badd(t0, nt1) if self.nr > 0 else self._bsub(t0, nt1)
        return (c0, c1)

    def sqr(self, a):
        if self.degree == 1:
            return self._bsqr(a)
        t0 = self._bsqr(a[0])
        t1 = self._bsqr(a[1])
        m = self._bmul(a[0], a[1])
        c1 = self._badd(m, m)
        nt1 = self._bsmall(t1, abs(self.nr))
        c0 = self._badd(t0, nt1) if self.nr > 0 else self._bsub(t0, nt1)
        return (c0, c1)

    def add(self, a, b):
        if self.degree == 1:
            return self._badd(a, b)
        return (self._badd(a[0], b[0]), self._badd(a[1], b[1]))

    def sub(self, a, b):
        if self.degree == 1:
            return self._bsub(a, b)
        return (self._bsub(a[0], b[0]), self._bsub(a[1], b[1]))

    def is_zero(self, a):
        if self.degree == 1:
            return _is_zero_list(a)
        return _is_zero_list(list(a[0]) + list(a[1]))

    def sel(self, cond, a, b):
        if self.degree == 1:
            return _sel_list(cond, a, b)
        return (_sel_list(cond, a[0], b[0]), _sel_list(cond, a[1], b[1]))

    def zero(self, like):
        z = [jnp.zeros_like(like)] * self.L
        return z if self.degree == 1 else (z, list(z))

    def one(self, like):
        o = [jnp.full_like(like, v) for v in self._one_limbs]
        if self.degree == 1:
            return o
        return (o, [jnp.zeros_like(like)] * self.L)

    def a4_el(self, like):
        if self.A4 is None:
            return None
        return [jnp.full_like(like, v) for v in self.A4]


@functools.lru_cache(maxsize=None)
def _add_call(curve_name: str, R: int, interpret: bool):
    """Fused unified xyzz + xyzz add (add-2008-s, ec/xyzz_t.hpp:117-201):
    the integrate/window-combine workhorse.  Same structure as _madd_call:
    fast leg always, block-gated doubling leg, csel special-case chain."""
    K = _KCtx(curve_name)
    rb = _pick_rb(R)
    mul, sqr, add, sub = K.mul, K.sqr, K.add, K.sub

    def kernel(x1_r, y1_r, zz1_r, zzz1_r, x2_r, y2_r, zz2_r, zzz2_r,
               ox_r, oy_r, ozz_r, ozzz_r):
        X1, Y1, ZZ1, ZZZ1 = (K.read(r) for r in (x1_r, y1_r, zz1_r, zzz1_r))
        X2, Y2, ZZ2, ZZZ2 = (K.read(r) for r in (x2_r, y2_r, zz2_r, zzz2_r))

        U1 = mul(X1, ZZ2)
        U2 = mul(X2, ZZ1)
        S1 = mul(Y1, ZZZ2)
        S2 = mul(Y2, ZZZ1)
        P = sub(U2, U1)
        Rr = sub(S2, S1)
        PP = sqr(P)
        PPP = mul(P, PP)
        Q = mul(U1, PP)
        X3 = sub(sub(sqr(Rr), PPP), add(Q, Q))
        Y3 = sub(mul(Rr, sub(Q, X3)), mul(S1, PPP))
        ZZ3 = mul(mul(ZZ1, ZZ2), PP)
        ZZZ3 = mul(mul(ZZZ1, ZZZ2), PPP)

        p_inf = K.is_zero(ZZ1)
        q_inf = K.is_zero(ZZ2)
        same_x = K.is_zero(P)
        same_y = K.is_zero(Rr)
        zero = K.zero(x1_r[0])

        cancel = same_x & ~same_y
        out = [(X3, Y3, ZZ3, ZZZ3)[k] for k in range(4)]
        out = [K.sel(cancel, zero, c) for c in out]
        q_pt = (X2, Y2, ZZ2, ZZZ2)
        p_pt = (X1, Y1, ZZ1, ZZZ1)
        out = [K.sel(p_inf, q_pt[k], out[k]) for k in range(4)]
        out = [K.sel(q_inf, p_pt[k], out[k]) for k in range(4)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = K.pack(c)

        dbl_mask = same_x & same_y & ~p_inf & ~q_inf

        def _dbl_leg():
            U = add(Y1, Y1)
            V = sqr(U)
            W = mul(U, V)
            S = mul(X1, V)
            x2 = sqr(X1)
            M = add(add(x2, x2), x2)
            a4p = K.a4_el(x1_r[0])
            if a4p is not None:
                M = add(M, mul(a4p, sqr(ZZ1)))
            dX = sub(sqr(M), add(S, S))
            dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
            dZZ = mul(V, ZZ1)
            dZZZ = mul(W, ZZZ1)
            bad = K.is_zero(Y1)
            dres = [K.sel(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
            for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), dres):
                r[:] = K.pack(K.sel(dbl_mask, c, K.read(r)))

        if interpret:
            _dbl_leg()
        else:
            pl.when(jnp.any(dbl_mask))(_dbl_leg)

    blk = (K.planes, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((K.planes, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 8,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )


def _pack_coords(coords):
    """Possibly-fp2 coordinate list -> stacked plane arrays broadcast to a
    common batch (fp2 coefficient pairs concatenate along the plane axis)."""
    packed = [jnp.concatenate(list(c), axis=0) if isinstance(c, tuple)
              else c for c in coords]
    P = packed[0].shape[0]
    batch = jnp.broadcast_shapes(*(c.shape[1:] for c in packed))
    return [jnp.broadcast_to(c, (P,) + batch) for c in packed]


def _unpack_coords(curve_name: str, outs):
    if get_curve(curve_name).fp2 is None:
        return tuple(outs)
    L = outs[0].shape[0] // 2
    return tuple((o[:L], o[L:]) for o in outs)


def fused_xyzz_add(curve_name: str, p, q):
    """One fused unified add: p + q, both xyzz batches of (L, *batch)
    coords — (c0, c1) pairs of those for G2 — broadcast to a common
    batch."""
    coords = _pack_coords(list(p) + list(q))
    shaped, batch, n, n_pad = _flatten_blocks(coords)
    outs = _add_call(curve_name, n_pad // 128, _interpret())(*shaped)
    return _unpack_coords(curve_name,
                          _restore_blocks(list(outs), batch, n, n_pad))


@functools.lru_cache(maxsize=None)
def _dbl_call(curve_name: str, R: int, interpret: bool):
    """Fused xyzz doubling (dbl-2008-s-1, ec/xyzz_t.hpp:111-116)."""
    K = _KCtx(curve_name)
    rb = _pick_rb(R)
    mul, sqr, add, sub = K.mul, K.sqr, K.add, K.sub

    def kernel(x_r, y_r, zz_r, zzz_r, ox_r, oy_r, ozz_r, ozzz_r):
        X1, Y1, ZZ1, ZZZ1 = (K.read(r) for r in (x_r, y_r, zz_r, zzz_r))

        U = add(Y1, Y1)
        V = sqr(U)
        W = mul(U, V)
        S = mul(X1, V)
        x2 = sqr(X1)
        M = add(add(x2, x2), x2)
        a4p = K.a4_el(x_r[0])
        if a4p is not None:
            M = add(M, mul(a4p, sqr(ZZ1)))
        dX = sub(sqr(M), add(S, S))
        dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
        dZZ = mul(V, ZZ1)
        dZZZ = mul(W, ZZZ1)
        bad = K.is_zero(Y1) | K.is_zero(ZZ1)
        zero = K.zero(x_r[0])
        out = [K.sel(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = K.pack(c)

    blk = (K.planes, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((K.planes, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )


def fused_xyzz_dbl(curve_name: str, p):
    coords = _pack_coords(list(p))
    shaped, batch, n, n_pad = _flatten_blocks(coords)
    outs = _dbl_call(curve_name, n_pad // 128, _interpret())(*shaped)
    return _unpack_coords(curve_name,
                          _restore_blocks(list(outs), batch, n, n_pad))


@functools.lru_cache(maxsize=None)
def _madd_call(curve_name: str, R: int, interpret: bool):
    K = _KCtx(curve_name)
    rb = _pick_rb(R)
    mul, sqr, add, sub = K.mul, K.sqr, K.add, K.sub

    def kernel(x1_r, y1_r, zz1_r, zzz1_r, ax_r, ay_r,
               ox_r, oy_r, ozz_r, ozzz_r):
        X1, Y1, ZZ1, ZZZ1 = (K.read(r) for r in (x1_r, y1_r, zz1_r, zzz1_r))
        ax = K.read(ax_r)
        ay = K.read(ay_r)

        # fast mixed-add leg (madd-2008-s, ec/xyzz_t.hpp:352-430)
        U2 = mul(ax, ZZ1)
        S2 = mul(ay, ZZZ1)
        P = sub(U2, X1)
        Rr = sub(S2, Y1)
        PP = sqr(P)
        PPP = mul(P, PP)
        Q = mul(X1, PP)
        R2 = sqr(Rr)
        X3 = sub(sub(R2, PPP), add(Q, Q))
        Y3 = sub(mul(Rr, sub(Q, X3)), mul(Y1, PPP))
        ZZ3 = mul(ZZ1, PP)
        ZZZ3 = mul(ZZZ1, PPP)

        a_inf = K.is_zero(ax) & K.is_zero(ay)
        p_inf = K.is_zero(ZZ1)
        same_x = K.is_zero(P)
        same_y = K.is_zero(Rr)
        zero = K.zero(x1_r[0])
        one = K.one(x1_r[0])

        # csel chain (same priority order as ec/core.py:xyzz_madd)
        cancel = same_x & ~same_y
        out = [(X3, Y3, ZZ3, ZZZ3)[k] for k in range(4)]
        out = [K.sel(cancel, zero, c) for c in out]
        promote = (ax, ay, one, one)
        out = [K.sel(p_inf, promote[k], out[k]) for k in range(4)]
        bucket = (X1, Y1, ZZ1, ZZZ1)
        out = [K.sel(a_inf, bucket[k], out[k]) for k in range(4)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = K.pack(c)

        dbl_mask = same_x & same_y & ~p_inf & ~a_inf

        def _dbl_leg():
            # doubling leg (dbl-2008-s-1, ec/xyzz_t.hpp:111-116) — on the
            # compiled path it runs only in blocks that actually contain a
            # doubling lane (pl.when gate below)
            U = add(Y1, Y1)
            V = sqr(U)
            W = mul(U, V)
            S = mul(X1, V)
            x2 = sqr(X1)
            M = add(add(x2, x2), x2)
            a4p = K.a4_el(x1_r[0])
            if a4p is not None:
                M = add(M, mul(a4p, sqr(ZZ1)))
            dX = sub(sqr(M), add(S, S))
            dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
            dZZ = mul(V, ZZ1)
            dZZZ = mul(W, ZZZ1)
            bad = K.is_zero(Y1)
            dres = [K.sel(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
            for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), dres):
                r[:] = K.pack(K.sel(dbl_mask, c, K.read(r)))

        if interpret:
            # straight-line under the interpreter: pl.when with a traced
            # predicate hangs the multi-device CPU interpret path, and the
            # gate is purely a TPU work-skip
            _dbl_leg()
        else:
            pl.when(jnp.any(dbl_mask))(_dbl_leg)

    blk = (K.planes, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((K.planes, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 6,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )


@functools.lru_cache(maxsize=None)
def _pair_prep_call(curve_name: str, R: int, interpret: bool):
    """Fused prep half of the batch-affine pair add (msm/tree.py): chord or
    tangent denominator + packed case flags.  The inversion between prep
    and finish is a cross-lane product tree, so it cannot live inside one
    block-local kernel — the pair add is two fused kernels around one
    batch inversion."""
    K = _KCtx(curve_name)
    rb = _pick_rb(R)

    def kernel(x1_r, y1_r, x2_r, y2_r, den_r, flg_r):
        X1, Y1 = K.read(x1_r), K.read(y1_r)
        X2, Y2 = K.read(x2_r), K.read(y2_r)
        dx = K.sub(X2, X1)
        dy = K.sub(Y2, Y1)
        inf_l = K.is_zero(X1) & K.is_zero(Y1)
        inf_r = K.is_zero(X2) & K.is_zero(Y2)
        same_x = K.is_zero(dx) & ~inf_l & ~inf_r
        dbl = same_x & K.is_zero(dy)
        toinf = (same_x & ~K.is_zero(dy)) | (dbl & K.is_zero(Y1))
        active = ~inf_l & ~inf_r & ~toinf
        den = K.sel(dbl, K.add(Y1, Y1), dx)
        den = K.sel(active, den, K.one(x1_r[0]))
        den_r[:] = K.pack(den)
        flg = (active.astype(jnp.uint32)
               | ((dbl & active).astype(jnp.uint32) << 1)
               | ((inf_l & ~inf_r).astype(jnp.uint32) << 2)
               | ((inf_r & ~inf_l).astype(jnp.uint32) << 3))
        flg_r[:] = flg[None]

    blk = (K.planes, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, rb, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 4,
        out_specs=(spec, fspec),
        out_shape=(jax.ShapeDtypeStruct((K.planes, R, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((1, R, 128), jnp.uint32)),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )


@functools.lru_cache(maxsize=None)
def _pair_finish_call(curve_name: str, R: int, interpret: bool):
    """Finish half: slope * inverse, chord/tangent completion, case selects.
    The tangent (doubling) leg runs only in blocks containing a doubling
    lane (duplicate points) via pl.when — same gating as _madd_call."""
    K = _KCtx(curve_name)
    rb = _pick_rb(R)
    mul, sqr, add, sub = K.mul, K.sqr, K.add, K.sub

    def kernel(x1_r, y1_r, x2_r, y2_r, inv_r, flg_r, ox_r, oy_r):
        X1, Y1 = K.read(x1_r), K.read(y1_r)
        X2, Y2 = K.read(x2_r), K.read(y2_r)
        DI = K.read(inv_r)
        flg = flg_r[0]
        active = (flg & 1) == 1
        dbl = (flg & 2) == 2
        use_r = (flg & 4) == 4
        use_l = (flg & 8) == 8

        dy = sub(Y2, Y1)
        lam = mul(dy, DI)
        x3 = sub(sub(sqr(lam), X1), X2)
        y3 = sub(mul(lam, sub(X1, x3)), Y1)
        zero = K.zero(x1_r[0])
        ox = K.sel(active, x3, zero)
        oy = K.sel(active, y3, zero)
        ox = K.sel(use_r, X2, ox)
        oy = K.sel(use_r, Y2, oy)
        ox = K.sel(use_l, X1, ox)
        oy = K.sel(use_l, Y1, oy)
        ox_r[:] = K.pack(ox)
        oy_r[:] = K.pack(oy)

        def _dbl_leg():
            x1sq = sqr(X1)
            M = add(add(x1sq, x1sq), x1sq)
            a4p = K.a4_el(x1_r[0])
            if a4p is not None:
                M = add(M, a4p)
            lamd = mul(M, DI)
            x3d = sub(sub(sqr(lamd), X1), X1)
            y3d = sub(mul(lamd, sub(X1, x3d)), Y1)
            ox_r[:] = K.pack(K.sel(dbl, x3d, K.read(ox_r)))
            oy_r[:] = K.pack(K.sel(dbl, y3d, K.read(oy_r)))

        if interpret:
            _dbl_leg()
        else:
            pl.when(jnp.any(dbl))(_dbl_leg)

    blk = (K.planes, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, rb, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((K.planes, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 5 + [fspec],
        out_specs=(spec,) * 2,
        out_shape=(shape,) * 2,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )


def _flatten_blocks(coords):
    """(L, *batch) coord list -> padded (L, R, 128) blocks + restore info."""
    L = coords[0].shape[0]
    batch = coords[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    n_pad = _pad_lanes(n)
    flat = [c.reshape(L, n) for c in coords]
    if n_pad != n:
        flat = [jnp.pad(c, ((0, 0), (0, n_pad - n))) for c in flat]
    return [c.reshape(L, n_pad // 128, 128) for c in flat], batch, n, n_pad


def _restore_blocks(outs, batch, n, n_pad):
    outs = [o.reshape(o.shape[0], n_pad) for o in outs]
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return tuple(o.reshape((o.shape[0],) + batch) for o in outs)


def fused_affine_pair(curve_name: str, l, r):
    """Batch-affine pair add l + r for the tree accumulator (msm/tree.py):
    fused prep kernel -> cross-lane batch inversion -> fused finish
    kernel.  Coords are (L, *batch) u32 planes ((c0, c1) pairs for G2;
    the inversion then runs through Fp2's norm-map batch_inv_tree)."""
    from .core import get_curve_ops
    from ..msm.tree import batch_inv_flat
    F = get_curve_ops(curve_name).F
    coords = _pack_coords(list(l) + list(r))
    shaped, batch, n, n_pad = _flatten_blocks(coords)
    interp = _interpret()
    den_b, flg_b = _pair_prep_call(curve_name, n_pad // 128, interp)(*shaped)
    den_p, = _restore_blocks([den_b], batch, n, n_pad)
    den, = _unpack_coords(curve_name, [den_p])

    if jax.tree.leaves(den)[0].ndim == 2:      # batch_inv_flat wants >= 2
        den = jax.tree.map(lambda a: a[:, None, :], den)
        dinv = jax.tree.map(lambda a: a[:, 0, :], batch_inv_flat(F, den))
    else:
        dinv = batch_inv_flat(F, den)
    dinv_b, _, _, _ = _flatten_blocks(_pack_coords([dinv]))
    outs = _pair_finish_call(curve_name, n_pad // 128, interp)(
        *shaped, dinv_b[0], flg_b)
    return _unpack_coords(curve_name,
                          _restore_blocks(list(outs), batch, n, n_pad))


def fused_xyzz_madd(curve_name: str, bucket, point):
    """One fused madd round: bucket (x, y, zz, zzz) += point (ax, ay),
    all coords (L, *batch) u32 planes ((c0, c1) pairs for G2).  Batch is
    flattened/padded to (planes, R, 128) blocks."""
    coords = _pack_coords(list(bucket) + list(point))
    shaped, batch, n, n_pad = _flatten_blocks(coords)
    outs = _madd_call(curve_name, n_pad // 128, _interpret())(*shaped)
    return _unpack_coords(curve_name,
                          _restore_blocks(list(outs), batch, n, n_pad))
