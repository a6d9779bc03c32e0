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
    """Fused kernel applies to degree-1 curves over multi-limb Montgomery
    fields on TPU backends (or under SPPARK_PALLAS_INTERPRET)."""
    if ops.degree != 1 or not isinstance(ops.base, BigMontField):
        return False
    return _interpret() or jax.default_backend() not in ("cpu",)


@functools.lru_cache(maxsize=None)
def _add_call(curve_name: str, R: int, interpret: bool):
    """Fused unified xyzz + xyzz add (add-2008-s, ec/xyzz_t.hpp:117-201):
    the integrate/window-combine workhorse.  Same structure as _madd_call:
    fast leg always, block-gated doubling leg, csel special-case chain."""
    curve = get_curve(curve_name)
    fp = curve.field
    L = fp.mont_bits // 16
    P_LIMBS = np.asarray(
        [(fp.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
        dtype=np.uint32)
    M0 = np.uint32(fp.m0(16))
    A4 = None
    if curve.a4:
        a4m = fp.to_mont(curve.a4 % fp.modulus)
        A4 = [np.uint32((a4m >> (16 * i)) & 0xFFFF) for i in range(L)]
    rb = _pick_rb(R)

    def mul(a, b):
        return mul_limbs(a, b, P_LIMBS, M0)

    def sqr(a):
        return sqr_limbs(a, P_LIMBS, M0)

    def add(a, b):
        return add_limbs(a, b, P_LIMBS)

    def sub(a, b):
        return sub_limbs_mod(a, b, P_LIMBS)

    def kernel(x1_r, y1_r, zz1_r, zzz1_r, x2_r, y2_r, zz2_r, zzz2_r,
               ox_r, oy_r, ozz_r, ozzz_r):
        X1 = [x1_r[i] for i in range(L)]
        Y1 = [y1_r[i] for i in range(L)]
        ZZ1 = [zz1_r[i] for i in range(L)]
        ZZZ1 = [zzz1_r[i] for i in range(L)]
        X2 = [x2_r[i] for i in range(L)]
        Y2 = [y2_r[i] for i in range(L)]
        ZZ2 = [zz2_r[i] for i in range(L)]
        ZZZ2 = [zzz2_r[i] for i in range(L)]

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

        p_inf = _is_zero_list(ZZ1)
        q_inf = _is_zero_list(ZZ2)
        same_x = _is_zero_list(P)
        same_y = _is_zero_list(Rr)
        zero = [jnp.zeros_like(X1[0])] * L

        cancel = same_x & ~same_y
        out = [(X3, Y3, ZZ3, ZZZ3)[k] for k in range(4)]
        out = [_sel_list(cancel, zero, c) for c in out]
        q_pt = (X2, Y2, ZZ2, ZZZ2)
        p_pt = (X1, Y1, ZZ1, ZZZ1)
        out = [_sel_list(p_inf, q_pt[k], out[k]) for k in range(4)]
        out = [_sel_list(q_inf, p_pt[k], out[k]) for k in range(4)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = jnp.stack(c)

        dbl_mask = same_x & same_y & ~p_inf & ~q_inf

        def _dbl_leg():
            U = add(Y1, Y1)
            V = sqr(U)
            W = mul(U, V)
            S = mul(X1, V)
            x2 = sqr(X1)
            M = add(add(x2, x2), x2)
            if A4 is not None:
                a4p = [jnp.full_like(X1[0], v) for v in A4]
                M = add(M, mul(a4p, sqr(ZZ1)))
            dX = sub(sqr(M), add(S, S))
            dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
            dZZ = mul(V, ZZ1)
            dZZZ = mul(W, ZZZ1)
            bad = _is_zero_list(Y1)
            dres = [_sel_list(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
            for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), dres):
                r[:] = jnp.stack(_sel_list(dbl_mask,
                                           c, [r[i] for i in range(L)]))

        if interpret:
            _dbl_leg()
        else:
            pl.when(jnp.any(dbl_mask))(_dbl_leg)

    blk = (L, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 8,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
    )


def fused_xyzz_add(curve_name: str, p, q):
    """One fused unified add: p + q, both xyzz batches of (L, *batch)
    coords (broadcast to a common batch)."""
    coords = list(p) + list(q)
    L = coords[0].shape[0]
    batch = jnp.broadcast_shapes(*(c.shape[1:] for c in coords))
    coords = [jnp.broadcast_to(c, (L,) + batch) for c in coords]
    n = int(np.prod(batch)) if batch else 1
    n_pad = _pad_lanes(n)
    flat = [c.reshape(L, n) for c in coords]
    if n_pad != n:
        flat = [jnp.pad(c, ((0, 0), (0, n_pad - n))) for c in flat]
    shaped = [c.reshape(L, n_pad // 128, 128) for c in flat]
    outs = _add_call(curve_name, n_pad // 128, _interpret())(*shaped)
    outs = [o.reshape(L, n_pad) for o in outs]
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return tuple(o.reshape((L,) + batch) for o in outs)


@functools.lru_cache(maxsize=None)
def _dbl_call(curve_name: str, R: int, interpret: bool):
    """Fused xyzz doubling (dbl-2008-s-1, ec/xyzz_t.hpp:111-116)."""
    curve = get_curve(curve_name)
    fp = curve.field
    L = fp.mont_bits // 16
    P_LIMBS = np.asarray(
        [(fp.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
        dtype=np.uint32)
    M0 = np.uint32(fp.m0(16))
    A4 = None
    if curve.a4:
        a4m = fp.to_mont(curve.a4 % fp.modulus)
        A4 = [np.uint32((a4m >> (16 * i)) & 0xFFFF) for i in range(L)]
    rb = _pick_rb(R)

    def kernel(x_r, y_r, zz_r, zzz_r, ox_r, oy_r, ozz_r, ozzz_r):
        X1 = [x_r[i] for i in range(L)]
        Y1 = [y_r[i] for i in range(L)]
        ZZ1 = [zz_r[i] for i in range(L)]
        ZZZ1 = [zzz_r[i] for i in range(L)]

        def mul(a, b):
            return mul_limbs(a, b, P_LIMBS, M0)

        def sqr(a):
            return sqr_limbs(a, P_LIMBS, M0)

        def add(a, b):
            return add_limbs(a, b, P_LIMBS)

        def sub(a, b):
            return sub_limbs_mod(a, b, P_LIMBS)

        U = add(Y1, Y1)
        V = sqr(U)
        W = mul(U, V)
        S = mul(X1, V)
        x2 = sqr(X1)
        M = add(add(x2, x2), x2)
        if A4 is not None:
            a4p = [jnp.full_like(X1[0], v) for v in A4]
            M = add(M, mul(a4p, sqr(ZZ1)))
        dX = sub(sqr(M), add(S, S))
        dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
        dZZ = mul(V, ZZ1)
        dZZZ = mul(W, ZZZ1)
        bad = _is_zero_list(Y1) | _is_zero_list(ZZ1)
        zero = [jnp.zeros_like(X1[0])] * L
        out = [_sel_list(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = jnp.stack(c)

    blk = (L, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
    )


def fused_xyzz_dbl(curve_name: str, p):
    coords = list(p)
    L = coords[0].shape[0]
    batch = coords[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    n_pad = _pad_lanes(n)
    flat = [c.reshape(L, n) for c in coords]
    if n_pad != n:
        flat = [jnp.pad(c, ((0, 0), (0, n_pad - n))) for c in flat]
    shaped = [c.reshape(L, n_pad // 128, 128) for c in flat]
    outs = _dbl_call(curve_name, n_pad // 128, _interpret())(*shaped)
    outs = [o.reshape(L, n_pad) for o in outs]
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return tuple(o.reshape((L,) + batch) for o in outs)


@functools.lru_cache(maxsize=None)
def _madd_call(curve_name: str, R: int, interpret: bool):
    curve = get_curve(curve_name)
    fp = curve.field
    L = fp.mont_bits // 16
    P_LIMBS = np.asarray(
        [(fp.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
        dtype=np.uint32)
    M0 = np.uint32(fp.m0(16))
    ONE = [np.uint32((fp.one_mont >> (16 * i)) & 0xFFFF) for i in range(L)]
    A4 = None
    if curve.a4:
        a4m = fp.to_mont(curve.a4 % fp.modulus)
        A4 = [np.uint32((a4m >> (16 * i)) & 0xFFFF) for i in range(L)]
    rb = _pick_rb(R)

    def mul(a, b):
        return mul_limbs(a, b, P_LIMBS, M0)

    def sqr(a):
        return sqr_limbs(a, P_LIMBS, M0)

    def add(a, b):
        return add_limbs(a, b, P_LIMBS)

    def sub(a, b):
        return sub_limbs_mod(a, b, P_LIMBS)

    def kernel(x1_r, y1_r, zz1_r, zzz1_r, ax_r, ay_r,
               ox_r, oy_r, ozz_r, ozzz_r):
        X1 = [x1_r[i] for i in range(L)]
        Y1 = [y1_r[i] for i in range(L)]
        ZZ1 = [zz1_r[i] for i in range(L)]
        ZZZ1 = [zzz1_r[i] for i in range(L)]
        ax = [ax_r[i] for i in range(L)]
        ay = [ay_r[i] for i in range(L)]

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

        a_inf = _is_zero_list(ax) & _is_zero_list(ay)
        p_inf = _is_zero_list(ZZ1)
        same_x = _is_zero_list(P)
        same_y = _is_zero_list(Rr)
        zero = [jnp.zeros_like(X1[0])] * L
        one = [jnp.full_like(X1[0], v) for v in ONE]

        # csel chain (same priority order as ec/core.py:xyzz_madd)
        cancel = same_x & ~same_y
        out = [(X3, Y3, ZZ3, ZZZ3)[k] for k in range(4)]
        out = [_sel_list(cancel, zero, c) for c in out]
        promote = (ax, ay, one, one)
        out = [_sel_list(p_inf, promote[k], out[k]) for k in range(4)]
        bucket = (X1, Y1, ZZ1, ZZZ1)
        out = [_sel_list(a_inf, bucket[k], out[k]) for k in range(4)]
        for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), out):
            r[:] = jnp.stack(c)

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
            if A4 is not None:
                a4p = [jnp.full_like(X1[0], v) for v in A4]
                M = add(M, mul(a4p, sqr(ZZ1)))
            dX = sub(sqr(M), add(S, S))
            dY = sub(mul(M, sub(S, dX)), mul(W, Y1))
            dZZ = mul(V, ZZ1)
            dZZZ = mul(W, ZZZ1)
            bad = _is_zero_list(Y1)
            dres = [_sel_list(bad, zero, c) for c in (dX, dY, dZZ, dZZZ)]
            for r, c in zip((ox_r, oy_r, ozz_r, ozzz_r), dres):
                r[:] = jnp.stack(_sel_list(dbl_mask,
                                           c, [r[i] for i in range(L)]))

        if interpret:
            # straight-line under the interpreter: pl.when with a traced
            # predicate hangs the multi-device CPU interpret path, and the
            # gate is purely a TPU work-skip
            _dbl_leg()
        else:
            pl.when(jnp.any(dbl_mask))(_dbl_leg)

    blk = (L, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, R, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * 6,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=interpret,
    )


def fused_xyzz_madd(curve_name: str, bucket, point):
    """One fused madd round: bucket (x, y, zz, zzz) += point (ax, ay),
    all coords (L, *batch) u32 planes.  Batch is flattened/padded to
    (L, R, 128) blocks."""
    coords = list(bucket) + list(point)
    L = coords[0].shape[0]
    batch = coords[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    n_pad = _pad_lanes(n)
    flat = [c.reshape(L, n) for c in coords]
    if n_pad != n:
        flat = [jnp.pad(c, ((0, 0), (0, n_pad - n))) for c in flat]
    shaped = [c.reshape(L, n_pad // 128, 128) for c in flat]
    outs = _madd_call(curve_name, n_pad // 128, _interpret())(*shaped)
    outs = [o.reshape(L, n_pad) for o in outs]
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return tuple(o.reshape((L,) + batch) for o in outs)
