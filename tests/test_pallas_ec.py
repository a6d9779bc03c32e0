"""Fused Pallas EC kernels under the Pallas interpreter (CPU-runnable).

Checks the fused xyzz madd round kernel (ec/pallas_ops.py) — the MSM hot
loop — lane-for-lane against the tested branchless ec/core.py ops, with
every special case planted: empty bucket, infinity point, doubling
(same point twice), cancellation (point and its negation), and the
block-gated doubling leg both firing and not firing.

Marked slow: the interpreted kernel's XLA-CPU compile on the 8-device CI
backend takes tens of minutes (the math itself is seconds — verified by
the same drive run standalone); the fast gate covers the fused kernel via
the MSM pipeline on TPU and the non-pallas reference ops, and `-m slow`
runs these in full.
"""

import os
import random

import pytest

from sppark_tpu.params import get_curve
from sppark_tpu.ec import get_curve_ops
from sppark_tpu.oracle.ec import get_oracle

CURVE = "test_bm64"


@pytest.fixture(autouse=True, scope="module")
def _force_interpret():
    old = os.environ.get("SPPARK_PALLAS_INTERPRET")
    os.environ["SPPARK_PALLAS_INTERPRET"] = "1"
    yield
    if old is None:
        os.environ.pop("SPPARK_PALLAS_INTERPRET", None)
    else:
        os.environ["SPPARK_PALLAS_INTERPRET"] = old


@pytest.mark.slow
def test_fused_madd_matches_core(rng):
    from sppark_tpu.ec.pallas_ops import fused_xyzz_madd, use_fused_madd

    curve = get_curve(CURVE)
    ops = get_curve_ops(CURVE)
    assert use_fused_madd(ops)
    o = get_oracle(curve)
    n = 24
    pts = [o.random_point(rng) for _ in range(n)]
    bucket_pts = [o.random_point(rng) for _ in range(n)]
    # planted special cases
    pts[1] = o.affine_neg(bucket_pts[1])                   # cancellation
    pts[2] = bucket_pts[2]                          # doubling
    from sppark_tpu.oracle.ec import AffinePoint
    pts[3] = AffinePoint(0, 0, True)                # infinity point
    # bucket 4 empty (zz = 0), plus empty-vs-infinity at 5
    pts[5] = AffinePoint(0, 0, True)

    a = ops.affine_from_ints(pts)
    bucket = ops.affine_to_xyzz(ops.affine_from_ints(bucket_pts))
    bucket = tuple(b.at[:, 4].set(0).at[:, 5].set(0) for b in bucket)

    import jax
    want = ops.xyzz_madd(bucket, a)
    # jit the call: eager interpret-mode dispatch is ~100x slower per op
    # on the 8-device CPU test backend (the production path always runs
    # inside the jitted accumulate loop anyway)
    got = jax.jit(lambda b, p: fused_xyzz_madd(CURVE, b, p))(bucket, a)
    want_aff = ops.affine_to_ints(ops.xyzz_to_affine(want))
    got_aff = ops.affine_to_ints(ops.xyzz_to_affine(got))
    assert got_aff == want_aff


@pytest.mark.slow
def test_fused_add_dbl_match_core(rng):
    """Direct coverage of the fused unified add and doubling kernels (the
    integrate/window-fold path of every TPU MSM) with planted
    cancellation, doubling-by-add, either-infinity and y == 0 lanes."""
    from sppark_tpu.ec.pallas_ops import fused_xyzz_add, fused_xyzz_dbl

    curve = get_curve(CURVE)
    ops = get_curve_ops(CURVE)
    o = get_oracle(curve)
    n = 16
    ppts = [o.random_point(rng) for _ in range(n)]
    qpts = [o.random_point(rng) for _ in range(n)]
    qpts[1] = o.affine_neg(ppts[1])                 # cancellation
    qpts[2] = ppts[2]                               # doubling via add
    p = ops.affine_to_xyzz(ops.affine_from_ints(ppts))
    q = ops.affine_to_xyzz(ops.affine_from_ints(qpts))
    # infinity lanes on either side
    p = tuple(c.at[:, 3].set(0) for c in p)
    q = tuple(c.at[:, 4].set(0) for c in q)

    import jax
    want = ops.affine_to_ints(ops.xyzz_to_affine(ops.xyzz_add(p, q)))
    got = ops.affine_to_ints(ops.xyzz_to_affine(
        jax.jit(lambda a, b: fused_xyzz_add(CURVE, a, b))(p, q)))
    assert got == want

    want_d = ops.affine_to_ints(ops.xyzz_to_affine(ops.xyzz_dbl(p)))
    got_d = ops.affine_to_ints(ops.xyzz_to_affine(
        jax.jit(lambda a: fused_xyzz_dbl(CURVE, a))(p)))
    assert got_d == want_d


@pytest.mark.slow
def test_fused_affine_pair_matches(rng):
    """The tree accumulator's fused batch-affine pair add (prep kernel +
    batch inversion + finish kernel, msm/tree.py) against the generic
    affine_pair_add, all special cases planted."""
    import jax
    from sppark_tpu.ec.pallas_ops import fused_affine_pair
    from sppark_tpu.msm.tree import affine_pair_add
    from sppark_tpu.oracle.ec import AffinePoint

    curve = get_curve(CURVE)
    ops = get_curve_ops(CURVE)
    o = get_oracle(curve)
    n = 16
    lp = [o.random_point(rng) for _ in range(n)]
    rp = [o.random_point(rng) for _ in range(n)]
    rp[1] = o.affine_neg(lp[1])                     # cancellation
    rp[2] = lp[2]                                   # doubling
    lp[3] = AffinePoint(0, 0, True)                 # left infinity
    rp[4] = AffinePoint(0, 0, True)                 # right infinity
    lp[5] = AffinePoint(0, 0, True)                 # both infinity
    rp[5] = AffinePoint(0, 0, True)
    l = ops.affine_from_ints(lp)
    r = ops.affine_from_ints(rp)
    # generic path reference (itself validated by the MSM oracle suite)
    want = ops.affine_to_ints(
        jax.jit(lambda a, b: affine_pair_add(
            ops.F, curve.a4, tuple(c[:, None, :] for c in a),
            tuple(c[:, None, :] for c in b)))(l, r))
    got = ops.affine_to_ints(
        jax.jit(lambda a, b: fused_affine_pair(CURVE, a, b))(l, r))
    assert got == want
    # and against the exact oracle
    for i in range(n):
        s = o.jacobian_to_affine(o.jacobian_add(
            o.to_jacobian(lp[i]), o.to_jacobian(rp[i])))
        gx, gy = got[i]
        assert (gx, gy) == ((0, 0) if s.inf else (s.x, s.y))


@pytest.mark.slow
def test_tree_msm_interpret_end_to_end(rng):
    """End-to-end fused tree MSM (schedule -> permute -> fused pair-add
    levels -> extraction -> fused integrate) on the BigMont test curve
    under the Pallas interpreter — the CI stand-in for the TPU path."""
    from sppark_tpu.msm import mult_pippenger
    from sppark_tpu.oracle.msm import msm_naive
    from test_msm import make_inputs

    n = 48
    points, scalars = make_inputs(CURVE, n, rng)
    scalars[5] = scalars[6] = scalars[7]            # duplicate buckets
    got = mult_pippenger(CURVE, points, scalars, wbits=6)
    want = msm_naive(get_curve(CURVE), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.slow
def test_fused_g2_madd_and_pair(rng):
    """Degree-2 (fp2) fused kernels — Karatsuba over limb lists inlined
    (the warp-pair fp2 of ff/alt_bn128-fp2.hpp:25-160 as an explicit
    coefficient pair) — on the BigMont-fp2 test curve, against the generic
    ec/core.py ops, with infinity/cancel/double lanes planted."""
    import jax
    from sppark_tpu.ec.pallas_ops import (fused_xyzz_madd, fused_affine_pair,
                                          use_fused_madd)
    from sppark_tpu.oracle.ec import AffinePoint

    g2 = "test_bm64_g2"
    curve = get_curve(g2)
    ops = get_curve_ops(g2)
    assert use_fused_madd(ops) and ops.degree == 2
    o = get_oracle(curve)
    n = 8
    pts = [o.random_point(rng) for _ in range(n)]
    bpts = [o.random_point(rng) for _ in range(n)]
    pts[1] = o.affine_neg(bpts[1])                  # cancellation
    pts[2] = bpts[2]                                # doubling
    pts[3] = AffinePoint((0, 0), (0, 0), True)      # infinity point
    a = ops.affine_from_ints(pts)
    bucket = ops.affine_to_xyzz(ops.affine_from_ints(bpts))
    want = ops.affine_to_ints(ops.xyzz_to_affine(ops.xyzz_madd(bucket, a)))
    got = ops.affine_to_ints(ops.xyzz_to_affine(
        jax.jit(lambda b, p: fused_xyzz_madd(g2, b, p))(bucket, a)))
    assert got == want

    # batch-affine pair add (tree accumulator path) with fp2 batch inv
    b_aff = ops.affine_from_ints(bpts)
    from sppark_tpu.msm.tree import affine_pair_add
    wantp = ops.affine_to_ints(
        jax.jit(lambda l, r: affine_pair_add(
            ops.F, curve.a4,
            jax.tree.map(lambda c: c[:, None, :], l),
            jax.tree.map(lambda c: c[:, None, :], r)))(b_aff, a))
    gotp = ops.affine_to_ints(
        jax.jit(lambda l, r: fused_affine_pair(g2, l, r))(b_aff, a))
    assert gotp == wantp


@pytest.mark.slow
def test_tree_msm_g2_interpret_end_to_end(rng):
    """Fused G2 tree MSM end to end on the BigMont-fp2 test curve under
    the Pallas interpreter (the role of the reference's G2 differential,
    poc/msm-cuda/tests/msm.rs:43-63, on CI)."""
    from sppark_tpu.msm import mult_pippenger
    from sppark_tpu.oracle.msm import msm_naive
    from sppark_tpu.oracle.ec import AffinePoint

    g2 = "test_bm64_g2"
    curve = get_curve(g2)
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[2] = curve.scalar.modulus - 1
    got = mult_pippenger(g2, points, scalars, wbits=6)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.slow
def test_slab_msm_interpret_end_to_end(rng):
    """Fused SLAB pipeline forced (mode="slab") under the Pallas
    interpreter: packed two-limbs-per-u32 gather, in-loop unpack, replica
    fold and ghost rows all on the production path (msm/slab.py), vs the
    exact oracle — incl. the adversarial all-equal-scalar distribution
    that concentrates every point into ONE bucket (the slab's replica-row
    spill case)."""
    from sppark_tpu.msm.pippenger import MSMContext
    from sppark_tpu.oracle.msm import msm_naive
    from test_msm import make_inputs

    n = 48
    points, scalars = make_inputs(CURVE, n, rng)
    scalars[5] = scalars[6] = scalars[7]            # duplicate buckets
    ctx = MSMContext(CURVE, n, wbits=6, mode="slab")
    got = ctx.invoke(scalars, points=points)
    want = msm_naive(get_curve(CURVE), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)

    # all-equal scalars: every point lands in one bucket per window
    eq = [scalars[0]] * n
    got_eq = ctx.invoke(eq, points=points)
    want_eq = msm_naive(get_curve(CURVE), points, eq)
    assert (got_eq.x, got_eq.y, got_eq.inf) == \
        (want_eq.x, want_eq.y, want_eq.inf)


@pytest.mark.slow
def test_slab_msm_g2_interpret_end_to_end(rng):
    """Fused G2 slab MSM forced (mode="slab"): exercises the G2 leaf
    order of the packed gather (px0, px1, py0, py1 — msm/slab.py
    round_body) and the fp2 replica fold, vs the exact oracle."""
    from sppark_tpu.msm.pippenger import MSMContext
    from sppark_tpu.oracle.msm import msm_naive
    from sppark_tpu.oracle.ec import AffinePoint

    g2 = "test_bm64_g2"
    curve = get_curve(g2)
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[2] = curve.scalar.modulus - 1
    ctx = MSMContext(g2, n, wbits=6, mode="slab")
    got = ctx.invoke(scalars, points=points)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)

    got_eq = ctx.invoke([scalars[2]] * n, points=points)
    want_eq = msm_naive(curve, points, [scalars[2]] * n)
    assert (got_eq.x, got_eq.y, got_eq.inf) == \
        (want_eq.x, want_eq.y, want_eq.inf)


@pytest.mark.slow
def test_fused_madd_no_dbl_block(rng):
    """No doubling lane anywhere: the gated leg must not fire and results
    must still be exact."""
    from sppark_tpu.ec.pallas_ops import fused_xyzz_madd

    curve = get_curve(CURVE)
    ops = get_curve_ops(CURVE)
    o = get_oracle(curve)
    n = 8
    pts = [o.random_point(rng) for _ in range(n)]
    bucket_pts = [o.random_point(rng) for _ in range(n)]
    a = ops.affine_from_ints(pts)
    bucket = ops.affine_to_xyzz(ops.affine_from_ints(bucket_pts))
    import jax
    want = ops.affine_to_ints(ops.xyzz_to_affine(ops.xyzz_madd(bucket, a)))
    got = ops.affine_to_ints(ops.xyzz_to_affine(
        jax.jit(lambda b, p: fused_xyzz_madd(CURVE, b, p))(bucket, a)))
    assert got == want
