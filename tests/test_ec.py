"""EC layer vs the big-int oracle (role of the arkworks differential tests,
poc/msm-cuda/tests/msm.rs — but at the point-op granularity the reference
leaves untested)."""

import random

import numpy as np
import pytest

from sppark_tpu.params import get_curve
from sppark_tpu.ec import get_curve_ops, tree_take
from sppark_tpu.oracle.ec import get_oracle, AffinePoint

CURVES_G1 = ["pallas", "bn254", "bls12_381"]


def sample_points(curve_name, n, rng):
    oc = get_oracle(get_curve(curve_name))
    pts = [oc.random_point(rng) for _ in range(n)]
    return oc, pts


def to_affine_ints(ops, dev_affine):
    return ops.affine_to_ints(dev_affine)


@pytest.mark.parametrize("curve", CURVES_G1)
def test_xyzz_add_matches_oracle(curve, rng):
    oc, pts = sample_points(curve, 8, rng)
    ops = get_curve_ops(curve)
    a = ops.affine_from_ints(pts)
    b = ops.affine_from_ints(pts[::-1])
    out = ops.xyzz_to_affine(ops.xyzz_add(ops.affine_to_xyzz(a),
                                          ops.affine_to_xyzz(b)))
    got = to_affine_ints(ops, out)
    for i, (p, q) in enumerate(zip(pts, pts[::-1])):
        want = oc.xyzz_to_affine(oc.xyzz_add(oc.to_xyzz(p), oc.to_xyzz(q)))
        assert got[i] == (want.x, want.y), f"lane {i}"


@pytest.mark.parametrize("curve", CURVES_G1)
def test_xyzz_madd_special_cases(curve, rng):
    """Doubling (P==Q), cancellation (P==-Q), infinity in both slots, and a
    signed (subtract) lane — the planted-edge-case strategy of
    poc/msm-cuda/src/util.rs:24-35."""
    oc, base = sample_points(curve, 3, rng)
    p0, p1, p2 = base
    ops = get_curve_ops(curve)
    inf = AffinePoint(0, 0, True)
    # acc lanes:          p0, p0,        inf, p1,  p2
    # addend lanes:       p0, -p0,       p1,  inf, p1
    acc_pts = [p0, p0, inf, p1, p2]
    add_pts = [p0, oc.affine_neg(p0), p1, inf, p1]
    acc = ops.affine_to_xyzz(ops.affine_from_ints(acc_pts))
    add = ops.affine_from_ints(add_pts)
    out = ops.xyzz_to_affine(ops.xyzz_madd(acc, add))
    got = to_affine_ints(ops, out)
    for i, (p, q) in enumerate(zip(acc_pts, add_pts)):
        want = oc.xyzz_to_affine(oc.xyzz_madd(oc.to_xyzz(p), q))
        want_t = (0, 0) if want.inf else (want.x, want.y)
        assert got[i] == want_t, f"lane {i}"


@pytest.mark.parametrize("curve", CURVES_G1)
def test_xyzz_madd_subtract(curve, rng):
    import jax.numpy as jnp
    oc, pts = sample_points(curve, 4, rng)
    ops = get_curve_ops(curve)
    acc = ops.affine_to_xyzz(ops.affine_from_ints(pts))
    add = ops.affine_from_ints(pts[::-1])
    sign = jnp.asarray([True, False, True, False])
    out = ops.xyzz_to_affine(ops.xyzz_madd(acc, add, sign=sign))
    got = to_affine_ints(ops, out)
    for i, (p, q) in enumerate(zip(pts, pts[::-1])):
        qq = oc.affine_neg(q) if bool(sign[i]) else q
        want = oc.xyzz_to_affine(oc.xyzz_madd(oc.to_xyzz(p), qq))
        want_t = (0, 0) if want.inf else (want.x, want.y)
        assert got[i] == want_t, f"lane {i}"


@pytest.mark.parametrize("curve", ["pallas", "bn254"])
def test_jacobian_add_dbl(curve, rng):
    oc, pts = sample_points(curve, 4, rng)
    ops = get_curve_ops(curve)
    a = ops.affine_to_jacobian(ops.affine_from_ints(pts))
    b = ops.affine_to_jacobian(ops.affine_from_ints(pts[::-1]))
    out = ops.jacobian_to_affine(ops.jacobian_add(a, b))
    got = to_affine_ints(ops, out)
    for i, (p, q) in enumerate(zip(pts, pts[::-1])):
        want = oc.jacobian_to_affine(
            oc.jacobian_add(oc.to_jacobian(p), oc.to_jacobian(q)))
        want_t = (0, 0) if want.inf else (want.x, want.y)
        assert got[i] == want_t, f"lane {i}"
    # doubling
    out2 = ops.jacobian_to_affine(ops.jacobian_add(a, a))
    got2 = to_affine_ints(ops, out2)
    for i, p in enumerate(pts):
        want = oc.jacobian_to_affine(oc.jacobian_dbl(oc.to_jacobian(p)))
        assert got2[i] == (want.x, want.y), f"dbl lane {i}"


@pytest.mark.parametrize("curve", ["pallas"])
def test_xyzz_to_jacobian_roundtrip(curve, rng):
    oc, pts = sample_points(curve, 4, rng)
    ops = get_curve_ops(curve)
    x = ops.affine_to_xyzz(ops.affine_from_ints(pts))
    x2 = ops.xyzz_dbl(x)
    viaj = ops.jacobian_to_affine(ops.xyzz_to_jacobian(x2))
    direct = ops.xyzz_to_affine(x2)
    assert to_affine_ints(ops, viaj) == to_affine_ints(ops, direct)


def test_g2_madd_matches_oracle(rng):
    curve = "bls12_381_g2"
    oc = get_oracle(get_curve(curve))
    pts = [oc.random_point(rng) for _ in range(2)]
    ops = get_curve_ops(curve)
    acc = ops.affine_to_xyzz(ops.affine_from_ints(pts))
    add = ops.affine_from_ints(pts[::-1])
    out = ops.xyzz_to_affine(ops.xyzz_madd(acc, add))
    got = to_affine_ints(ops, out)
    for i, (p, q) in enumerate(zip(pts, pts[::-1])):
        want = oc.xyzz_to_affine(oc.xyzz_madd(oc.to_xyzz(p), q))
        assert got[i] == (want.x, want.y), f"lane {i}"


def test_scalar_mul_matches_oracle(rng):
    curve = "pallas"
    oc, pts = sample_points(curve, 2, rng)
    ops = get_curve_ops(curve)
    k = rng.randrange(get_curve(curve).scalar.modulus)
    a = ops.affine_from_ints(pts)
    out = ops.xyzz_to_affine(ops.scalar_mul(a, k))
    got = to_affine_ints(ops, out)
    for i, p in enumerate(pts):
        want = oc.jacobian_to_affine(oc.scalar_mul(p, k))
        want_t = (0, 0) if want.inf else (want.x, want.y)
        assert got[i] == want_t, f"lane {i}"
