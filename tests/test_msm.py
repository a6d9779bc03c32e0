"""MSM vs oracle (poc/msm-cuda/tests/msm.rs analogue).

Test-vector protocol mirrors the reference's planted edge cases
(poc/msm-cuda/src/util.rs:24-35): a small random point set replicated up to
size, with an explicit infinity point planted at index 3, plus zero scalars
and scalars > order/2 (the signed-digit fold path).
"""

import random

import pytest

from sppark_tpu.params import get_curve
from sppark_tpu.msm import MSMContext, mult_pippenger
from sppark_tpu.oracle.ec import get_oracle, AffinePoint
from sppark_tpu.oracle.msm import msm_naive, msm_pippenger


def make_inputs(curve_name, n, rng, distinct=8):
    """Replicated point set with infinity planted at index 3."""
    curve = get_curve(curve_name)
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(distinct)]
    points = [base[i % distinct] for i in range(n)]
    if n > 3:
        points[3] = AffinePoint(0, 0, True)
    order = curve.scalar.modulus
    scalars = [rng.randrange(order) for _ in range(n)]
    if n > 1:
        scalars[1] = 0                       # zero scalar
    if n > 2:
        scalars[2] = order - 1               # == -1: max signed-fold case
    if n > 4:
        scalars[4] = order // 2 + 1          # just over the fold boundary
    return points, scalars


# wbits=6 keeps the compiled graph small on the single-core CI box; the
# production window policy (wbits>=10) is exercised by bench.py on TPU.
_WBITS = 6


@pytest.mark.parametrize("curve", ["pallas"])
def test_msm_matches_oracle(curve, rng):
    n = 64
    points, scalars = make_inputs(curve, n, rng)
    got = mult_pippenger(curve, points, scalars, wbits=_WBITS)
    want = msm_naive(get_curve(curve), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.slow
@pytest.mark.parametrize("curve", ["bn254", "bls12_381"])
def test_msm_matches_oracle_slow(curve, rng):
    n = 64
    points, scalars = make_inputs(curve, n, rng)
    got = mult_pippenger(curve, points, scalars, wbits=_WBITS)
    want = msm_naive(get_curve(curve), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_oracle_pippenger_self_check(rng):
    """The oracle's own bucket method equals naive (validates the signed
    digit encoding both implementations share)."""
    curve = get_curve("pallas")
    points, scalars = make_inputs("pallas", 32, rng)
    a = msm_pippenger(curve, points, scalars)
    b = msm_naive(curve, points, scalars)
    assert (a.x, a.y, a.inf) == (b.x, b.y, b.inf)


def test_msm_context_reuse(rng):
    """Device-resident points reused across invocations
    (pippenger.cuh:582-601 device-pointer overloads)."""
    curve = get_curve("pallas")
    points, scalars = make_inputs("pallas", 32, rng)
    ctx = MSMContext("pallas", len(points), wbits=_WBITS)
    ctx.set_points(points)
    got1 = ctx.invoke(scalars)
    scalars2 = [s + 1 for s in scalars]
    got2 = ctx.invoke(scalars2)
    want1 = msm_naive(curve, points, scalars)
    want2 = msm_naive(curve, points, scalars2)
    assert (got1.x, got1.y) == (want1.x, want1.y)
    assert (got2.x, got2.y) == (want2.x, want2.y)


def test_msm_all_zero_scalars(rng):
    points, _ = make_inputs("pallas", 16, rng)
    got = mult_pippenger("pallas", points, [0] * 16, wbits=_WBITS)
    assert got.inf


@pytest.mark.slow
def test_msm_g2(rng):
    curve = get_curve("bls12_381_g2")
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    got = mult_pippenger("bls12_381_g2", points, scalars, wbits=_WBITS)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_single_point(rng):
    """n = 1 falls back to the same pipeline (the reference special-cases
    n==1 with double-and-add, msm/pippenger.hpp:192-214 — semantics must
    agree)."""
    curve = get_curve("pallas")
    o = get_oracle(curve)
    p = o.random_point(rng)
    k = rng.randrange(curve.scalar.modulus)
    got = mult_pippenger("pallas", [p], [k], wbits=_WBITS)
    want = o.jacobian_to_affine(o.scalar_mul(p, k))
    assert (got.x, got.y) == (want.x, want.y)
