"""Self-consistency tests for the oracle itself (field, EC, NTT, MSM).

These mirror the reference's test protocols: NTT round-trips and order
equivalences (poc/ntt-cuda/tests/ntt.rs:9-79), MSM vs naive ground truth with
planted infinity/duplicate points (poc/msm-cuda/src/util.rs:24-35).
"""

import random

import pytest

from sppark_tpu import params
from sppark_tpu.oracle import (
    msm_naive, msm_pippenger, ntt_natural, intt_natural, bit_reverse,
    coset_ntt, coset_intt, lde,
)
from sppark_tpu.oracle.ec import get_oracle
from sppark_tpu.oracle.ntt import apply_order


NTT_FIELDS = [params.BABY_BEAR, params.GOLDILOCKS, params.BN254_FR,
              params.BLS12_381_FR, params.PALLAS_P]


@pytest.mark.parametrize("field", NTT_FIELDS, ids=lambda f: f.name)
def test_ntt_roundtrip(field, rng):
    for lg in (1, 2, 5, 8):
        n = 1 << lg
        v = [rng.randrange(field.modulus) for _ in range(n)]
        assert intt_natural(field, ntt_natural(field, v)) == v
        assert ntt_natural(field, intt_natural(field, v)) == v


def test_ntt_matches_direct_dft(rng):
    field = params.BABY_BEAR
    p = field.modulus
    for lg in (1, 3, 4):
        n = 1 << lg
        w = field.root_of_unity(lg)
        v = [rng.randrange(p) for _ in range(n)]
        direct = [sum(v[j] * pow(w, j * k, p) for j in range(n)) % p
                  for k in range(n)]
        assert ntt_natural(field, v) == direct


def test_ntt_orders(rng):
    field = params.GOLDILOCKS
    lg = 4
    v = [rng.randrange(field.modulus) for _ in range(1 << lg)]
    nn = apply_order(field, v, lg, "NN")
    # RR of bit-reversed input == bit-reversed NN output (ntt.rs NN==RR check)
    rr = apply_order(field, bit_reverse(v, lg), lg, "RR")
    assert rr == bit_reverse(nn, lg)
    nr = apply_order(field, v, lg, "NR")
    assert nr == bit_reverse(nn, lg)
    rn = apply_order(field, bit_reverse(v, lg), lg, "RN")
    assert rn == nn


def test_coset_ntt_roundtrip(rng):
    field = params.BABY_BEAR
    n = 32
    v = [rng.randrange(field.modulus) for _ in range(n)]
    assert coset_intt(field, coset_ntt(field, v)) == v
    # coset evaluation at g*w^k equals polynomial evaluated there
    coeffs = [rng.randrange(field.modulus) for _ in range(n)]
    p = field.modulus
    w = field.root_of_unity(5)
    g = field.generator
    evals = coset_ntt(field, coeffs)
    for k in (0, 1, 7, 31):
        x = g * pow(w, k, p) % p
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert evals[k] == want


def test_lde_consistency(rng):
    field = params.GOLDILOCKS
    n, lg_blowup = 16, 2
    p = field.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    evals = ntt_natural(field, coeffs)
    ext = lde(field, evals, lg_blowup)
    # extension evaluates the same polynomial on the big coset
    w_big = field.root_of_unity(4 + lg_blowup)
    g = field.generator
    for k in (0, 5, 63):
        x = g * pow(w_big, k, p) % p
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert ext[k] == want


CURVES = [params.PALLAS_G1, params.BN254_G1, params.BLS12_381_G1]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_ec_group_law(curve, rng):
    o = get_oracle(curve)
    a = o.random_point(rng)
    b = o.random_point(rng)
    assert o.on_curve(a) and o.on_curve(b)
    ja, jb = o.to_jacobian(a), o.to_jacobian(b)
    # commutativity + doubling consistency across representations
    ab = o.jacobian_to_affine(o.jacobian_add(ja, jb))
    ba = o.jacobian_to_affine(o.jacobian_add(jb, ja))
    assert o.affine_eq(ab, ba) and o.on_curve(ab)
    dbl_j = o.jacobian_to_affine(o.jacobian_dbl(ja))
    dbl_x = o.xyzz_to_affine(o.xyzz_dbl(o.to_xyzz(a)))
    add_x = o.xyzz_to_affine(o.xyzz_add(o.to_xyzz(a), o.to_xyzz(a)))
    assert o.affine_eq(dbl_j, dbl_x) and o.affine_eq(dbl_j, add_x)
    # madd with subtraction: a + b - b == a
    x = o.xyzz_madd(o.to_xyzz(a), b)
    x = o.xyzz_madd(x, b, subtract=True)
    assert o.affine_eq(o.xyzz_to_affine(x), a)
    # infinity handling
    inf = o.infinity_affine()
    assert o.affine_eq(o.xyzz_to_affine(o.xyzz_madd(o.to_xyzz(a), inf)), a)
    # p + (-p) == inf
    res = o.xyzz_madd(o.to_xyzz(a), o.affine_neg(a))
    assert o.xyzz_to_affine(res).inf


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_ec_scalar_mul(curve, rng):
    o = get_oracle(curve)
    a = o.random_point(rng)
    k1, k2 = rng.randrange(curve.scalar.modulus), rng.randrange(1 << 40)
    # (k1 + k2) * P == k1*P + k2*P
    lhs = o.scalar_mul(a, (k1 + k2) % curve.scalar.modulus)
    rhs = o.jacobian_add(o.scalar_mul(a, k1), o.scalar_mul(a, k2))
    assert o.affine_eq(o.jacobian_to_affine(lhs), o.jacobian_to_affine(rhs))


@pytest.mark.parametrize("curve", [params.PALLAS_G1, params.BLS12_381_G1],
                         ids=lambda c: c.name)
def test_msm_pippenger_vs_naive(curve, rng):
    o = get_oracle(curve)
    n = 64
    base = [o.random_point(rng) for _ in range(8)]
    # replicate a small random set up to size and plant an infinity at index 3
    # (poc/msm-cuda/src/util.rs:24-35)
    points = [base[i % len(base)] for i in range(n)]
    points[3] = o.infinity_affine()
    order = curve.scalar.modulus
    scalars = [rng.randrange(order) for _ in range(n)]
    scalars[5] = 0                      # zero scalar edge
    scalars[6] = order - 1              # > order/2, exercises signed digits
    want = msm_naive(curve, points, scalars)
    got = msm_pippenger(curve, points, scalars)
    assert o.affine_eq(got, want)
    got10 = msm_pippenger(curve, points, scalars, wbits=10)
    assert o.affine_eq(got10, want)


def test_g2_oracle(rng):
    curve = params.BLS12_381_G2
    o = get_oracle(curve)
    a = o.random_point(rng)
    assert o.on_curve(a)
    dbl_j = o.jacobian_to_affine(o.jacobian_dbl(o.to_jacobian(a)))
    add_x = o.xyzz_to_affine(o.xyzz_add(o.to_xyzz(a), o.to_xyzz(a)))
    assert o.affine_eq(dbl_j, add_x)
    want = msm_naive(curve, [a, a], [3, 5])
    got = o.jacobian_to_affine(o.scalar_mul(a, 8))
    assert o.affine_eq(got, want)
