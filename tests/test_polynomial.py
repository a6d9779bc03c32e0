"""Polynomial kernels vs exact int math (polynomial/*.cuh analogues)."""

import pytest

from sppark_tpu.params import get_field
from sppark_tpu.ff import get_jax_field
from sppark_tpu.polynomial import (prefix_sum, prefix_product,
                                   div_by_x_minus_z, evaluate)

FIELDS = ["baby_bear", "goldilocks", "bls12_381_fr"]


def rand_coeffs(field, n, rng):
    params = get_field(field)
    return [rng.randrange(params.modulus) for _ in range(n)]


@pytest.mark.parametrize("field", FIELDS)
def test_prefix_scans(field, rng):
    params = get_field(field)
    F = get_jax_field(field)
    vals = rand_coeffs(field, 33, rng)
    dev = F.from_int_list(vals, batch_shape=(33,))
    got_sum = F.to_int_list(prefix_sum(field, dev))
    got_prod = F.to_int_list(prefix_product(field, dev))
    p = params.modulus
    acc = 0
    for i, v in enumerate(vals):
        acc = (acc + v) % p
        assert got_sum[i] == acc, f"sum[{i}]"
    acc = 1
    for i, v in enumerate(vals):
        acc = acc * v % p
        assert got_prod[i] == acc, f"prod[{i}]"


@pytest.mark.parametrize("field", ["baby_bear", "goldilocks"])
def test_div_by_x_minus_z(field, rng):
    params = get_field(field)
    p = params.modulus
    F = get_jax_field(field)
    n = 64
    coeffs = rand_coeffs(field, n, rng)
    z = rng.randrange(p)
    dev = F.from_int_list(coeffs, batch_shape=(n,))
    zdev = F.from_int_list([z], batch_shape=(1,))
    quot, rem = div_by_x_minus_z(field, dev, zdev)
    got_q = F.to_int_list(quot)
    got_r = F.to_int_list(rem)[0]
    # reference: synthetic division back-to-front
    want_q = [0] * n
    acc = 0
    for k in reversed(range(n)):
        acc = (coeffs[k] + z * acc) % p if k < n - 1 else coeffs[k]
        if k >= 1:
            want_q[k - 1] = acc
    # remainder == p(z)
    want_r = 0
    for c in reversed(coeffs):
        want_r = (want_r * z + c) % p
    assert got_r == want_r
    assert got_q[: n - 1] == want_q[: n - 1]
    assert got_q[n - 1] == 0          # zero-padded top
    # rotate layout: [rem, quotient...]
    rot = div_by_x_minus_z(field, dev, zdev, rotate=True)
    got = F.to_int_list(rot)
    assert got[0] == want_r and got[1:] == want_q[: n - 1]


@pytest.mark.parametrize("field", ["baby_bear", "goldilocks"])
def test_evaluate(field, rng):
    params = get_field(field)
    p = params.modulus
    F = get_jax_field(field)
    n, npts = 33, 5
    coeffs = rand_coeffs(field, n, rng)
    xs = [rng.randrange(p) for _ in range(npts)]
    dev_c = F.from_int_list(coeffs, batch_shape=(n,))
    dev_x = F.from_int_list(xs, batch_shape=(npts,))
    got = F.to_int_list(evaluate(field, dev_c, dev_x))
    for i, x in enumerate(xs):
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert got[i] == want, f"point {i}"


@pytest.mark.parametrize("field", ["baby_bear", "goldilocks"])
def test_evaluate_batched_passes(field, rng, monkeypatch):
    """The bounded-memory multi-pass path (B points per pass, the role of
    the reference's N-per-pass batching, evaluate.cuh:330-333) must agree
    with Horner — driven by shrinking the per-pass element budget so
    small shapes take the lax.map branch (incl. the edge-padded tail)."""
    from sppark_tpu.polynomial import core as pcore

    params = get_field(field)
    p = params.modulus
    F = get_jax_field(field)
    n, npts = 16, 11                  # budget 64 -> B=4, nb=3, pad=1
    coeffs = rand_coeffs(field, n, rng)
    xs = [rng.randrange(p) for _ in range(npts)]
    dev_c = F.from_int_list(coeffs, batch_shape=(n,))
    dev_x = F.from_int_list(xs, batch_shape=(npts,))

    monkeypatch.setattr(pcore, "_EVAL_PASS_ELEMS", 64)
    got = F.to_int_list(pcore._evaluate_batched(field, dev_c, dev_x))
    for i, x in enumerate(xs):
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % p
        assert got[i] == want, f"point {i}"


def test_prefix_bad_op():
    F = get_jax_field("baby_bear")
    from sppark_tpu.polynomial import prefix_op
    with pytest.raises(ValueError):
        prefix_op("baby_bear", F.zeros((4,)), "xor")
