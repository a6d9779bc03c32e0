"""Differential tests: JAX field layer vs the big-int oracle.

Covers every limb engine (mont32, mersenne31-direct, gl64, bigmont) across
all supported fields, with planted edge values (0, 1, p-1, p-2, 2^k-1
patterns) the way the reference plants infinity/duplicates
(poc/msm-cuda/src/util.rs:24-35).
"""

import random

import numpy as np
import pytest

from sppark_tpu import params
from sppark_tpu.ff import get_jax_field
from sppark_tpu.ff.ext import Fp2Field, BabyBear4Field
from sppark_tpu.oracle.field import Fp2 as OracleFp2

ALL_FIELDS = [
    params.BABY_BEAR, params.MERSENNE31, params.GOLDILOCKS,
    params.BN254_FR, params.BLS12_381_FR, params.BLS12_381_FP,
    params.BLS12_377_FR, params.BLS12_377_FP, params.PALLAS_P, params.VESTA_Q,
]


def edge_values(p):
    vals = [0, 1, 2, p - 1, p - 2, p // 2, p // 2 + 1]
    for k in (15, 16, 17, 31, 32, 33, 63, 64):
        if (1 << k) < p:
            vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    return [v % p for v in vals]


@pytest.mark.parametrize("fp", ALL_FIELDS, ids=lambda f: f.name)
def test_field_ops_vs_oracle(fp, rng):
    F = get_jax_field(fp)
    p = fp.modulus
    n = 64
    a_int = edge_values(p)
    a_int += [rng.randrange(p) for _ in range(n - len(a_int))]
    b_int = list(reversed(a_int))
    a = F.from_int_list(a_int)
    b = F.from_int_list(b_int)

    # round-trip
    assert F.to_int_list(a) == a_int

    assert F.to_int_list(F.add(a, b)) == [(x + y) % p for x, y in zip(a_int, b_int)]
    assert F.to_int_list(F.sub(a, b)) == [(x - y) % p for x, y in zip(a_int, b_int)]
    assert F.to_int_list(F.neg(a)) == [(-x) % p for x in a_int]
    assert F.to_int_list(F.mul(a, b)) == [x * y % p for x, y in zip(a_int, b_int)]
    assert F.to_int_list(F.sqr(a)) == [x * x % p for x in a_int]


@pytest.mark.parametrize("fp", [params.BABY_BEAR, params.GOLDILOCKS,
                                params.BLS12_381_FR, params.BLS12_381_FP],
                         ids=lambda f: f.name)
def test_field_inv_pow(fp, rng):
    F = get_jax_field(fp)
    p = fp.modulus
    a_int = [0, 1, p - 1] + [rng.randrange(1, p) for _ in range(13)]
    a = F.from_int_list(a_int)
    got = F.to_int_list(F.inv(a))
    want = [pow(x, -1, p) if x else 0 for x in a_int]
    assert got == want
    # pow with a few exponents
    for e in (0, 1, 2, 3, 5, 1 << 20, p - 2):
        got = F.to_int_list(F.pow_const(a, e))
        want = [pow(x, e, p) for x in a_int]
        assert got == want, f"exp {e}"


@pytest.mark.parametrize("fp", [params.BABY_BEAR, params.GOLDILOCKS,
                                params.BLS12_381_FP],
                         ids=lambda f: f.name)
def test_batch_inv(fp, rng):
    F = get_jax_field(fp)
    p = fp.modulus
    a_int = [rng.randrange(p) for _ in range(32)]
    a_int[7] = 0   # zero-tolerance (ff/batch_inversion.hpp:18-52)
    a_int[20] = 0
    a = F.from_int_list(a_int)
    got = F.to_int_list(F.batch_inv(a, axis=-1))
    want = [pow(x, -1, p) if x else 0 for x in a_int]
    assert got == want


def test_wire_format_roundtrip(rng):
    # big field: (n, n32) u32 little-endian words, Montgomery (mont_t mem form)
    F = get_jax_field(params.BLS12_381_FP)
    p = F.p
    ints = [rng.randrange(p) for _ in range(8)]
    wire = np.zeros((8, 12), dtype=np.uint32)
    for r, v in enumerate(ints):
        m = F.params.to_mont(v)
        for w in range(12):
            wire[r, w] = (m >> (32 * w)) & 0xFFFFFFFF
    dev = F.from_wire_np(wire)
    assert F.to_int_list(dev) == ints
    assert (F.to_wire_np(dev) == wire).all()
    # goldilocks: u64 canonical
    G = get_jax_field(params.GOLDILOCKS)
    gi = [rng.randrange(G.p) for _ in range(8)]
    wire64 = np.asarray(gi, dtype=np.uint64)
    dev = G.from_wire_np(wire64)
    assert G.to_int_list(dev) == gi
    assert (G.to_wire_np(dev) == wire64).all()


def test_fp2_vs_oracle(rng):
    fp2p = params.BLS12_381_FP2
    F = Fp2Field(fp2p, get_jax_field(params.BLS12_381_FP))
    O = OracleFp2(fp2p)
    p = fp2p.base.modulus
    n = 16
    a_int = [(rng.randrange(p), rng.randrange(p)) for _ in range(n)]
    b_int = [(rng.randrange(p), rng.randrange(p)) for _ in range(n)]
    a_int[0] = (0, 0)
    a = F.from_int_list(a_int)
    b = F.from_int_list(b_int)
    assert F.to_int_list(F.mul(a, b)) == [O.mul(x, y) for x, y in zip(a_int, b_int)]
    assert F.to_int_list(F.add(a, b)) == [O.add(x, y) for x, y in zip(a_int, b_int)]
    assert F.to_int_list(F.inv(a)) == [O.inv(x) for x in a_int]
    # mul * inv == 1
    one = F.to_int_list(F.mul(a, F.inv(a)))
    assert one[0] == (0, 0)
    assert all(v == (1, 0) for v in one[1:])


def test_bb31_4(rng):
    F = BabyBear4Field(canonical=True)
    p = params.BABY_BEAR.modulus
    beta = 11
    n = 16
    a_int = [tuple(rng.randrange(p) for _ in range(4)) for _ in range(n)]
    b_int = [tuple(rng.randrange(p) for _ in range(4)) for _ in range(n)]
    a = F.from_int_list(a_int)
    b = F.from_int_list(b_int)

    def ref_mul(x, y):
        full = [0] * 7
        for i in range(4):
            for j in range(4):
                full[i + j] = (full[i + j] + x[i] * y[j]) % p
        return tuple((full[k] + beta * full[k + 4]) % p if k < 3 else full[k]
                     for k in range(4))

    assert F.to_int_list(F.mul(a, b)) == [ref_mul(x, y) for x, y in zip(a_int, b_int)]
    # inversion: a * a^-1 == 1
    got = F.to_int_list(F.mul(a, F.inv(a)))
    assert all(v == (1, 0, 0, 0) for v in got)
    # batched extension inversion (ff/baby_bear.hpp:602-633): one
    # prime-field batch inversion serves the whole bb31_4 batch, zero
    # lanes tolerated
    a_int2 = list(a_int)
    a_int2[5] = (0, 0, 0, 0)
    a2 = F.from_int_list(a_int2)
    got_b = F.to_int_list(F.mul(a2, F.batch_inv(a2)))
    assert got_b[5] == (0, 0, 0, 0)
    assert all(v == (1, 0, 0, 0) for i, v in enumerate(got_b) if i != 5)
    got_t = F.to_int_list(F.mul(a, F.batch_inv_tree(a)))
    assert all(v == (1, 0, 0, 0) for v in got_t)
