"""Special roots (heptaroot/pentaroot/sqrt — the Poseidon S-box helpers,
ff/gl64_t.cuh:549-565, ff/mersenne31.hpp:388-425, ff/baby_bear.hpp:31-67)."""

import pytest

from sppark_tpu.params import get_field
from sppark_tpu.ff import get_jax_field


@pytest.mark.parametrize("field,k", [("goldilocks", 7), ("baby_bear", 7),
                                     ("mersenne31", 5)])
def test_nth_root(field, k, rng):
    params = get_field(field)
    F = get_jax_field(field)
    vals = [rng.randrange(1, params.modulus) for _ in range(16)]
    dev = F.from_int_list(vals, batch_shape=(16,))
    # root(x)^k == x
    root = F.nth_root(dev, k)
    back = F.pow_const(root, k)
    assert F.to_int_list(back) == vals


def test_mersenne31_sqrt(rng):
    params = get_field("mersenne31")
    F = get_jax_field("mersenne31")
    p = params.modulus
    vals = [rng.randrange(p) for _ in range(8)]
    squares = [v * v % p for v in vals]
    dev = F.from_int_list(squares, batch_shape=(8,))
    roots = F.to_int_list(F.sqrt(dev))
    for r, s in zip(roots, squares):
        assert r * r % p == s


def test_nth_root_bad_k():
    F = get_jax_field("baby_bear")
    with pytest.raises(ValueError):
        F.nth_root(F.zeros((4,)), 3)   # 3 | p-1 for BabyBear
