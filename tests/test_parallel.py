"""Multi-device layer on the virtual 8-device CPU mesh (the multi-chip
test harness the reference lacks; SURVEY.md §4 'Implication')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sppark_tpu.params import get_field, get_curve
from sppark_tpu.ff import get_jax_field
from sppark_tpu import ntt as ntt_mod
from sppark_tpu.parallel import local_mesh, ntt_sharded, ntt_matrix_sharded, \
    msm_sharded
from sppark_tpu.oracle.ec import get_oracle, AffinePoint
from sppark_tpu.oracle.msm import msm_naive


@pytest.fixture(scope="module")
def mesh():
    return local_mesh(8)


@pytest.mark.parametrize("field,lg", [("baby_bear", 10), ("goldilocks", 12)])
def test_ntt_sharded_matches_single(field, lg, mesh, rng):
    params = get_field(field)
    F = get_jax_field(field)
    n = 1 << lg
    vals = [rng.randrange(params.modulus) for _ in range(n)]
    x = F.from_int_list(vals, batch_shape=(n,))
    want = ntt_mod.base_dev(field, x, lg)
    got = ntt_sharded(field, x, lg, mesh)
    assert F.to_int_list(got) == F.to_int_list(want)


@pytest.mark.parametrize("field,lg", [("goldilocks", 10)])
def test_intt_sharded_roundtrip(field, lg, mesh, rng):
    params = get_field(field)
    F = get_jax_field(field)
    n = 1 << lg
    vals = [rng.randrange(params.modulus) for _ in range(n)]
    x = F.from_int_list(vals, batch_shape=(n,))
    fwd = ntt_sharded(field, x, lg, mesh)
    back = ntt_sharded(field, fwd, lg, mesh, inverse=True)
    assert F.to_int_list(back) == vals


def test_ntt_matrix_layout(mesh, rng):
    """Matrix form: D[k1, k2] == X[k1 + N1*k2]."""
    field, lg = "goldilocks", 8
    params = get_field(field)
    F = get_jax_field(field)
    n = 1 << lg
    lg1 = lg // 2
    n1, n2 = 1 << lg1, 1 << (lg - lg1)
    vals = [rng.randrange(params.modulus) for _ in range(n)]
    x = F.from_int_list(vals, batch_shape=(n,))
    want = F.to_int_list(ntt_mod.base_dev(field, x, lg))
    a = x.reshape(x.shape[:-1] + (n1, n2))
    d = ntt_matrix_sharded(field, a, lg, mesh)
    got = F.to_int_list(d.reshape(d.shape[:-2] + (n,)))
    for k1 in range(n1):
        for k2 in range(n2):
            assert got[k1 * n2 + k2] == want[k1 + n1 * k2], (k1, k2)


def test_msm_sharded_matches_oracle(mesh, rng):
    """Full sharded MSM on the mesh vs the naive oracle, on the real
    small test curve (params.py:TEST_GL64_G1)."""
    curve = get_curve("test_gl64")
    o = get_oracle(curve)
    n = 64
    base = [o.random_point(rng) for _ in range(8)]
    points = [base[i % 8] for i in range(n)]
    points[3] = AffinePoint(0, 0, True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[1] = 0
    got = msm_sharded("test_gl64", points, scalars, mesh, wbits=8)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.slow
def test_msm_sharded_matches_oracle_256(mesh, rng):
    curve = get_curve("pallas")
    o = get_oracle(curve)
    n = 64
    base = [o.random_point(rng) for _ in range(8)]
    points = [base[i % 8] for i in range(n)]
    points[3] = AffinePoint(0, 0, True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[1] = 0
    got = msm_sharded("pallas", points, scalars, mesh, wbits=10)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)
