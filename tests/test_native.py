"""Native host core (libsppark_cpu.so) vs oracle — the role of the
reference's CPU mult_pippenger fallback (msm/pippenger.hpp:220-350)."""

import pytest

from sppark_tpu.ffi import cpu_msm, cpu_available
from sppark_tpu.params import get_curve
from sppark_tpu.oracle.ec import get_oracle, AffinePoint
from sppark_tpu.oracle.msm import msm_naive

pytestmark = pytest.mark.skipif(not cpu_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("curve", ["pallas", "bls12_381", "bn254",
                                   "bls12_377", "vesta"])
def test_native_msm_matches_oracle(curve, rng):
    cp = get_curve(curve)
    o = get_oracle(cp)
    base = [o.random_point(rng) for _ in range(6)]
    n = 48
    pts = [base[i % 6] for i in range(n)]
    pts[3] = AffinePoint(0, 0, True)              # planted infinity
    ks = [rng.randrange(cp.scalar.modulus) for _ in range(n)]
    ks[1] = 0                                     # zero scalar
    ks[2] = cp.scalar.modulus - 1                 # signed-fold extreme
    got = cpu_msm(curve, pts, ks)
    want = msm_naive(cp, pts, ks)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_native_msm_multithreaded(rng):
    cp = get_curve("pallas")
    o = get_oracle(cp)
    pts = [o.random_point(rng) for _ in range(32)]
    ks = [rng.randrange(cp.scalar.modulus) for _ in range(32)]
    a = cpu_msm("pallas", pts, ks, nthreads=1)
    b = cpu_msm("pallas", pts, ks, nthreads=4)
    assert (a.x, a.y) == (b.x, b.y)


def test_native_msm_rejects_g2():
    from sppark_tpu.util.errors import SpparkError
    with pytest.raises(SpparkError):
        cpu_msm("bls12_381_g2", [], [])


def test_native_msm_empty():
    got = cpu_msm("pallas", [], [])
    assert got.inf
