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
