"""MSM vs oracle (poc/msm-cuda/tests/msm.rs analogue).

Test-vector protocol mirrors the reference's planted edge cases
(poc/msm-cuda/src/util.rs:24-35): a small random point set replicated up to
size, with an explicit infinity point planted at index 3, plus zero scalars
and scalars > order/2 (the signed-digit fold path).

Structure tests run on the test_gl64 curve (a real 60-bit prime-order
group over the Goldilocks field, params.py:TEST_GL64_G1) — its 2-word field
ops compile in seconds on the CPU CI box where a 256-bit curve's graph
takes minutes; the 256-bit curves are covered by @slow variants, by the
native C++ path (tests/test_native.py), and by the TPU verify/bench runs.
"""

import random

import pytest

from sppark_tpu.params import get_curve
from sppark_tpu.msm import MSMContext, mult_pippenger
from sppark_tpu.oracle.ec import get_oracle, AffinePoint
from sppark_tpu.oracle.msm import msm_naive, msm_pippenger

FAST_CURVE = "test_gl64"
_WBITS = 8


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


@pytest.mark.parametrize("mode", ["affine", "xyzz"])
def test_msm_matches_oracle(mode, rng):
    """Both accumulation strategies (batch-affine buckets and unified xyzz
    madd) against the naive oracle, edge cases planted."""
    n = 96
    points, scalars = make_inputs(FAST_CURVE, n, rng)
    ctx = MSMContext(FAST_CURVE, n, wbits=_WBITS, mode=mode)
    got = ctx.invoke(scalars, points=points)
    want = msm_naive(get_curve(FAST_CURVE), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_oracle_pippenger_self_check(rng):
    """The oracle's own bucket method equals naive (validates the signed
    digit encoding both implementations share)."""
    curve = get_curve(FAST_CURVE)
    points, scalars = make_inputs(FAST_CURVE, 32, rng)
    a = msm_pippenger(curve, points, scalars)
    b = msm_naive(curve, points, scalars)
    assert (a.x, a.y, a.inf) == (b.x, b.y, b.inf)


def test_msm_context_reuse(rng):
    """Device-resident points reused across invocations
    (pippenger.cuh:582-601 device-pointer overloads)."""
    curve = get_curve(FAST_CURVE)
    points, scalars = make_inputs(FAST_CURVE, 32, rng)
    ctx = MSMContext(FAST_CURVE, len(points), wbits=_WBITS)
    ctx.set_points(points)
    got1 = ctx.invoke(scalars)
    scalars2 = [s + 1 for s in scalars]
    got2 = ctx.invoke(scalars2)
    want1 = msm_naive(curve, points, scalars)
    want2 = msm_naive(curve, points, scalars2)
    assert (got1.x, got1.y) == (want1.x, want1.y)
    assert (got2.x, got2.y) == (want2.x, want2.y)


def test_msm_devptr_points(rng):
    """set_points returns a DevPtr (gpu_ptr_t contract) whose handle —
    or the DevPtr itself — can be passed back as `points` to invoke, and
    into a SECOND context (the resident-points reuse across msm_t
    instances of pippenger.cuh:582-601); clone/drop manage lifetime."""
    from sppark_tpu.runtime.dev_ptr import DevPtr

    curve = get_curve(FAST_CURVE)
    points, scalars = make_inputs(FAST_CURVE, 32, rng)
    ctx = MSMContext(FAST_CURVE, len(points), wbits=_WBITS)
    ptr = ctx.set_points(points)
    assert isinstance(ptr, DevPtr)
    want = msm_naive(curve, points, scalars)
    got_ptr = ctx.invoke(scalars, points=ptr)
    got_handle = ctx.invoke(scalars, points=ptr.handle)
    assert (got_ptr.x, got_ptr.y) == (want.x, want.y)
    assert (got_handle.x, got_handle.y) == (want.x, want.y)
    ctx2 = MSMContext(FAST_CURVE, len(points), wbits=_WBITS)
    got2 = ctx2.invoke(scalars, points=ptr.clone().handle)
    assert (got2.x, got2.y) == (want.x, want.y)
    ptr.drop()                       # clone's ref still live
    got3 = ctx2.invoke(scalars, points=ptr.handle)
    assert (got3.x, got3.y) == (want.x, want.y)
    ptr.drop()
    with pytest.raises(KeyError):
        DevPtr.from_handle(ptr.handle)


def test_msm_all_zero_scalars(rng):
    points, _ = make_inputs(FAST_CURVE, 16, rng)
    got = mult_pippenger(FAST_CURVE, points, [0] * 16, wbits=_WBITS)
    assert got.inf


def test_msm_single_point(rng):
    """n = 1 falls back to the same pipeline (the reference special-cases
    n==1 with double-and-add, msm/pippenger.hpp:192-214 — semantics must
    agree)."""
    curve = get_curve(FAST_CURVE)
    o = get_oracle(curve)
    p = o.random_point(rng)
    k = rng.randrange(curve.scalar.modulus)
    got = mult_pippenger(FAST_CURVE, [p], [k], wbits=_WBITS)
    want = o.jacobian_to_affine(o.scalar_mul(p, k))
    assert (got.x, got.y) == (want.x, want.y)


def test_msm_duplicate_points_same_bucket(rng):
    """Identical (point, scalar) pairs force bucket-level doublings — the
    collision leg of the affine accumulator."""
    curve = get_curve(FAST_CURVE)
    o = get_oracle(curve)
    p = o.random_point(rng)
    n = 16
    points = [p] * n
    k = rng.randrange(curve.scalar.modulus)
    scalars = [k] * n
    got = mult_pippenger(FAST_CURVE, points, scalars, wbits=_WBITS)
    want = o.jacobian_to_affine(o.scalar_mul(p, k * n))
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.slow
@pytest.mark.parametrize("curve", ["pallas", "bn254", "bls12_381"])
def test_msm_matches_oracle_256bit(curve, rng):
    n = 64
    points, scalars = make_inputs(curve, n, rng)
    got = mult_pippenger(curve, points, scalars, wbits=6)
    want = msm_naive(get_curve(curve), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_g2(rng):
    """Fp2 MSM structure (xyzz mode, warp-pair fp2 role of
    ff/alt_bn128-fp2.hpp) on the Goldilocks-Fp2 G2-analog curve — same code
    path as the production G2 curves at gl64 compile cost."""
    curve = get_curve("test_gl64_g2")
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[2] = curve.scalar.modulus - 1
    got = mult_pippenger("test_gl64_g2", points, scalars, wbits=6)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


@pytest.mark.xslow
def test_msm_g2_bls12_381(rng):
    """Production-size G2: the 381-bit Fp2 while-loop graph takes tens of
    minutes of LLVM on the CPU CI box, so this runs only with -m xslow
    (the reference's CI likewise never executes GPU kernels, ci.yml:14-159;
    the code path is covered by test_msm_g2 on the fp2 test curve)."""
    curve = get_curve("bls12_381_g2")
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    got = mult_pippenger("bls12_381_g2", points, scalars, wbits=6)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_all_equal_scalars(rng):
    """Adversarial skew: every scalar identical, so one bucket per window
    holds ALL points (rounds == n).  Quadratically slow by design on the
    conflict-free schedule (documented in msm/pippenger.py) but must stay
    correct — the reference's sorted-run accumulate handles this shape
    natively (msm/pippenger.cuh:193-208)."""
    curve = get_curve(FAST_CURVE)
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 24
    points = [base[i % 4] for i in range(n)]
    k = rng.randrange(curve.scalar.modulus)
    got = mult_pippenger(FAST_CURVE, points, [k] * n, wbits=_WBITS)
    want = msm_naive(curve, points, [k] * n)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_chunked_invoke(rng):
    """Chunked batching (pippenger.cuh:454-459 batch split): window sums
    accumulate across chunks, including a zero-padded tail chunk."""
    n = 56                                   # 3 chunks of 24 (tail padded)
    points, scalars = make_inputs(FAST_CURVE, n, rng)
    ctx = MSMContext(FAST_CURVE, n, wbits=_WBITS, chunk=24)
    got = ctx.invoke(scalars, points=points)
    want = msm_naive(get_curve(FAST_CURVE), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_chunked_host_streaming(rng):
    """Host-resident numpy point arrays upload chunk by chunk
    (double-buffered device_put) — point sets larger than device memory
    (the staged-upload role of msm/pippenger.cuh:496-556)."""
    import numpy as np
    import jax
    from sppark_tpu.ec import get_curve_ops

    n = 56
    points, scalars = make_inputs(FAST_CURVE, n, rng)
    ops = get_curve_ops(FAST_CURVE)
    dev_pts = ops.affine_from_ints(points)
    host_pts = jax.tree.map(lambda a: np.asarray(a), dev_pts)
    assert all(isinstance(a, np.ndarray) for a in jax.tree.leaves(host_pts))
    ctx = MSMContext(FAST_CURVE, n, wbits=_WBITS, chunk=24)
    got = ctx.invoke(scalars, points=host_pts)
    want = msm_naive(get_curve(FAST_CURVE), points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_msm_g2_affine_mode(rng):
    """G2 batch-affine buckets via Fp2.batch_inv_tree (the path the
    reference unlocks with warp-pair fp2 + batch inversion,
    ff/alt_bn128-fp2.hpp:135-144, ff/baby_bear.hpp:602-633)."""
    curve = get_curve("test_gl64_g2")
    o = get_oracle(curve)
    base = [o.random_point(rng) for _ in range(4)]
    n = 16
    points = [base[i % 4] for i in range(n)]
    points[3] = AffinePoint((0, 0), (0, 0), True)
    scalars = [rng.randrange(curve.scalar.modulus) for _ in range(n)]
    scalars[2] = curve.scalar.modulus - 1
    got = mult_pippenger_mode("test_gl64_g2", points, scalars, wbits=6,
                              mode="affine")
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def mult_pippenger_mode(curve, points, scalars, wbits, mode):
    ctx = MSMContext(curve, len(points), wbits=wbits, mode=mode)
    return ctx.invoke(scalars, points=points)


def test_msm_wire_point_ingestion(rng):
    """Zero-copy wire ingestion (ffi_affine_sz strided layout with inf
    byte, msm/pippenger.cuh:379, ec/affine_t.hpp:75-122) matches the
    int-list path."""
    import numpy as np
    from sppark_tpu.ec import get_curve_ops

    curve = get_curve(FAST_CURVE)
    ops = get_curve_ops(FAST_CURVE)
    points, scalars = make_inputs(FAST_CURVE, 32, rng)
    ref = ops.affine_from_ints(points)
    xw, yw = ops.affine_to_wire(ref)
    # plain (x_words, y_words) form (u64 for gl64-family coordinates)
    got_pts = ops.affine_from_wire(x_words=xw, y_words=yw)
    got = mult_pippenger(FAST_CURVE, got_pts, scalars, wbits=_WBITS)
    want = msm_naive(curve, points, scalars)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)

    # strided byte-buffer form with explicit inf byte
    cb = ops._coord_bytes()
    stride = 2 * cb + 8                      # x || y || inf byte + pad
    buf = np.zeros((len(points), stride), dtype=np.uint8)
    buf[:, :cb] = np.ascontiguousarray(
        xw.view(np.uint8).reshape(len(points), cb))
    buf[:, cb:2 * cb] = np.ascontiguousarray(
        yw.view(np.uint8).reshape(len(points), cb))
    for i, p in enumerate(points):
        if p.inf:
            buf[i, 2 * cb] = 1
            buf[i, :2 * cb] = 0xAB           # garbage; must be masked
    got_pts2 = ops.affine_from_wire(buf=buf.ravel(), ffi_affine_sz=stride)
    got2 = mult_pippenger(FAST_CURVE, got_pts2, scalars, wbits=_WBITS)
    assert (got2.x, got2.y, got2.inf) == (want.x, want.y, want.inf)


def test_mont_scalar_ingestion(rng):
    """Montgomery-wire scalars -> canonical word planes on device (the
    breakdown kernel's from() conversion, msm/pippenger.cuh:97)."""
    import numpy as np
    import jax.numpy as jnp
    from sppark_tpu import params
    from sppark_tpu.ff import get_jax_field
    from sppark_tpu.msm.pippenger import demont_scalar_words

    fp = params.BLS12_381_FR
    F = get_jax_field(fp)
    n_words = (fp.bits + 31) // 32
    vals = [0, 1, fp.modulus - 1] + [rng.randrange(fp.modulus)
                                     for _ in range(13)]
    mont = [fp.to_mont(v) for v in vals]
    words = np.asarray([[(m >> (32 * i)) & 0xFFFFFFFF for m in mont]
                        for i in range(n_words)], dtype=np.uint32)
    got = np.asarray(demont_scalar_words(F, jnp.asarray(words)))
    want = np.asarray([[(v >> (32 * i)) & 0xFFFFFFFF for v in vals]
                       for i in range(n_words)], dtype=np.uint32)
    assert (got == want).all()
