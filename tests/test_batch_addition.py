"""batch_addition vs oracle (msm/batch_addition.cuh analogue)."""

from sppark_tpu.params import get_curve
from sppark_tpu.msm import batch_addition
from sppark_tpu.oracle.ec import get_oracle, AffinePoint

CURVE = "test_gl64"


def test_batch_addition_bitmap_refmap(rng):
    cp = get_curve(CURVE)
    o = get_oracle(cp)
    n = 32
    pts = [o.random_point(rng) for _ in range(n)]
    pts[3] = AffinePoint(0, 0, True)
    bits = [rng.randrange(2) for _ in range(n)]
    refs = [rng.randrange(2) for _ in range(n)]
    got = batch_addition(CURVE, pts, bits, refs, lanes=8)
    acc = o.infinity_xyzz()
    for p, b, r in zip(pts, bits, refs):
        if b:
            acc = o.xyzz_madd(acc, o.affine_neg(p) if r else p)
    want = o.xyzz_to_affine(acc)
    assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)


def test_batch_addition_all(rng):
    cp = get_curve(CURVE)
    o = get_oracle(cp)
    pts = [o.random_point(rng) for _ in range(16)]
    got = batch_addition(CURVE, pts)
    acc = o.infinity_xyzz()
    for p in pts:
        acc = o.xyzz_madd(acc, p)
    want = o.xyzz_to_affine(acc)
    assert (got.x, got.y) == (want.x, want.y)


def test_batch_addition_empty_selection(rng):
    cp = get_curve(CURVE)
    o = get_oracle(cp)
    pts = [o.random_point(rng) for _ in range(8)]
    got = batch_addition(CURVE, pts, [0] * 8)
    assert got.inf
