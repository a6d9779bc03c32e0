"""Flat batched point addition (msm/batch_addition.cuh analogue).

The reference kernel sums points selected by a bitmap (optionally sign-
flipped through a reference bitmap) with per-warp tree reductions and
atomic work tickets (batch_addition.cuh:50-105); the TPU version is a
chunked lax.scan — lanes hold K parallel accumulators, each consuming its
chunk sequentially, then a second scan folds the K lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import get_curve
from ..ec import get_curve_ops
from ..ff.base import barrier
from ..oracle.ec import AffinePoint, get_oracle


@functools.lru_cache(maxsize=None)
def _batch_add_fn(curve_name: str, n: int, lanes: int):
    ops = get_curve_ops(curve_name)
    F = ops.F
    C = n // lanes

    def run(px, py, bits, refs):
        sel = bits.reshape(lanes, C)
        sgn = refs.reshape(lanes, C)

        def reshape_pt(a):
            return a.reshape(a.shape[:-1] + (lanes, C))

        rx = jax.tree.map(reshape_pt, px)
        ry = jax.tree.map(reshape_pt, py)

        def step(acc, c):
            x = jax.tree.map(lambda a: a[..., c], rx)
            y = jax.tree.map(lambda a: a[..., c], ry)
            keep = sel[:, c] == 1
            x = F.select(keep, x, F.zeros((lanes,)))
            y = F.select(keep, y, F.zeros((lanes,)))
            y = F.select((sgn[:, c] == 1) & keep, F.neg(y), y)
            return barrier(ops.xyzz_madd(acc, (x, y))), None

        acc0 = ops.xyzz_infinity((lanes,))
        acc, _ = jax.lax.scan(step, acc0, jnp.arange(C))

        # fold the lanes (sum_up, batch_addition.cuh:170-181)
        def fold(carry, lane_pt):
            return barrier(ops.xyzz_add(carry, lane_pt)), None

        xs = jax.tree.map(lambda a: jnp.moveaxis(a[..., :], -1, 0), acc)
        total0 = ops.xyzz_infinity(())
        total, _ = jax.lax.scan(fold, total0, xs)
        return ops.xyzz_to_affine(jax.tree.map(lambda a: a[..., None], total))

    return jax.jit(run)


def batch_addition(curve, points, bitmap=None, refmap=None,
                   lanes: int = 0) -> AffinePoint:
    """Sum the points where bitmap is set; refmap flips signs
    (batch_addition.cuh semantics).  `points` — oracle AffinePoints or a
    device affine batch; bitmaps — python sequences or u32 arrays."""
    cp = get_curve(curve) if isinstance(curve, str) else curve
    ops = get_curve_ops(cp.name)
    if isinstance(points, (list, tuple)) and points and \
            hasattr(points[0], "x"):
        n = len(points)
        pts = ops.affine_from_ints(points)
    else:
        pts = points
        n = int(jax.tree.leaves(pts)[0].shape[-1])
    if not lanes:
        lanes = max(1, min(128, n))
    while n % lanes:
        lanes -= 1
    bits = (np.ones(n, np.uint32) if bitmap is None
            else np.asarray(bitmap, np.uint32))
    refs = (np.zeros(n, np.uint32) if refmap is None
            else np.asarray(refmap, np.uint32))
    fn = _batch_add_fn(cp.name, n, lanes)
    ax, ay = fn(pts[0], pts[1], jnp.asarray(bits), jnp.asarray(refs))
    x, y = ops.affine_to_ints((ax, ay))[0]
    o = get_oracle(cp)
    zero = (0, 0) if ops.degree == 2 else 0
    if x == zero and y == zero:
        return o.infinity_affine()
    return AffinePoint(x, y, False)
