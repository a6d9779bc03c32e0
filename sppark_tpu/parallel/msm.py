"""Mesh-sharded Pippenger MSM.

Points and scalars are block-sharded over the mesh axis; each device runs
the full local pipeline on its n/D points, then the tiny per-window partial
sums (nwins xyzz points, a few KB) are all_gathered and tree-reduced
in-graph.  This replaces the reference's "independent GPUs addressed by
device_id" non-design (util/all_gpus.cpp:39-63) with a real scale-out
story: communication volume is O(nwins * D), independent of n.

Window-sum linearity makes per-shard integration exact:
sum_shard W_shard = sum_b b * (sum_shard bucket_b^shard).

Each phase is its own shard_map-wrapped jit — same phase split as the
single-chip path (msm/pippenger.py:MSMStages), which keeps XLA compile
times linear.  Per-shard intermediates (histograms, buckets) travel
between phases as global arrays stacked along the mesh axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..params import get_curve
from ..ec import get_curve_ops
from ..ff.base import barrier
from ..oracle.ec import AffinePoint, get_oracle
from ..oracle.msm import window_bits
from ..msm.pippenger import _stage_bodies, _scalar_words_from_ints
from .mesh import AXIS
from .ntt import _mesh_key, _MESHES


@functools.lru_cache(maxsize=None)
def _sharded_stages(curve_name: str, wbits: int, nwins: int, n_words: int,
                    mesh_key):
    mesh = _MESHES[mesh_key]
    ops = get_curve_ops(curve_name)
    schedule, accumulate, integrate, to_affine = _stage_bodies(
        curve_name, wbits, nwins, n_words)
    nl = 1 if ops.base.n_limbs else 0

    # per-shard intermediates stack along the LAST axis (bucket axis for
    # histograms/buckets, a length-D axis for the rounds bound)
    last_axis = P(None, AXIS)
    coord_spec = P(*([None] * nl + [AXIS]))
    bucket_spec = P(*([None] * nl + [None, AXIS]))
    rep_spec = P(*([None] * (nl + 1)))

    sched = jax.jit(shard_map(
        schedule, mesh=mesh, in_specs=(P(None, AXIS),),
        out_specs=(last_axis, last_axis, last_axis, P(AXIS)),
        check_vma=False))
    acc = jax.jit(shard_map(
        accumulate, mesh=mesh,
        in_specs=(last_axis, last_axis, last_axis, P(AXIS),
                  coord_spec, coord_spec),
        out_specs=bucket_spec, check_vma=False))

    def integrate_fold(bucket):
        win = integrate(bucket)                    # local (.., nwins) xyzz
        gathered = jax.lax.all_gather(win, AXIS)   # leaves (D, .., nwins)
        first = jax.tree.map(lambda a: a[0], gathered)
        rest = jax.tree.map(lambda a: a[1:], gathered)

        def step(carry, q):
            return barrier(ops.xyzz_add(carry, q)), None

        total, _ = jax.lax.scan(step, first, rest)
        return ops.xyzz_to_affine(total)

    integ = jax.jit(shard_map(
        integrate_fold, mesh=mesh, in_specs=(bucket_spec,),
        out_specs=rep_spec, check_vma=False))
    return sched, acc, integ


def msm_sharded(curve, points, scalars, mesh: Mesh,
                wbits: int = 0) -> AffinePoint:
    """MSM over a device mesh.  `points` — oracle AffinePoints or a device
    affine batch; `scalars` — ints or (n_words, n) u32 planes.  n must be a
    multiple of the mesh size."""
    cparams = get_curve(curve) if isinstance(curve, str) else curve
    ops = get_curve_ops(cparams.name)
    if isinstance(points, (list, tuple)) and points and \
            hasattr(points[0], "x"):
        pts_dev = ops.affine_from_ints(points)
        n = len(points)
    else:
        pts_dev = points
        n = int(jax.tree.leaves(pts_dev)[0].shape[-1])
    D = mesh.devices.size
    if n % D:
        raise ValueError(f"npoints {n} not divisible by mesh size {D}")
    scalar_bits = cparams.scalar.bits
    wbits = wbits or window_bits(n // D, scalar_bits)
    nwins = (scalar_bits + wbits - 1) // wbits
    n_words = (scalar_bits + 31) // 32
    if not hasattr(scalars, "ndim"):
        scalars = _scalar_words_from_ints(scalars, cparams.scalar.modulus,
                                          n_words)
    words = jnp.asarray(scalars)
    sched, acc, integ = _sharded_stages(cparams.name, wbits, nwins, n_words,
                                        _mesh_key(mesh))
    sorted_val, base, occ, rounds = sched(words)
    bucket = acc(sorted_val, base, occ, rounds, *pts_dev)
    wx, wy = integ(bucket)

    # host doubling merge (identical to the single-chip collect)
    o = get_oracle(cparams)
    pts = ops.affine_to_ints((wx, wy))[:nwins]
    total = o.infinity_jacobian()
    zero = (0, 0) if ops.degree == 2 else 0
    for w in reversed(range(nwins)):
        for _ in range(wbits):
            total = o.jacobian_dbl(total)
        x, y = pts[w]
        if not (x == zero and y == zero):
            total = o.jacobian_add(total, o.to_jacobian(
                AffinePoint(x, y, False)))
    return o.jacobian_to_affine(total)
