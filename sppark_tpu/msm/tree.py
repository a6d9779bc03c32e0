"""Segmented-tree batch-affine MSM accumulation.

TPU-first replacement for the accumulate kernel's per-round scheduling
(msm/pippenger.cuh:145-223): instead of fetching the r-th point of every
bucket each round (a gather per round — XLA's TPU gather runs at ~1
element/cycle and was measured at ~60% of total MSM time), points are
physically permuted into bucket-sorted order ONCE per window and reduced
by a **size-aligned pairwise tree** whose every level reads adjacent pairs
— contiguous strided slices, no gathers at all.

Layout invariant (what makes pairing gather-free):

  * every bucket's run is padded to a power-of-two slot count
    c_b = max(2, pow2ceil(occ_b)), padding slots holding the affine
    identity (0, 0);
  * runs are laid out in DESCENDING size order, so each run's start offset
    is divisible by its own size.  Then at tree level l every live run
    spans >= 2 aligned slots and the pairs (2i, 2i+1) never straddle runs;
  * a run of size c finishes at level lg(c) and its final sum sits at a
    slot computable from the histogram alone; deeper levels may pair
    finished sums of different buckets, but those parent slots are never
    read — extraction gathers each bucket's sum from the level where its
    run finished.

Each level's pair-add is **batch-affine**: the affine chord/tangent slopes
of all pairs share one tree batch-inversion (Montgomery's trick,
ff/batch_inversion.hpp:18-52 — ~3 muls/pair), so a pair add costs ~6 field
muls vs ~14 for the unified xyzz madd.  This is the "sorted-run
accumulate" of the reference (msm/pippenger.cuh:193-208) re-shaped from a
serial per-bucket walk into log-depth data parallelism — and unlike the
conflict-free-rounds schedule it is LINEAR in n for any scalar
distribution (adversarial all-equal scalars cost one extra level per
doubling of the max bucket, not O(n) rounds).

Static shapes: the slot count m0 = sum_b c_b <= 2n + 2*nbuckets is data
dependent, so the host reads the (tiny) histogram totals after the
schedule phase and picks m0 rounded up to a multiple of 2^Lmax
(Lmax = lg max c_b); the tree is compiled per (m0, Lmax) and cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import get_curve
from ..ec import get_curve_ops
from ..ff.base import barrier

_U32 = jnp.uint32
_IDX_MASK = np.uint32(0x7FFFFFFF)


def _pow2ceil(x):
    """Element-wise next power of two (x >= 1)."""
    v = x - np.uint32(1)
    for s in (1, 2, 4, 8, 16):
        v = v | (v >> s)
    return v + np.uint32(1)


def _ilog2_pow2(c):
    """Exact lg for power-of-two u32 inputs."""
    return jax.lax.population_count(c - np.uint32(1))


def batch_inv_flat(F, den):
    """Tree batch-inversion over the last TWO axes flattened, padded with
    ones to a power of two (the tree needs one; padding lanes multiply as
    neutral elements).  Inputs must be non-zero."""
    leaves = jax.tree.leaves(den)
    h, m = leaves[0].shape[-2], leaves[0].shape[-1]
    flat = jax.tree.map(lambda a: a.reshape(a.shape[:-2] + (h * m,)), den)
    n = h * m
    p2 = 1 << (n - 1).bit_length()
    if p2 != n:
        pad = F.ones((p2 - n,))
        flat = jax.tree.map(
            lambda a, o: jnp.concatenate(
                [a, jnp.broadcast_to(o, a.shape[:-1] + (p2 - n,))], axis=-1),
            flat, pad)
    inv = F.batch_inv_tree(flat)
    return jax.tree.map(
        lambda a: a[..., :n].reshape(a.shape[:-1] + (h, m)), inv)


def affine_pair_add(F, a4_int, l, r, inv_fn=batch_inv_flat):
    """Branchless batched affine l + r with shared batch inversion.

    Handles: either-operand infinity ((0,0) encoding, ec/affine_t.hpp:31),
    doubling (same point), cancellation (P + -P), and doubling of a
    y == 0 point (-> infinity).  ~6 field muls per pair including the
    inversion share."""
    x1, y1 = l
    x2, y2 = r
    inf_l = F.is_zero(x1) & F.is_zero(y1)
    inf_r = F.is_zero(x2) & F.is_zero(y2)
    dx = F.sub(x2, x1)
    dy = F.sub(y2, y1)
    same_x = F.is_zero(dx) & ~inf_l & ~inf_r
    dbl = same_x & F.is_zero(dy)
    toinf = (same_x & ~F.is_zero(dy)) | (dbl & F.is_zero(y1))
    active = ~inf_l & ~inf_r & ~toinf
    bshape = jax.tree.leaves(dx)[0].shape[-2:]
    den = F.select(dbl, F.add(y1, y1), dx)
    den = F.select(active, den, F.ones(bshape))
    dinv = barrier(inv_fn(F, den))
    x1sq = F.sqr(x1)
    num_dbl = F.add(F.add(x1sq, x1sq), x1sq)
    if a4_int:
        num_dbl = F.add(num_dbl, F.const(a4_int, bshape))
    num = F.select(dbl, num_dbl, dy)
    lam = barrier(F.mul(num, dinv))
    x3 = F.sub(F.sub(F.sqr(lam), x1), F.select(dbl, x1, x2))
    x3 = barrier(x3)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    zero = F.zeros(bshape)
    ox = F.select(active, x3, zero)
    oy = F.select(active, y3, zero)
    ox = F.select(inf_l & ~inf_r, x2, ox)
    oy = F.select(inf_l & ~inf_r, y2, oy)
    ox = F.select(inf_r & ~inf_l, x1, ox)
    oy = F.select(inf_r & ~inf_l, y1, oy)
    return barrier((ox, oy))


# ---------------------------------------------------------------------------
# schedule
# ---------------------------------------------------------------------------

def make_tree_schedule(breakdown, nbuckets: int):
    """Schedule body: breakdown + per-window bucket sort + padded layout.

    Returns per-window arrays:
      sorted_val (nwins, n)  sign|index payload in bucket order
      base, occ  (nwins, B)  original run starts / occupancies
      sb         (nwins, B)  buckets in descending padded-size order
      pb2        (nwins, B)  padded run starts (size-sorted order)
      rb2o, lev  (nwins, B)  padded start / finish level per bucket (orig order)
      stats      (2,)        [max_w sum_b c_b, max c_b]  (host reads these)
    """

    def schedule(words):
        n = words.shape[1]
        ids, signs = breakdown(words)
        payload = (jnp.broadcast_to(jnp.arange(n, dtype=_U32)[None],
                                    ids.shape)
                   | (signs.astype(_U32) << np.uint32(31)))
        sorted_ids, sorted_val = jax.lax.sort_key_val(ids, payload,
                                                      dimension=-1)
        counts = jax.vmap(lambda row: jnp.bincount(
            row.astype(jnp.int32), length=nbuckets + 1))(sorted_ids)
        counts = counts.astype(_U32)
        starts = jnp.cumsum(counts, axis=1) - counts
        occ = counts[:, 1:]
        base = starts[:, 1:]
        c = jnp.maximum(_pow2ceil(jnp.maximum(occ, np.uint32(1))),
                        np.uint32(2))
        # descending size, stable (ascending bucket id on ties)
        inv_key = ~c
        key_sorted, sb = jax.lax.sort_key_val(
            inv_key, jnp.broadcast_to(
                jnp.arange(nbuckets, dtype=_U32)[None], c.shape),
            dimension=-1)
        c_sorted = ~key_sorted
        csum = jnp.cumsum(c_sorted, axis=-1)
        pb2 = csum - c_sorted                       # exclusive prefix
        total = csum[:, -1]
        rb2o = jax.vmap(lambda s, v: jnp.zeros(
            (nbuckets,), _U32).at[s].set(v))(sb, pb2)
        lev = _ilog2_pow2(c)
        stats = jnp.stack([jnp.max(total), jnp.max(c)])
        return sorted_val, base, occ, sb, pb2, rb2o, lev, stats

    return schedule


# ---------------------------------------------------------------------------
# accumulate (compiled per (m0, Lmax, wg))
# ---------------------------------------------------------------------------

def make_tree_accumulate(curve_name: str, m0: int, lmax: int, fused: bool):
    """Tree accumulation over one window group.

    Inputs (wg = window-group size baked into the call shapes):
      sorted_val (wg, n), base/occ (wg, B), sb/pb2 (wg, B),
      rb2o/lev (wg, B), points (rows (n, 2L) when fused, else an affine
      coordinate pytree).
    Output: affine bucket sums, coords shaped (.., wg, B).
    """
    curve = get_curve(curve_name)
    ops = get_curve_ops(curve_name)
    F = ops.F
    a4 = curve.a4
    assert m0 % (1 << lmax) == 0

    if fused:
        from ..ec.pallas_ops import fused_affine_pair
        L = ops.base.L
        D = ops.degree

    def slot_maps(base, occ, sb, pb2):
        """Per-slot run metadata via boundary-difference scatter + cumsum
        (no searchsorted, no per-slot gather)."""
        def perwin(base_w, occ_w, sb_w, pb2_w):
            def spread(vals):
                d = vals - jnp.roll(vals, 1)
                d = d.at[0].set(vals[0])
                return jnp.cumsum(
                    jnp.zeros((m0,), _U32).at[pb2_w].add(d), axis=0)
            rb2 = spread(pb2_w)
            ob = spread(base_w[sb_w])
            oc = spread(occ_w[sb_w])
            return rb2, ob, oc
        return jax.vmap(perwin)(base, occ, sb, pb2)

    def accumulate(sorted_val, base, occ, sb, pb2, rb2o, lev, points):
        wg, n = sorted_val.shape
        rb2, ob, oc = slot_maps(base, occ, sb, pb2)
        q = jnp.broadcast_to(jnp.arange(m0, dtype=_U32)[None], (wg, m0))
        rank = q - rb2
        valid = rank < oc
        src = jnp.minimum(ob + rank, np.uint32(n - 1))
        payload = jnp.take_along_axis(sorted_val, src, axis=-1)
        idx = payload & _IDX_MASK
        sgn = (payload >> np.uint32(31)) == 1

        if fused:
            rows = jnp.take(points, idx.reshape(-1), axis=0)
            cols = rows.T.reshape(2 * D * L, wg, m0)
            if D == 1:
                gx, gy = cols[:L], cols[L:]
            else:      # G2: leaves order (px0, px1, py0, py1)
                gx = (cols[:L], cols[L:2 * L])
                gy = (cols[2 * L:3 * L], cols[3 * L:])
        else:
            gx = jax.tree.map(lambda a: jnp.take(a, idx, axis=-1), points[0])
            gy = jax.tree.map(lambda a: jnp.take(a, idx, axis=-1), points[1])
        zero = F.zeros((wg, m0))
        gx = F.select(valid, gx, zero)
        gy = F.select(valid, gy, zero)
        gy = F.select(sgn & valid, F.neg(gy), gy)

        cur = barrier((gx, gy))
        levels = []
        for _ in range(lmax):
            left = jax.tree.map(lambda a: a[..., 0::2], cur)
            right = jax.tree.map(lambda a: a[..., 1::2], cur)
            if fused:
                cur = fused_affine_pair(curve_name, left, right)
            else:
                cur = affine_pair_add(F, a4, left, right)
            levels.append(cur)
        cat = jax.tree.map(
            lambda *ls: jnp.concatenate(ls, axis=-1), *levels)
        # bucket b finished at level lev[b], slot rb2o[b] >> lev[b]; its
        # position in the concat is (m0 - (m0 >> (lev-1))) + that slot
        pos = (np.uint32(m0) - (np.uint32(m0) >> (lev - 1))
               + (rb2o >> lev))
        take = functools.partial(jnp.take_along_axis, axis=-1)

        def gat(a):
            p = pos
            while p.ndim < a.ndim:
                p = p[None]
            return take(a, jnp.broadcast_to(p, a.shape[:-1] + pos.shape[-1:]))
        return jax.tree.map(gat, cat)

    return accumulate


def plan_layout(stats_host) -> tuple:
    """Host-side (m0, Lmax) from the schedule's stats: round the worst
    window's padded slot total up to a multiple of 2^Lmax."""
    total, maxc = int(stats_host[0]), int(stats_host[1])
    lmax = max(1, maxc.bit_length() - 1)
    gran = 1 << lmax
    m0 = -(-total // gran) * gran
    return m0, lmax
