"""Slab (occupancy-capped, fixed-shape) MSM bucket accumulation.

TPU-first replacement for both the per-round gather schedule (round 3) and
the compacting segmented tree (msm/tree.py).  The reference's accumulate
reads each bucket's sorted run serially at full memory bandwidth
(msm/pippenger.cuh:193-208 over sort.cuh's ordering); the TPU analogue:

  * the schedule assigns every bucket one or more **rows** of a (C, S)
    slot matrix (the slab): a bucket with occ <= C owns one row; a bucket
    with occ > C spills into ceil(occ/C) consecutive **replica rows**
    drawn from a static budget.  The occupancy cap C ~ mean occupancy
    keeps the schedule linear in n for ANY scalar distribution
    (adversarial all-equal scalars become n/C replica rows of one bucket,
    not O(n) serial rounds — the quadratic case of round 3's schedule);
  * points land in the slab through ONE gather per window group (XLA
    row-gather of the point-major (n, 2L) matrix — the TPU has no fast
    fine-grained random access, so the design's one bulk gather is the
    entire permutation cost, amortized over all C accumulation rounds);
  * accumulation is a `fori_loop` over r < max(row_len): round r adds
    slab slice [r] — a contiguous leading-axis block, NO per-round gather
    — into per-row xyzz accumulators with one fused madd kernel at ONE
    static shape.  No data-dependent shapes anywhere: the segmented
    tree's per-(m0, lmax) Mosaic recompiles measured 80-145 s per shape,
    per scalar distribution; the slab compiles one kernel per window
    group width, period;
  * replica rows fold back into their bucket with a `while_loop` pairwise
    tree at the same static shape (trip count lg(max rows/bucket));
  * bucket b's sum is extracted from its rank-0 row.

Work per window ~= max_occ * S + C * fold_levels, with
S = nbuckets + n/C rows; C ~= mean keeps that within ~2x of the ideal n
madds per window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import get_curve
from ..ec import get_curve_ops
from ..ff.base import barrier

_U32 = jnp.uint32
_IDX_MASK = np.uint32(0x7FFFFFFF)


def plan_slab(n: int, nbuckets: int) -> tuple:
    """Static (cap, n_rows): cap ~= mean occupancy / 8 rounded to a power
    of two (clamped), n_rows = nbuckets + the replica budget ceil(n/cap).

    A small cap keeps total slab slots = cap*nbuckets + n close to the
    ideal n (~13% padding at the default window policy): the gather that
    fills the slab is the accumulate's bandwidth bill, so slots ~ rows
    gathered.  Buckets routinely spill into a few replica rows; the fold
    tree absorbs them at lg(max rows) extra passes."""
    mean = max(1, n // nbuckets)
    cap = 1 << max(0, (mean // 8) - 1).bit_length() if mean >= 8 else 1
    cap = max(16, min(cap, 512))
    n_rows = nbuckets + (n + cap - 1) // cap
    return cap, n_rows


def _spread(vals, at, length: int):
    """Per-slot copy of per-bucket `vals` whose bucket starts at slot
    `at[b]` (strictly ascending): boundary-difference scatter + cumsum —
    no searchsorted, no per-slot gather."""
    d = vals - jnp.roll(vals, 1)
    d = d.at[0].set(vals[0])
    return jnp.cumsum(jnp.zeros((length,), _U32).at[at].add(d), axis=0)


def make_slab_schedule(breakdown, nbuckets: int, cap: int, n_rows: int):
    """Schedule body: breakdown + per-window bucket sort + capped row
    assignment.  Returns per-window arrays:

      sorted_val (nwins, n)       sign|index payload in bucket order
      row_src    (nwins, n_rows)  start offset of each row's run slice
      row_len    (nwins, n_rows)  live points in the row (0..cap)
      row_bucket (nwins, n_rows)  owning bucket id
      row_rank   (nwins, n_rows)  replica rank within the bucket
      first_row  (nwins, B)       bucket -> its rank-0 row
      stats      (2,)             [max row_len, max rows per bucket]
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
        rows_b = jnp.maximum((occ + np.uint32(cap - 1)) // np.uint32(cap),
                             np.uint32(1))

        def perwin(occ_w, base_w, rows_w):
            csum = jnp.cumsum(rows_w)
            first = csum - rows_w                      # (B,) exclusive
            bid = _spread(jnp.arange(nbuckets, dtype=_U32), first, n_rows)
            rank = (jnp.arange(n_rows, dtype=_U32)
                    - _spread(first, first, n_rows))
            rbase = _spread(base_w, first, n_rows)
            rocc = _spread(occ_w, first, n_rows)
            src = rbase + rank * np.uint32(cap)
            length = jnp.clip(rocc.astype(jnp.int32)
                              - (rank * np.uint32(cap)).astype(jnp.int32),
                              0, cap)
            return src, length.astype(_U32), bid, rank, first

        row_src, row_len, row_bucket, row_rank, first_row = \
            jax.vmap(perwin)(occ, base, rows_b)
        stats = jnp.stack([jnp.max(row_len), jnp.max(rows_b)])
        return (sorted_val, row_src, row_len, row_bucket, row_rank,
                first_row, stats)

    return schedule


def _materialize(sorted_val, row_src, row_len, cap: int, points, fused,
                 P: int = 0):
    """Slab materialization: ONE gather per window group.  Returns
    (slab, valid, sgn); shared by the accumulate body and the
    gather-only profiling entry (bench phase breakdown)."""
    wg, S = row_src.shape
    n = sorted_val.shape[-1]
    r_iota = jax.lax.broadcasted_iota(_U32, (cap, wg, S), 0)
    src = jnp.minimum(row_src[None] + r_iota, np.uint32(n - 1))
    payload = jax.vmap(lambda v, s: jnp.take(v, s, axis=0),
                       in_axes=(0, 1), out_axes=1)(sorted_val, src)
    idx = payload & _IDX_MASK
    sgn = (payload >> np.uint32(31)) == 1
    valid = r_iota < row_len[None]
    sgn = sgn & valid
    if fused:
        # `points` is the PACKED (n, D*L) matrix: two 16-bit limbs per
        # u32 (see _slab_rows_jit) — halves the gather bytes, and the
        # measured XLA row-gather rate at width D*L is ~3x the rate at
        # width 2*D*L (47 vs 15 M rows/s on v5e)
        rows = jnp.take(points, idx.reshape(-1), axis=0)
        slab = jnp.moveaxis(rows.reshape(cap, wg, S, P), -1, 1)
    else:
        slab = jax.tree.map(
            lambda a: jnp.take(a, idx, axis=-1), (points[0], points[1]))
    return slab, valid, sgn


def make_slab_gather(curve_name: str, cap: int, fused: bool):
    """Gather-only body (profiling: the slab's one bulk permutation,
    isolated from the madd rounds — bench.py phase breakdown)."""
    ops = get_curve_ops(curve_name)
    P = ops.degree * ops.base.L if fused else 0

    def gather_only(sorted_val, row_src, row_len, points):
        slab, valid, sgn = _materialize(sorted_val, row_src, row_len, cap,
                                        points, fused, P)
        return jax.tree.leaves(slab)[0], valid, sgn

    return gather_only


def make_slab_accumulate(curve_name: str, cap: int, fused: bool):
    """Accumulate body over one window group (wg windows baked into call
    shapes).  `points` is the row-major (n, planes) matrix when fused,
    else an affine coordinate pytree.  Output: xyzz bucket sums shaped
    (.., wg, B)."""
    ops = get_curve_ops(curve_name)
    F = ops.F
    if fused:
        from ..ec.pallas_ops import fused_xyzz_madd, fused_xyzz_add
        L = ops.base.L
        D = ops.degree

        def madd(acc, pt):
            return fused_xyzz_madd(curve_name, acc, pt)

        def xadd(p, q):
            return fused_xyzz_add(curve_name, p, q)
    else:
        madd = ops.xyzz_madd
        xadd = ops.xyzz_add

    def accumulate(sorted_val, row_src, row_len, row_bucket, row_rank,
                   first_row, stats, points):
        wg, S = row_src.shape
        rounds = stats[0].astype(jnp.int32)
        max_rows = stats[1]
        P = D * L if fused else 0
        slab, valid, sgn = _materialize(sorted_val, row_src, row_len, cap,
                                        points, fused, P)

        zero = F.zeros((wg, S))

        def round_body(r, acc):
            if fused:
                pk = jax.lax.dynamic_index_in_dim(slab, r, 0,
                                                  keepdims=False)
                # unpack u32 -> two 16-bit limb planes (packed in-order:
                # plane 2i = lo, 2i+1 = hi of packed plane i)
                cols = jnp.stack([pk & np.uint32(0xFFFF),
                                  pk >> np.uint32(16)], axis=1)
                cols = cols.reshape((2 * P,) + pk.shape[1:])
                if D == 1:
                    gx, gy = cols[:L], cols[L:]
                else:          # G2 leaves order (px0, px1, py0, py1)
                    gx = (cols[:L], cols[L:2 * L])
                    gy = (cols[2 * L:3 * L], cols[3 * L:])
            else:
                gx, gy = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, r, a.ndim - 3, keepdims=False), slab)
            v = jax.lax.dynamic_index_in_dim(valid, r, 0, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(sgn, r, 0, keepdims=False)
            gx = F.select(v, gx, zero)
            gy = F.select(v, gy, zero)
            gy = F.select(s, F.neg(gy), gy)
            return barrier(madd(acc, barrier((gx, gy))))

        acc = jax.lax.fori_loop(0, rounds, round_body,
                                ops.xyzz_infinity((wg, S)))

        # -- replica fold: pairwise tree at the SAME static shape ---------
        def fold_cond(st):
            l, _ = st
            return (np.uint32(1) << l) < max_rows

        def fold_body(st):
            l, acc = st
            sh = np.int32(1) << l.astype(jnp.int32)
            partner = jax.tree.map(
                lambda a: jnp.roll(a, -sh, axis=-1), acc)
            pb = jnp.roll(row_bucket, -sh, axis=-1)
            mask = ((pb == row_bucket)
                    & (row_rank % ((np.uint32(1) << l) * np.uint32(2))
                       == 0))
            summed = xadd(acc, partner)
            acc = jax.tree.map(
                lambda s_, a_: jnp.where(mask, s_, a_), summed, acc)
            return (l + np.uint32(1), barrier(acc))

        _, acc = jax.lax.while_loop(fold_cond, fold_body,
                                    (np.uint32(0), acc))

        # -- extraction: bucket b's sum sits at its rank-0 row ------------
        def extract(a):
            fr = first_row.reshape((1,) * (a.ndim - 2) + first_row.shape)
            fr = jnp.broadcast_to(fr, a.shape[:-1] + first_row.shape[-1:])
            return jnp.take_along_axis(a, fr, axis=-1)

        return jax.tree.map(extract, acc)

    return accumulate
