"""Pippenger multi-scalar multiplication on TPU (msm/pippenger.cuh analogue).

Phase structure mirrors the reference (breakdown -> sort -> accumulate ->
integrate -> host collect; msm/pippenger.cuh:448-571) but each phase is
re-shaped for the TPU execution model:

  * breakdown: vectorized signed-digit/booth encode over u32 scalar word
    planes (role of the `breakdown` kernel, pippenger.cuh:72-121).  The
    scalar-abs fold (scalar > order/2 => negate and flip signs,
    pippenger.cuh:101-117) is a branchless word-wise compare + borrow chain.
  * sort: one batched `jax.lax.sort` over (nwins, n) bucket ids replaces the
    two-pass counting sort (msm/sort.cuh) — XLA's sort is deterministic and
    needs no cross-block histograms.
  * accumulate: the reference's persistent-kernel atomic work stealing
    (pippenger.cuh:157-176) is replaced by **histogram-scheduled conflict-free
    rounds**: after the sort, bucket b's points occupy the contiguous run
    [starts[b], starts[b] + counts[b]); in round r every bucket takes its
    r-th point, so one xyzz_madd per (window, bucket) lane per round with no
    write conflicts.  rounds = max bucket occupancy (a traced value — the
    `while` dissolves into a bounded fori_loop).
  * integrate: per-window weighted bucket reduction sum_b b*bucket[b]
    computed as a reverse `associative_scan` (suffix sums) + tree fold
    (role of the `integrate` kernel, pippenger.cuh:225-296).
  * collect: the tiny final window merge (doubling-merge of window sums,
    pippenger.cuh:667-727) runs on host over exact ints.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CurveParams, get_curve
from ..ec import get_curve_ops, CurveOps
from ..ff.base import barrier
from ..ff.bigmont import BigMontField
from ..oracle.ec import get_oracle, AffinePoint
from ..oracle.msm import window_bits

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# scalar ingestion
# ---------------------------------------------------------------------------

def _scalar_words_from_ints(scalars: Sequence[int], order: int,
                            n_words: int) -> np.ndarray:
    """(n_words, n) u32 planes of canonical scalars."""
    out = np.empty((n_words, len(scalars)), dtype=np.uint32)
    for c, s in enumerate(scalars):
        s %= order
        for i in range(n_words):
            out[i, c] = (s >> (32 * i)) & 0xFFFFFFFF
    return out


def demont_scalar_words(F: BigMontField, words):
    """Montgomery wire scalars -> canonical u32 word planes, on device
    (the breakdown kernel's optional from() conversion, pippenger.cuh:97).
    `words` is a (n_words, n) u32 array of Montgomery-form scalars."""
    n_words = words.shape[0]
    planes16 = jnp.concatenate(
        [jnp.stack([words[i] & np.uint32(0xFFFF), words[i] >> 16])
         for i in range(n_words)])
    canon = F.from_mont(planes16)
    return jnp.stack([canon[2 * i] | (canon[2 * i + 1] << 16)
                      for i in range(n_words)])


# ---------------------------------------------------------------------------
# device pipeline
# ---------------------------------------------------------------------------

def _resolve_points(points):
    """Accept a DevPtr, an integer DevPtr handle, oracle points, or a
    device batch (the is_device_ptr dispatch of msm/pippenger.cuh:385-395,
    582-601)."""
    from ..runtime.dev_ptr import DevPtr
    if isinstance(points, DevPtr):
        return points.value
    if isinstance(points, int):
        return DevPtr.from_handle(points).value
    return points


class MSMContext:
    """Per-(curve, npoints) MSM engine (msm_t analogue, pippenger.cuh:325).

    Holds the window policy and the jitted pipeline; optionally keeps the
    point set device-resident for reuse across invocations (the
    gpu_ptr_t-resident-points path, pippenger.cuh:377-383, 582-601).
    """

    def __init__(self, curve, npoints: int, wbits: int = 0,
                 mode: str = "auto", chunk: int = 0):
        self.curve = get_curve(curve) if isinstance(curve, str) else curve
        self.ops: CurveOps = get_curve_ops(self.curve.name)
        self.npoints = npoints
        sf = self.curve.scalar
        self.scalar_bits = sf.bits
        # chunked batching for point sets beyond device memory: the window
        # policy and stage functions are sized to the CHUNK, and per-chunk
        # window sums accumulate with one xyzz_add of (nwins,) points
        # (role of the batch/stride split + stream pipeline,
        # msm/pippenger.cuh:454-459, 496-556 — XLA's async dispatch
        # overlaps chunk upload with compute in place of the 3 streams).
        self.chunk = min(chunk, npoints) if chunk else npoints
        self.wbits = wbits or window_bits(self.chunk, self.scalar_bits)
        self.nwins = (self.scalar_bits + self.wbits - 1) // self.wbits
        self.nbuckets = 1 << (self.wbits - 1)
        self.n_words = (self.scalar_bits + 31) // 32
        self._points_dev = None
        self._fn = _pipeline(self.curve.name, self.wbits, self.nwins,
                             self.n_words, mode)

    # -- point residency ----------------------------------------------------
    def set_points(self, points):
        """Upload a point batch once for reuse (device-resident points).

        Returns a `DevPtr` handle over the device-resident batch — the
        gpu_ptr_t contract (util/gpu_t.cuh:269-318): clone/drop lifecycle,
        opaque integer handle for FFI callers, and `invoke`/`set_points`
        accept the handle (or the DevPtr) back in place of raw points
        (the device-pointer invoke overloads, msm/pippenger.cuh:582-601)."""
        from ..runtime.dev_ptr import DevPtr
        points = _resolve_points(points)
        if isinstance(points, (list, tuple)) and points and \
                hasattr(points[0], "x"):
            self._points_dev = self.ops.affine_from_ints(points)
        else:
            self._points_dev = points
        return DevPtr(self._points_dev)

    # -- invocation ------------------------------------------------------------
    def invoke(self, scalars, points=None, mont: bool = False) -> AffinePoint:
        """Compute sum_i scalars[i] * points[i]; returns an oracle
        AffinePoint (exact ints)."""
        ops = self.ops
        points = _resolve_points(points)
        if points is None:
            pts_dev = self._points_dev
            assert pts_dev is not None, "no points uploaded"
        elif isinstance(points, (list, tuple)) and points and \
                hasattr(points[0], "x"):
            pts_dev = ops.affine_from_ints(points)
        else:
            pts_dev = points
        if hasattr(scalars, "ndim") and scalars.ndim == 2:
            words = jnp.asarray(scalars)      # already (n_words, n) planes
            if mont:
                from ..ff import get_jax_field
                words = demont_scalar_words(
                    get_jax_field(self.curve.scalar), words)
        else:
            words = jnp.asarray(_scalar_words_from_ints(
                scalars, self.curve.scalar.modulus, self.n_words))
        n = words.shape[1]
        # host-streaming: numpy point arrays stay on host and upload per
        # chunk (double-buffered), so point sets larger than HBM work —
        # the role of the staged-upload stream pipeline
        # (msm/pippenger.cuh:454-459, 496-556)
        host_pts = all(isinstance(a, np.ndarray)
                       for a in jax.tree.leaves(pts_dev))
        if n <= self.chunk:
            if host_pts:
                pts_dev = jax.tree.map(
                    lambda a: jax.device_put(jnp.asarray(a)), pts_dev)
            wx, wy = self._fn(words, pts_dev)
            return self._collect(wx, wy)
        # chunked path: window sums are linear in the point set, so chunks
        # combine with one (nwins,)-lane xyzz_add each — zero-padded tail
        # chunks are harmless (zero scalars land in no bucket)
        def chunk_pts(lo):
            hi = min(lo + self.chunk, n)

            def cut(a):
                c = a[..., lo:hi]
                if hi - lo < self.chunk:
                    pad = ((0, 0),) * (a.ndim - 1) + ((0, self.chunk
                                                       - (hi - lo)),)
                    c = (np.pad(c, pad, mode="edge") if host_pts
                         else jnp.pad(c, pad, mode="edge"))
                if host_pts:
                    # async upload: returns immediately, transfer overlaps
                    # the previous chunk's compute (XLA async dispatch in
                    # place of the reference's flip-flop streams)
                    c = jax.device_put(jnp.asarray(c))
                return c
            return jax.tree.map(cut, pts_dev)

        total = None
        starts = list(range(0, n, self.chunk))
        nxt = chunk_pts(starts[0])
        for i, lo in enumerate(starts):
            hi = min(lo + self.chunk, n)
            w = words[:, lo:hi]
            if hi - lo < self.chunk:
                w = jnp.pad(w, ((0, 0), (0, self.chunk - (hi - lo))))
            pts = nxt
            if i + 1 < len(starts):
                nxt = chunk_pts(starts[i + 1])   # stage while computing
            win = self._fn.window_sums(w, pts)
            if total is None:
                total = win
            else:
                from ..ec.pallas_ops import use_fused_madd, fused_xyzz_add
                total = (fused_xyzz_add(self.curve.name, total, win)
                         if use_fused_madd(self.ops)
                         else self.ops.xyzz_add(total, win))
        return self._collect(*self._fn.to_affine(total))

    def _collect(self, wx, wy) -> AffinePoint:
        """Host window merge: MSB-first doubling merge of the per-window
        sums (collect(), pippenger.cuh:667-727) over exact ints."""
        o = get_oracle(self.curve)
        pts = self.ops.affine_to_ints((wx, wy))
        total = o.infinity_jacobian()
        for w in reversed(range(self.nwins)):
            for _ in range(self.wbits):
                total = o.jacobian_dbl(total)
            x, y = pts[w]
            zero = (0, 0) if self.ops.degree == 2 else 0
            if not (x == zero and y == zero):
                total = o.jacobian_add(total, o.to_jacobian(
                    AffinePoint(x, y, False)))
        return o.jacobian_to_affine(total)


class MSMStages:
    """Separately-jitted phase functions.

    The reference runs breakdown / sort / accumulate / integrate as SEPARATE
    kernels (msm/pippenger.cuh:412-443, 508-525); keeping them separate jits
    here too is load-bearing: XLA's compile time on the single monolithic
    graph grows superlinearly (19+ min where the four phases compile in
    ~1 min total on the CI box)."""

    def __init__(self, schedule, accumulate, integrate, to_affine):
        self.schedule = schedule      # words -> (sorted_val, base, occ, rounds)
        self.accumulate = accumulate  # (sched.., px, py) -> bucket xyzz
        self.integrate = integrate    # bucket -> per-window xyzz sums
        self.to_affine = to_affine    # xyzz -> affine (batch normalize)

    def window_sums(self, words, points):
        px, py = points
        sorted_val, base, occ, rounds = self.schedule(words)
        bucket = self.accumulate(sorted_val, base, occ, rounds, px, py)
        return self.integrate(bucket)

    def __call__(self, words, points):
        return self.to_affine(self.window_sums(words, points))


@functools.lru_cache(maxsize=None)
def _pipeline(curve_name: str, wbits: int, nwins: int, n_words: int,
              mode: str = "auto"):
    if mode in ("auto", "slab"):
        return MSMSlabStages(curve_name, wbits, nwins, n_words)
    if mode == "tree":
        return MSMTreeStages(curve_name, wbits, nwins, n_words)
    return MSMStages(*(jax.jit(f) for f in
                       _stage_bodies(curve_name, wbits, nwins, n_words,
                                     mode)))


@functools.lru_cache(maxsize=None)
def _tree_acc_jit(curve_name: str, m0: int, lmax: int, fused: bool):
    from .tree import make_tree_accumulate
    return jax.jit(make_tree_accumulate(curve_name, m0, lmax, fused))


@functools.lru_cache(maxsize=None)
def _tree_rows_jit(curve_name: str):
    """Point coords -> row-major (n, planes) staging for the tree's one
    row-gather per window (point-major form; see msm/tree.py).  G2 fp2
    coefficient pairs flatten in jax.tree leaf order (px0, px1, py0,
    py1)."""
    def rows(px, py):
        return jnp.concatenate(jax.tree.leaves((px, py)), axis=0).T
    return jax.jit(rows)


def _tree_fused(ops) -> bool:
    from ..ec.pallas_ops import use_fused_madd
    return use_fused_madd(ops)


class MSMTreeStages:
    """Segmented-tree batch-affine pipeline (msm/tree.py) behind the same
    stage interface as MSMStages.

    The tree's slot count m0 and depth Lmax are data dependent (they come
    from the bucket histogram), so window_sums fetches the schedule's tiny
    stats vector to the host and dispatches to an accumulate executable
    compiled for (m0, Lmax); same-shaped invocations hit the jit cache."""

    #: level-array byte budget per accumulate call (bounds window grouping)
    BUDGET = 3 << 30

    def __init__(self, curve_name: str, wbits: int, nwins: int,
                 n_words: int):
        from .tree import make_tree_schedule
        self.curve_name = curve_name
        self.ops = get_curve_ops(curve_name)
        self.nwins = nwins
        self.nbuckets = 1 << (wbits - 1)
        breakdown = _make_breakdown(curve_name, wbits, nwins, n_words,
                                    spread=False)
        self.schedule = jax.jit(make_tree_schedule(breakdown, self.nbuckets))
        self.integrate = jax.jit(_make_integrate(curve_name, nwins,
                                                 self.nbuckets))
        self.to_affine = jax.jit(self.ops.xyzz_to_affine)

    def _slot_bytes(self) -> int:
        base = self.ops.base
        limbs = base.n_limbs or 1
        return 2 * limbs * 4 * self.ops.degree

    def window_sums(self, words, points):
        from .tree import plan_layout
        fused = _tree_fused(self.ops)
        sv, base, occ, sb, pb2, rb2o, lev, stats = self.schedule(words)
        m0, lmax = plan_layout(np.asarray(stats))
        accf = _tree_acc_jit(self.curve_name, m0, lmax, fused)
        if fused:
            pts = _tree_rows_jit(self.curve_name)(*points)
        else:
            pts = points
        # level arrays total ~3x m0 slots live at once (gathered rows +
        # level 1 + smaller tails); group windows to stay under BUDGET
        per_win = 3 * m0 * self._slot_bytes()
        wg = max(1, min(self.nwins, self.BUDGET // max(per_win, 1)))
        outs = []
        for lo in range(0, self.nwins, wg):
            hi = min(lo + wg, self.nwins)
            args = [a[lo:hi] for a in (sv, base, occ, sb, pb2, rb2o, lev)]
            outs.append(accf(*args, pts))
        bx, by = [jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=-2),
                               *[o[k] for o in outs]) for k in (0, 1)]
        bucket = self.ops.affine_to_xyzz((bx, by))
        return self.integrate(bucket)

    def __call__(self, words, points):
        return self.to_affine(self.window_sums(words, points))


@functools.lru_cache(maxsize=None)
def _slab_schedule_jit(curve_name: str, wbits: int, nwins: int,
                       n_words: int, cap: int, n_rows: int):
    from .slab import make_slab_schedule
    breakdown = _make_breakdown(curve_name, wbits, nwins, n_words,
                                spread=False)
    return jax.jit(make_slab_schedule(breakdown, 1 << (wbits - 1), cap,
                                      n_rows))


@functools.lru_cache(maxsize=None)
def _slab_acc_jit(curve_name: str, cap: int, fused: bool):
    from .slab import make_slab_accumulate
    return jax.jit(make_slab_accumulate(curve_name, cap, fused))


@functools.lru_cache(maxsize=None)
def _slab_rows_jit(curve_name: str):
    """Point coords -> PACKED row-major (n, D*L) staging for the slab
    gather: two 16-bit limb planes per u32 word.  Halving the row width
    triples the measured XLA gather rate on v5e (width 24: 47 M rows/s vs
    width 48: 15 M rows/s) and halves resident slab bytes."""
    def rows(px, py):
        planes = jnp.concatenate(jax.tree.leaves((px, py)), axis=0)
        packed = planes[0::2] | (planes[1::2] << np.uint32(16))
        return packed.T
    return jax.jit(rows)


class MSMSlabStages:
    """Occupancy-capped slab pipeline (msm/slab.py) behind the same stage
    interface as MSMStages — the round-4 default accumulate.

    Unlike the segmented tree, every shape here is a function of
    (n, wbits, window-group width) only: no histogram-dependent shapes,
    no host round-trip, no per-distribution recompiles."""

    #: live slab byte budget per accumulate call (bounds window grouping)
    BUDGET = 3 << 30

    def __init__(self, curve_name: str, wbits: int, nwins: int,
                 n_words: int):
        self.curve_name = curve_name
        self.wbits = wbits
        self.n_words = n_words
        self.ops = get_curve_ops(curve_name)
        self.nwins = nwins
        self.nbuckets = 1 << (wbits - 1)
        self.integrate = jax.jit(_make_integrate(curve_name, nwins,
                                                 self.nbuckets))
        self.to_affine = jax.jit(self.ops.xyzz_to_affine)

    def _point_bytes(self) -> int:
        base = self.ops.base
        limbs = base.n_limbs or 1
        return 2 * limbs * 4 * self.ops.degree

    def _group_size(self, n: int, cap: int, n_rows: int) -> int:
        per_win = cap * n_rows * self._point_bytes()
        wg = max(1, min(self.nwins, self.BUDGET // max(per_win, 1)))
        while self.nwins % wg:          # equal groups -> one kernel shape
            wg -= 1
        return wg

    def window_sums(self, words, points):
        from .slab import plan_slab
        from ..ec.pallas_ops import use_fused_madd
        fused = use_fused_madd(self.ops)
        n = words.shape[1]
        cap, n_rows = plan_slab(n, self.nbuckets)
        sched = _slab_schedule_jit(self.curve_name, self.wbits, self.nwins,
                                   self.n_words, cap, n_rows)
        sv, row_src, row_len, row_bucket, row_rank, first_row, stats = \
            sched(words)
        accf = _slab_acc_jit(self.curve_name, cap, fused)
        pts = _slab_rows_jit(self.curve_name)(*points) if fused else points
        wg = self._group_size(n, cap, n_rows)
        outs = []
        for lo in range(0, self.nwins, wg):
            hi = lo + wg
            args = [a[lo:hi] for a in (sv, row_src, row_len, row_bucket,
                                       row_rank, first_row)]
            outs.append(accf(*args, stats, pts))
        bucket = jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=-2),
                              *outs)
        return self.integrate(bucket)

    def __call__(self, words, points):
        return self.to_affine(self.window_sums(words, points))


def _spread_policy(order: int, wbits: int, nwins: int, nbuckets: int):
    """Top-window sub-bucket spreading parameters (see _make_breakdown)."""
    top_max = (order // 2 >> ((nwins - 1) * wbits)) + 1
    top_span = 1 << (top_max - 1).bit_length() if top_max > 1 else 1
    k_spread = nbuckets // top_span if top_span < nbuckets else 1
    return top_span, k_spread


@functools.lru_cache(maxsize=None)
def _make_breakdown(curve_name: str, wbits: int, nwins: int, n_words: int,
                    spread: bool = True):
    """Signed-digit breakdown body: (n_words, n) canonical word planes ->
    (ids, signs) of shape (nwins, n) (role of the breakdown kernel,
    pippenger.cuh:72-121).

    With spread=True the top window's digits are spread over replica
    sub-bucket slots (see the comment at _spread_policy's call site in
    _stage_bodies); the tree accumulator turns this off — its cost is
    logarithmic in the max bucket occupancy, so top-window concentration
    only adds ~lg(span) cheap levels."""
    curve = get_curve(curve_name)
    order = curve.scalar.modulus
    nbuckets = 1 << (wbits - 1)
    top_span, k_spread = _spread_policy(order, wbits, nwins, nbuckets)
    if not spread:
        k_spread = 1
    half = np.uint32(1 << (wbits - 1))
    full = 1 << wbits
    mask = np.uint32(full - 1)
    half_order_words = [(order // 2 >> (32 * i)) & 0xFFFFFFFF
                        for i in range(n_words)]
    order_words = [(order >> (32 * i)) & 0xFFFFFFFF for i in range(n_words)]

    def breakdown(words):
        """(n_words, n) canonical words -> bucket ids & signs (nwins, n)."""
        # -- scalar abs-fold (pippenger.cuh:101-117) ------------------------
        gt = jnp.zeros(words.shape[1], jnp.bool_)     # s > order/2 so far
        eq = jnp.ones(words.shape[1], jnp.bool_)
        for i in reversed(range(n_words)):
            hw = np.uint32(half_order_words[i])
            gt = gt | (eq & (words[i] > hw))
            eq = eq & (words[i] == hw)
        neg = gt
        # folded = order - s (borrow chain over words)
        folded = []
        borrow = jnp.zeros(words.shape[1], _U32)
        for i in range(n_words):
            ow = np.uint32(order_words[i])
            d = ow - words[i] - borrow
            # borrow-out if ow < words[i] + borrow (compute in 64-bit-free way)
            b_out = (words[i] > ow) | ((words[i] == ow) & (borrow == 1))
            folded.append(d)
            borrow = b_out.astype(_U32)
        w_sel = [jnp.where(neg, f, w) for f, w in zip(folded, words)]
        # -- window extraction ----------------------------------------------
        raw = []
        for w in range(nwins):
            off = w * wbits
            wi, sh = off >> 5, off & 31
            lo = w_sel[wi] >> np.uint32(sh)
            if sh and wi + 1 < n_words:
                lo = lo | (w_sel[wi + 1] << np.uint32(32 - sh))
            raw.append(lo & mask)
        # -- booth/signed encode with carry (oracle-compatible:
        #    d >= 2^(wbits-1) borrows, except in the top window) -----------
        ids, signs = [], []
        carry = jnp.zeros_like(raw[0])
        for w in range(nwins):
            t = raw[w] + carry
            is_last = w == nwins - 1
            d_neg = (t >= half) & jnp.asarray(not is_last)
            mag = jnp.where(d_neg, np.uint32(full) - t, t)
            carry = d_neg.astype(_U32)
            ids.append(mag)
            signs.append(d_neg ^ neg)
        if k_spread > 1:
            # top-window replica slots d + (i mod k)*span (see module-level
            # comment at k_spread); digit 0 stays 0 (no bucket)
            rep = (jnp.arange(words.shape[1], dtype=_U32)
                   % np.uint32(k_spread)) * np.uint32(top_span)
            ids[-1] = jnp.where(ids[-1] == 0, ids[-1], ids[-1] + rep)
        return jnp.stack(ids), jnp.stack(signs)

    return breakdown


@functools.lru_cache(maxsize=None)
def _stage_bodies(curve_name: str, wbits: int, nwins: int, n_words: int,
                  mode: str = "auto"):
    """Un-jitted phase bodies (schedule, accumulate, integrate, to_affine).
    The sharded MSM wraps each in shard_map (parallel/msm.py); the
    single-chip path jits each directly.

    mode: "xyzz" (unified xyzz madd — the "auto" default here, and the
    stage set the sharded MSM composes), "affine" (per-round batch-affine
    buckets; kept for cross-checking).  MSMContext's own "auto" routes to
    the segmented-tree accumulator (msm/tree.py) instead, which replaced
    both as the fast path in round 4.

    The top-window digit spreading (see _make_breakdown) exists because
    these modes' accumulate cost is LINEAR in the max bucket occupancy:
    the reference's work-stealing accumulate absorbs the top window's
    structural concentration with more threads per window
    (msm/pippenger.cuh:157-176); here the digits spread over
    k = nbuckets/span replica slots folded before integrate."""
    curve = get_curve(curve_name)
    ops = get_curve_ops(curve_name)
    if mode == "auto":
        mode = "xyzz"
    order = curve.scalar.modulus
    nbuckets = 1 << (wbits - 1)
    top_span, k_spread = _spread_policy(order, wbits, nwins, nbuckets)
    breakdown = _make_breakdown(curve_name, wbits, nwins, n_words,
                                spread=True)
    bshape = (nwins, nbuckets)
    F = ops.F

    def schedule(words):
        """breakdown + sort + histogram (roles of the breakdown and sort
        kernels, pippenger.cuh:72-121, msm/sort.cuh)."""
        n = words.shape[1]
        ids, signs = breakdown(words)
        # pack (sign, index) into the sort payload (sort.cuh packs sign in
        # bit 31, msm/sort.cuh:115)
        payload = (jnp.broadcast_to(jnp.arange(n, dtype=_U32)[None], ids.shape)
                   | (signs.astype(_U32) << np.uint32(31)))
        sorted_ids, sorted_val = jax.lax.sort_key_val(ids, payload,
                                                      dimension=-1)
        counts = jax.vmap(lambda row: jnp.bincount(
            row.astype(jnp.int32), length=nbuckets + 1))(sorted_ids)
        starts = jnp.cumsum(counts, axis=1) - counts     # exclusive prefix
        occ = counts[:, 1:]                               # (nwins, nbuckets)
        base = starts[:, 1:]
        rounds = jnp.max(occ).reshape(1)                  # traced bound
        return sorted_val, base, occ, rounds

    def accumulate(sorted_val, base, occ, rounds, px, py):
        """Histogram-scheduled conflict-free bucket rounds (role of the
        accumulate kernel, pippenger.cuh:145-223)."""
        n = sorted_val.shape[-1]
        from ..ec.pallas_ops import use_fused_madd, fused_xyzz_madd
        fused = mode == "xyzz" and use_fused_madd(ops)
        if fused:
            # point-major staging: one contiguous-row gather of x||y per
            # round instead of 2L per-limb column gathers — XLA's TPU
            # gather is ~element-at-a-time, measured 2.2 ms/round at
            # (L=24, 80K lanes) in limb-major form vs one ~0.1 ms
            # row-gather + relayout in this form
            L = F.L
            pxy = jnp.concatenate([px, py], axis=0).T    # (n, 2L)

        def fetch_idx(r):
            pos = jnp.minimum(base + r.astype(_U32), np.uint32(n - 1))
            valid = r < occ
            val = jnp.take_along_axis(sorted_val, pos, axis=1)
            idx = val & np.uint32(0x7FFFFFFF)
            sgn = (val >> np.uint32(31)) == 1
            return idx, sgn, valid

        def fetch(r):
            """Round r's scheduled point per (window, bucket) lane; invalid
            lanes come back as the affine identity (0, 0)."""
            idx, sgn, valid = fetch_idx(r)
            if fused:
                rows = jnp.take(pxy, idx.reshape(-1), axis=0)  # (B, 2L)
                cols = rows.T.reshape(2 * L, *bshape)
                gx, gy = cols[:L], cols[L:]
            else:
                gx = jax.tree.map(lambda a: jnp.take(a, idx, axis=-1), px)
                gy = jax.tree.map(lambda a: jnp.take(a, idx, axis=-1), py)
            gx = F.select(valid, gx, F.zeros(bshape))
            gy = F.select(valid, gy, F.zeros(bshape))
            gy = F.select(sgn & valid, F.neg(gy), gy)
            # loop-body fan-out values MUST be barrier'd (ff/base.py:barrier)
            return barrier((gx, gy))

        if mode == "xyzz":
            if fused:
                # one fused Pallas kernel per round: the whole 8M+2S madd
                # (plus block-gated doubling leg) stays in VMEM
                def round_body(r, bucket):
                    gx, gy = fetch(r)
                    return barrier(fused_xyzz_madd(curve_name, bucket,
                                                   (gx, gy)))
            else:
                def round_body(r, bucket):
                    gx, gy = fetch(r)
                    return barrier(ops.xyzz_madd(bucket, (gx, gy)))

            return jax.lax.fori_loop(0, rounds[0], round_body,
                                     ops.xyzz_infinity(bshape))
        else:
            # batch-affine accumulation (the "xyzz batch-affine buckets" of
            # BASELINE.json config 3; GPU MSMs use the same trick): buckets
            # stay AFFINE, each round does one affine add whose divisions
            # share a single tree batch-inversion — ~7 field muls per lane
            # vs ~30 for the unified xyzz madd.  Identity encoded (0, 0)
            # (consistent with affine_t.hpp:31: a valid point never has
            # x == y == 0 since b != 0 on every supported curve).
            def round_body(r, state):
                bx, by = state
                gx, ay = fetch(r)
                a_inf = F.is_zero(gx) & F.is_zero(ay)
                b_emp = F.is_zero(bx) & F.is_zero(by)
                same_x = F.eq(bx, gx) & ~a_inf & ~b_emp
                dbl = same_x & F.eq(by, ay)
                cancel = same_x & ~F.eq(by, ay)
                active = (dbl | (~a_inf & ~b_emp & ~same_x))
                bx2 = F.sqr(bx)
                dbl_num = F.add(F.add(bx2, bx2), bx2)
                if curve.a4:
                    # doubling slope (3x^2 + a) / 2y for a4 != 0 curves
                    # (the a4 template parameter, ec/jacobian_t.hpp:16)
                    dbl_num = F.add(dbl_num, F.const(curve.a4, bshape))
                num = F.select(dbl, dbl_num, F.sub(ay, by))
                den = F.select(dbl, F.add(by, by), F.sub(gx, bx))
                den = F.select(active, den, F.const(1, bshape))
                dinv = barrier(F.batch_inv_tree(den))
                lam = barrier(F.mul(num, dinv))
                x3 = barrier(F.sub(F.sub(F.sqr(lam), bx),
                                   F.select(dbl, bx, gx)))
                y3 = F.sub(F.mul(lam, F.sub(bx, x3)), by)
                nx = F.select(active, x3, bx)
                ny = F.select(active, y3, by)
                zero = F.zeros(bshape)
                nx = F.select(cancel, zero, nx)
                ny = F.select(cancel, zero, ny)
                promote = b_emp & ~a_inf
                nx = F.select(promote, gx, nx)
                ny = F.select(promote, ay, ny)
                return barrier((nx, ny))

            zeros = F.zeros(bshape)
            bax, bay = jax.lax.fori_loop(0, rounds[0], round_body,
                                         (zeros, zeros))
            return ops.affine_to_xyzz((bax, bay))

    integrate = _make_integrate(curve_name, nwins, nbuckets, k_spread,
                                top_span)
    return schedule, accumulate, integrate, ops.xyzz_to_affine


@functools.lru_cache(maxsize=None)
def _make_integrate(curve_name: str, nwins: int, nbuckets: int,
                    k_spread: int = 1, top_span: int = 0):
    ops = get_curve_ops(curve_name)

    def integrate(bucket):
        """W = sum_b (b) * bucket_b over digits b = 1..nbuckets, as grouped
        serial acc/res strip reductions — the exact dataflow of the
        reference's integrate kernel + host collect (pippenger.cuh:225-296,
        627-665), vectorized over (nwins, G) lanes.

        On TPU big-Montgomery curves the adds/doublings route through the
        fused Pallas kernels (ec/pallas_ops.py) — the per-field-op XLA
        form of one unified xyzz add is a ~30K-op graph whose scan bodies
        took tens of minutes to compile."""
        from ..ec.pallas_ops import (use_fused_madd, fused_xyzz_add,
                                     fused_xyzz_dbl)
        if use_fused_madd(ops):
            xadd = lambda p, q: fused_xyzz_add(curve_name, p, q)
            xdbl = lambda p: fused_xyzz_dbl(curve_name, p)
        else:
            xadd, xdbl = ops.xyzz_add, ops.xyzz_dbl
        if k_spread > 1:
            # fold the top window's replica sub-buckets: slot (r, m) holds
            # digit m+1's r-th replica; lg(k) pairwise xyzz adds
            def _to_replicas(c):
                t = c[..., -1:, :]                      # (.., 1, nbuckets)
                return t.reshape(t.shape[:-1] + (k_spread, top_span))

            tops = jax.tree.map(_to_replicas, bucket)
            while jax.tree.leaves(tops)[0].shape[-2] > 1:
                even = jax.tree.map(lambda c: c[..., 0::2, :], tops)
                odd = jax.tree.map(lambda c: c[..., 1::2, :], tops)
                tops = xadd(even, odd)
            top_row = jax.tree.map(
                lambda c: jnp.concatenate(
                    [c.reshape(c.shape[:-3] + (1, top_span)),
                     jnp.zeros(c.shape[:-3] + (1, nbuckets - top_span),
                               c.dtype)], axis=-1), tops)
            bucket = jax.tree.map(
                lambda b, t: jnp.concatenate([b[..., :-1, :], t], axis=-2),
                bucket, top_row)
        G = min(64, nbuckets)
        C = nbuckets // G

        def regroup(a):
            # (..., nbuckets) -> (C, ..., G) with c descending
            a = a.reshape(a.shape[:-1] + (G, C))
            a = jnp.moveaxis(a, -1, 0)
            return a[::-1]

        xs = jax.tree.map(regroup, bucket)
        zero_g = ops.xyzz_infinity((nwins, G))

        def strip_step(carry, b):
            acc, res = carry
            acc = barrier(xadd(acc, b))
            res = xadd(res, acc)
            return barrier((acc, res)), None

        (T, R), _ = jax.lax.scan(strip_step, (zero_g, zero_g), xs)
        # T[g] = sum_c bucket[g,c];  R[g] = sum_c (c+1)*bucket[g,c]
        # W = sum_g R[g] + C * sum_{k>=1} SufT[k],  SufT[k] = sum_{g>=k} T[g]
        def gr(a):  # (..., G) -> (G, ...) descending
            return jnp.moveaxis(a, -1, 0)[::-1]

        Ts = jax.tree.map(gr, T)
        Rs = jax.tree.map(gr, R)
        zero_w = ops.xyzz_infinity((nwins,))
        g_idx = jnp.arange(G - 1, -1, -1)

        def group_step(carry, inp):
            accT, sumSuf, sumRes = carry
            t, r, g = inp
            accT = barrier(xadd(accT, t))
            sumSuf_new = xadd(sumSuf, accT)
            keep = g >= 1
            sumSuf = jax.tree.map(
                lambda a, b: jnp.where(keep, a, b), sumSuf_new, sumSuf)
            sumRes = xadd(sumRes, r)
            return barrier((accT, sumSuf, sumRes)), None

        (_, sumSuf, sumRes), _ = jax.lax.scan(
            group_step, (zero_w, zero_w, zero_w), (Ts, Rs, g_idx))
        # C * sumSuf via lg2(C) doublings (C is a power of two)
        for _ in range(int(math.log2(C))):
            sumSuf = xdbl(sumSuf)
        return xadd(sumRes, sumSuf)               # (.., nwins)

    return integrate


# ---------------------------------------------------------------------------
# one-shot wrappers (mult_pippenger, msm/pippenger.cuh:731-748)
# ---------------------------------------------------------------------------

def mult_pippenger(curve, points, scalars, mont: bool = False,
                   wbits: int = 0) -> AffinePoint:
    """One-shot MSM: points may be oracle AffinePoints or a device batch;
    scalars a list of ints or (n_words, n) u32 planes."""
    n = len(points) if isinstance(points, (list, tuple)) else None
    if n is None:
        n = int(jax.tree.leaves(points)[0].shape[-1])
    ctx = MSMContext(curve, n, wbits=wbits)
    return ctx.invoke(scalars, points=points, mont=mont)
