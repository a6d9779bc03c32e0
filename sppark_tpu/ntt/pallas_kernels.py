"""Fused Pallas NTT kernels for narrow fields (gl64 / mont32 families).

Role of ntt/kernels/ct_mixed_radix_narrow.cu: the CUDA kernel batches
z_count elements per thread in registers and runs butterfly stages through
shared memory / warp shuffles; the TPU analogue holds a tile of ROWS in
VMEM and runs all lg(n2) stages of each row's NTT in one kernel pass, so
HBM sees each element twice per pass instead of twice per stage.

Butterflies are expressed in the lane-aligned roll/select form (the
shfl_bfly analogue, ff/shfl.cuh / mont_t.cuh:1211): for stage s with
half-block h and per-position twiddle row W (staged_full_table),

    y      = W * x
    out[i] = i's h-bit clear ?  x[i] + y[i+h]        (the lo lane)
                             :  x[i-h] - y[i]        (the hi lane)

— one modular mul, two static lane rolls, one select per stage; the last
axis never changes shape (Mosaic cannot lower butterfly reshapes).

Large domains use the same four-step decomposition as the sharded NTT
(parallel/ntt.py) but within one chip: column NTTs (this kernel, after a
transpose), twiddle multiply, row NTTs (this kernel), final transpose —
the in-chip mirror of the reference's 2-4 way kernel step split
(ntt/ntt.cuh:100-158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import get_field
from ..ff import get_jax_field
from .core import bit_reverse
from .parameters import get_parameters

# max lg(row length) handled by a single kernel pass
LG_TILE = 13

# Mosaic's default scoped-vmem limit (16 MiB) undercounts what the
# butterfly kernels' live temporaries need at large tiles; v5e+ chips have
# headroom above it, so ask for more when the block sizes warrant it.
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    """SPPARK_PALLAS_INTERPRET=1 runs the kernels through the Pallas
    interpreter — the CPU-testable analogue of the reference's sanitizer
    story (SURVEY §5: XLA removes the data-race surface; interpret-mode
    runs validate kernel semantics on GPU-less CI)."""
    import os
    return os.environ.get("SPPARK_PALLAS_INTERPRET") == "1"


class _RawOps:
    """Unwrapped (non-jitted) field ops — Pallas kernels trace the math
    inline; the per-instance jax.jit wrappers (ff/base.py:_finalize) cannot
    be called under a Pallas trace.

    Fields exposing lazy (partially-reduced) variants — gl64's
    GL64_PARTIALLY_REDUCED analogue — get them used for every in-kernel op,
    with one `canon()` at kernel exit.

    Multi-limb Montgomery fields route through the raw list-form limb math
    (ff/bigmont.py:mul_limbs) — BigMontField.mul itself dispatches to a
    pallas_call, which cannot nest inside another kernel."""

    def __init__(self, F):
        from ..ff.bigmont import (BigMontField, mul_limbs, add_limbs,
                                  sub_limbs_mod)

        self.F = F
        cls = type(F)
        self.n_limbs = F.n_limbs
        if isinstance(F, BigMontField):
            L, P, M0 = F.L, F.P_LIMBS, F.M0

            def unst(a):
                return [a[i] for i in range(L)]

            def bcast(planes):
                shape = jnp.broadcast_shapes(*(p.shape for p in planes))
                return jnp.stack([jnp.broadcast_to(p, shape)
                                  for p in planes])

            self.mul = lambda a, b: bcast(mul_limbs(unst(a), unst(b), P, M0))
            self.add = lambda a, b: bcast(add_limbs(unst(a), unst(b), P))
            self.sub = lambda a, b: bcast(sub_limbs_mod(unst(a), unst(b), P))
            self.select = lambda c, a, b: cls.select(F, c, a, b)
            self.addl, self.subl, self.mull = self.add, self.sub, self.mul
            self.canon = lambda a: a
            return
        self.add = lambda a, b: cls.add(F, a, b)
        self.sub = lambda a, b: cls.sub(F, a, b)
        self.mul = lambda a, b: cls.mul(F, a, b)
        self.select = lambda c, a, b: cls.select(F, c, a, b)
        lazy = hasattr(cls, "add_lazy")
        self.addl = (lambda a, b: cls.add_lazy(F, a, b)) if lazy else self.add
        self.subl = (lambda a, b: cls.sub_lazy(F, a, b)) if lazy else self.sub
        self.mull = (lambda a, b: cls.mul_lazy(F, a, b)) if lazy else self.mul
        self.canon = (lambda a: cls.canon(F, a)) if lazy else (lambda a: a)


def _roll(x, shift: int, axis: int = -1):
    ax = x.ndim + axis if axis < 0 else axis
    n = x.shape[ax]
    return pltpu.roll(x, shift % n, axis=ax)


def _slice_ax(x, a: int, b: int, axis: int):
    idx = [slice(None)] * x.ndim
    idx[x.ndim + axis if axis < 0 else axis] = slice(a, b)
    return x[tuple(idx)]


def _bitrev_axis(ops: _RawOps, x, lg: int, axis: int = -1):
    """Bit-reverse permutation along `axis`, entirely in VMEM.

    The permutation factors into lg/2 independent mirrored-bit-pair swaps;
    each swap moves elements by a fixed +/-d, so it is two static rolls
    and selects — no gather, no extra HBM pass (the role of the
    bit_rev_permutation kernels, ntt/kernels.cu:16-129, done for free
    inside the butterfly kernel's tile)."""
    nl = 1 if ops.n_limbs else 0
    dim = (x.ndim + axis) - nl
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape[nl:], dim)
    for k in range(lg // 2):
        lo, hi = k, lg - 1 - k
        d = (1 << hi) - (1 << lo)
        blo = (lane >> np.uint32(lo)) & np.uint32(1)
        bhi = (lane >> np.uint32(hi)) & np.uint32(1)
        take_up = (blo == 1) & (bhi == 0)     # comes from index i + d
        take_dn = (blo == 0) & (bhi == 1)     # comes from index i - d
        x = ops.select(take_up, _roll(x, -d, axis),
                       ops.select(take_dn, _roll(x, d, axis), x))
    return x


# butterfly stages with half-block size >= the axis granule (128 lanes /
# 8 sublanes) use aligned slices instead of roll/select: the twiddle
# multiply then runs on HALF the elements (the lo half's product in the
# roll form is dead work) and the roll/select pair disappears.
_SPLIT_GRANULE = {-1: 128, -2: 8}
# per-axis block caps: 16 keeps Mosaic compile sane on BOTH axes — 64 was
# measured beyond 20 minutes of remote compile at lg 24 on lanes (r3) AND
# on sublanes (r5 preflight: the column kernel at lg1=11 with
# SUB_BLOCKS=64 did not finish compiling in 28 minutes; the halved
# twiddle-mul work is not worth an uncacheable compile)
_SPLIT_MAX_BLOCKS = 16
_SPLIT_MAX_BLOCKS_SUB = 16


def _stages_roll(ops: _RawOps, x, lg: int, table, axis: int = -1):
    """All lg CT stages along `axis` (bit-reversed input, natural output).

    `table` = (.., lg, n) staged_full_table; everything stays in VMEM with
    fixed shapes.  Arithmetic is lazy (partially reduced) where the field
    supports it; output is canonical."""
    n = 1 << lg
    nl = 1 if ops.n_limbs else 0
    dim = (x.ndim + axis) - nl
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape[nl:], dim)
    granule = _SPLIT_GRANULE.get(axis, 128)

    def wslice(w, a, b):
        # NB: keep the slice and the new axis as separate ops — a mixed
        # `w[..., a:b, None]` index makes JAX emit a gather, which Mosaic
        # cannot lower (plain slices + expand_dims both lower fine).
        s = w[..., a:b]
        return s if axis == -1 else jnp.expand_dims(s, -1)

    max_blocks = _SPLIT_MAX_BLOCKS if axis == -1 else _SPLIT_MAX_BLOCKS_SUB
    for s in range(1, lg + 1):
        h = 1 << (s - 1)
        w = table[..., s - 1, :]                    # (.., n)
        if h >= granule and n // (2 * h) <= max_blocks:
            # sliced-half butterflies: block [a, a+2h) splits into lo/hi
            pieces = []
            for a in range(0, n, 2 * h):
                lo = _slice_ax(x, a, a + h, axis)
                hi = _slice_ax(x, a + h, a + 2 * h, axis)
                t = ops.mull(wslice(w, a + h, a + 2 * h), hi)
                pieces.append(ops.addl(lo, t))
                pieces.append(ops.subl(lo, t))
            x = jnp.concatenate(pieces, axis=axis)
        else:
            wb = w if axis == -1 else jnp.expand_dims(w, -1)
            y = ops.mull(wb, x)
            lo_val = ops.addl(x, _roll(y, -h, axis))  # x[i] + w*x[i+h]
            hi_val = ops.subl(_roll(x, h, axis), y)   # x[i-h] - w*x[i]
            is_lo = (lane & np.uint32(h)) == 0
            x = ops.select(is_lo, lo_val, hi_val)
    return ops.canon(x)


@functools.lru_cache(maxsize=None)
def _rows_kernel(field_name: str, lg: int, rows_pb: int,
                 with_mul: bool = False, out_t: bool = False,
                 in_rev: bool = True, out_rev: bool = False):
    """pallas_call: batched independent NTTs along the last axis.
    Input (.., B, n) NATURAL-order rows (bit-reversal happens in VMEM);
    output natural order.  With `with_mul`, a per-row multiplier block of
    the same (.., B, n) layout is applied to the OUTPUT.  With `out_t`,
    each result tile is transposed in VMEM and written to a (.., n, B)
    output — the four-step's final transpose for free.

    `in_rev=False` skips the input bit-reversal (rows arrive already
    bit-reversed — the R* input orders); `out_rev=True` bit-reverses the
    result in VMEM (the *R output orders).  Together these give all four
    NN/NR/RN/RR orders without any standalone permutation pass — the role
    of the reference's CT-vs-GS kernel selection (ntt/ntt.cuh:161-213).

    with_mul + out_rev is unsupported: the multiplier is applied AFTER the
    output bit-reversal, so the mul block would have to arrive bit-reversed
    — no caller needs that layout, so it is rejected rather than guarded."""
    if with_mul and out_rev:
        # survives python -O: this is an API contract, not a debug check
        raise ValueError(
            "_rows_kernel: with_mul applies after out_rev (mul would need "
            "a bit-reversed layout); combine is unsupported")
    F = get_jax_field(field_name)
    ops = _RawOps(F)
    nl = 1 if F.n_limbs else 0
    n = 1 << lg
    limb = (F.n_limbs,) if nl else ()

    def kernel(x_ref, tw_ref, *rest):
        out_ref = rest[-1]
        x = x_ref[:]
        if in_rev:
            x = _bitrev_axis(ops, x, lg)
        y = _stages_roll(ops, x, lg, tw_ref[:])
        if out_rev:
            y = _bitrev_axis(ops, y, lg)
        if with_mul:
            y = ops.mul(y, rest[0][:])
        if not out_t:
            out_ref[:] = y
            return
        # transposed write: one 128-column tile at a time — a single
        # (rows_pb, n) swapaxes makes Mosaic's relayout search explode
        # (40+ min compiles measured at (128, 8192)); per-tile (128, 128)
        # transposes lower natively and the full store stays in VMEM
        TT = 128
        if n <= TT or rows_pb > TT:
            out_ref[:] = jnp.swapaxes(y, -1, -2)
            return
        pre = (slice(None),) * (y.ndim - 2)
        for j in range(n // TT):
            tile = y[pre + (slice(None), slice(j * TT, (j + 1) * TT))]
            out_ref[pre + (slice(j * TT, (j + 1) * TT), slice(None))] = \
                jnp.swapaxes(tile, -1, -2)

    def call(x, tw, mul=None):
        """x: (limb?, OB?, B, n) — an optional extra leading batch dim OB
        (the recursive six-step's outer axis) becomes a second grid dim;
        with out_t only the B axis transposes against n, per OB slice."""
        batched = x.ndim > nl + 2
        B = x.shape[nl + (1 if batched else 0)]
        if batched:
            OB = x.shape[nl]
            grid = (OB, B // rows_pb)
            blk = limb + (1, rows_pb, n)
            idx = ((lambda b, i: (0, b, i, 0)) if nl
                   else (lambda b, i: (b, i, 0)))
            tw_blk = limb + (max(lg, 1), n)
            tw_idx = ((lambda b, i: (0, 0, 0)) if nl
                      else (lambda b, i: (0, 0)))
            if out_t:
                out_blk = limb + (1, n, rows_pb)
                out_idx = ((lambda b, i: (0, b, 0, i)) if nl
                           else (lambda b, i: (b, 0, i)))
                out_shape = x.shape[:nl] + (OB, n, B)
            else:
                out_blk, out_idx, out_shape = blk, idx, x.shape
        else:
            grid = (B // rows_pb,)
            blk = limb + (rows_pb, n)
            idx = (lambda i: (0, i, 0)) if nl else (lambda i: (i, 0))
            tw_blk = limb + (max(lg, 1), n)
            tw_idx = (lambda i: (0, 0, 0)) if nl else (lambda i: (0, 0))
            if out_t:
                out_blk = limb + (n, rows_pb)
                out_idx = (lambda i: (0, 0, i)) if nl else (lambda i: (0, i))
                out_shape = x.shape[:nl] + (n, B)
            else:
                out_blk, out_idx, out_shape = blk, idx, x.shape
        in_specs = [
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(tw_blk, tw_idx, memory_space=pltpu.VMEM),
        ]
        args = [x, tw]
        if with_mul:
            in_specs.append(pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM))
            args.append(mul)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(out_blk, out_idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*args)

    return call


@functools.lru_cache(maxsize=None)
def _cols_kernel(field_name: str, lg: int, cols_pb: int,
                 with_mul: bool = False):
    """pallas_call: batched independent NTTs along axis -2 (columns).

    Input (.., n, M): every lane column is an independent length-n NTT in
    natural order; butterflies roll/slice across SUBLANES, so the kernel
    reads and writes plain contiguous blocks — the four-step's first
    transpose disappears into the layout.  `with_mul` applies a same-shape
    multiplier (the middle twiddle matrix) to the output in-kernel."""
    F = get_jax_field(field_name)
    ops = _RawOps(F)
    nl = 1 if F.n_limbs else 0
    n = 1 << lg
    limb = (F.n_limbs,) if nl else ()

    def kernel(x_ref, tw_ref, *rest):
        out_ref = rest[-1]
        x = _bitrev_axis(ops, x_ref[:], lg, axis=-2)
        y = _stages_roll(ops, x, lg, tw_ref[:], axis=-2)
        if with_mul:
            y = ops.mul(y, rest[0][:])
        out_ref[:] = y

    def call(x, tw, mul=None):
        """x: (limb?, B?, n, M) — an optional leading batch dim B (the
        recursive six-step's outer k1 axis) becomes a second grid dim."""
        M = x.shape[-1]
        batched = x.ndim > nl + 2
        if batched:
            B = x.shape[nl]
            grid = (B, M // cols_pb)
            blk = limb + (1, n, cols_pb)
            idx = ((lambda b, j: (0, b, 0, j)) if nl
                   else (lambda b, j: (b, 0, j)))
            tw_blk = limb + (max(lg, 1), n)
            tw_idx = ((lambda b, j: (0, 0, 0)) if nl
                      else (lambda b, j: (0, 0)))
            mul_blk = limb + (n, cols_pb)      # mid table has no batch dim
            mul_idx = ((lambda b, j: (0, 0, j)) if nl
                       else (lambda b, j: (0, j)))
        else:
            grid = (M // cols_pb,)
            blk = limb + (n, cols_pb)
            idx = (lambda i: (0, 0, i)) if nl else (lambda i: (0, i))
            tw_blk = limb + (max(lg, 1), n)
            tw_idx = (lambda i: (0, 0, 0)) if nl else (lambda i: (0, 0))
            mul_blk, mul_idx = blk, idx
        in_specs = [
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(tw_blk, tw_idx, memory_space=pltpu.VMEM),
        ]
        args = [x, tw]
        if with_mul:
            in_specs.append(pl.BlockSpec(mul_blk, mul_idx,
                                         memory_space=pltpu.VMEM))
            args.append(mul)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(*args)

    return call


@functools.lru_cache(maxsize=None)
def _mid_factored_kernel(field_name: str, cols_pb: int, n1: int):
    """Standalone factored middle-twiddle multiply (wide fields):

        out[.., k1, j0 + t] = x[.., k1, j0 + t] * A[k1, j0/cols_pb] * B[k1, t]

    Kept OUT of the butterfly kernel on purpose: inlining two more mont
    muls per element pushed the wide column kernel past the Mosaic
    graph-size cliff (r5 preflight: >35 min remote compile, vs minutes
    for the butterfly kernel + this ~2-mul kernel separately).  The extra
    HBM pass costs ~2 array read+writes — noise next to the wide
    butterfly passes.  A's per-block column is selected via a one-hot
    lane reduction (Mosaic has no lane-indexed gather)."""
    F = get_jax_field(field_name)
    ops = _RawOps(F)
    nl = 1 if F.n_limbs else 0
    limb = (F.n_limbs,) if nl else ()

    def make_kernel(grid_dims):
        def kernel(x_ref, a_ref, b_ref, out_ref):
            j = pl.program_id(grid_dims - 1)
            a = a_ref[:]                       # (limb?, n1, AW), AW <= 128
            AW = a.shape[-1]
            lane = jax.lax.broadcasted_iota(jnp.uint32, a.shape[nl:], 1)
            pick = lane == (j % AW).astype(jnp.uint32)
            ai = jnp.where(pick, a, jnp.zeros_like(a)).astype(jnp.int32)
            a_sel = jnp.sum(ai, -1, keepdims=True).astype(a.dtype)
            out_ref[:] = ops.mul(ops.mul(x_ref[:], a_sel), b_ref[:])
        return kernel

    def call(x, amat, bmat):
        M = x.shape[-1]
        aw = amat.shape[-1] if amat.shape[-1] <= 128 else 128
        batched = x.ndim > nl + 2
        if batched:
            B = x.shape[nl]
            grid = (B, M // cols_pb)
            blk = limb + (1, n1, cols_pb)
            idx = ((lambda b, j: (0, b, 0, j)) if nl
                   else (lambda b, j: (b, 0, j)))
            a_blk = limb + (n1, aw)
            a_idx = ((lambda b, j: (0, 0, j // aw)) if nl
                     else (lambda b, j: (0, j // aw)))
            b_blk = limb + (n1, cols_pb)
            b_idx = ((lambda b, j: (0, 0, 0)) if nl
                     else (lambda b, j: (0, 0)))
        else:
            grid = (M // cols_pb,)
            blk = limb + (n1, cols_pb)
            idx = (lambda j: (0, 0, j)) if nl else (lambda j: (0, j))
            a_blk = limb + (n1, aw)
            a_idx = ((lambda j: (0, 0, j // aw)) if nl
                     else (lambda j: (0, j // aw)))
            b_blk = limb + (n1, cols_pb)
            b_idx = (lambda j: (0, 0, 0)) if nl else (lambda j: (0, 0))
        return pl.pallas_call(
            make_kernel(len(grid)),
            grid=grid,
            in_specs=[
                pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
                pl.BlockSpec(a_blk, a_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec(b_blk, b_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(x, amat, bmat)

    return call


def _apply_mid_factored(field_name: str, x, lg1: int, mul_pair):
    """Apply the factored middle twiddles to the column-pass output."""
    F = get_jax_field(field_name)
    nl = 1 if F.n_limbs else 0
    amat, bmat = mul_pair
    cols_pb = bmat.shape[-1]
    n1 = 1 << lg1
    fn = _mid_factored_kernel(field_name, cols_pb, n1)
    if x.ndim > nl + 3:                  # collapse multi-level batch dims
        shape = x.shape
        xf = x.reshape(shape[:nl] + (-1,) + shape[-2:])
        return fn(xf, amat, bmat).reshape(shape)
    return fn(x, amat, bmat)


def _pick_rows(field_name: str, lg: int) -> int:
    """Rows per block: keep a block around <=1 MiB of VMEM."""
    F = get_jax_field(field_name)
    planes = max(F.n_limbs, 1)
    row_bytes = (1 << lg) * 4 * planes
    rows = max(1, (1 << 20) // row_bytes)
    return 8 * max(rows // 8, 1) if rows >= 8 else rows


def _apply_rows(field_name: str, x, lg: int, table, mul=None,
                out_t: bool = False, in_rev: bool = True,
                out_rev: bool = False):
    """Fused bitrev + stage kernel over a batch of natural-order rows (last
    axis), optionally post-multiplying `mul` (same shape as x) in-kernel
    and/or writing the output transposed (out_t).

    When out_t, the OUTPUT block's lane dimension is rows_pb, and Mosaic
    requires the last block dim be a multiple of 128 (or the full axis) —
    so rows_pb is bumped to 128 when the (in+out) blocks still fit VMEM,
    and otherwise the transpose falls back to a separate XLA pass."""
    F = get_jax_field(field_name)
    nl = 1 if F.n_limbs else 0
    shape_in = x.shape
    if x.ndim > nl + 3:                  # collapse multi-level outer dims
        x = x.reshape(shape_in[:nl] + (-1,) + shape_in[-2:])
    B = x.shape[-2]
    rows_pb = min(_pick_rows(field_name, lg), B)
    while B % rows_pb:
        rows_pb -= 1
    if out_t and rows_pb != B and rows_pb % 128:
        # ALWAYS write natural and transpose in XLA (one extra HBM pass,
        # ~1 ms at 2^24).  The r4 per-128-column-tile transposed store
        # (rows_pb bumped to 128) produced a Mosaic kernel whose remote
        # compile hung >28 minutes at (128, 8192) — three independent
        # reproductions this round, and the likely cause of BENCH_r04's
        # rc=124: the driver recompiles from source, and this was the
        # first kernel bench_ntt needs.
        fn = _rows_kernel(field_name, lg, rows_pb,
                          with_mul=mul is not None, out_t=False,
                          in_rev=in_rev, out_rev=out_rev)
        return jnp.swapaxes(fn(x, table, mul), -1, -2)
    fn = _rows_kernel(field_name, lg, rows_pb, with_mul=mul is not None,
                      out_t=out_t, in_rev=in_rev, out_rev=out_rev)
    return fn(x, table, mul)


def _mid_cols_pb(field_name: str, lg: int, M: int) -> int:
    """Column-block width used by _apply_cols — exposed so table builders
    (factored middle twiddles) can size A/B to the same block."""
    F = get_jax_field(field_name)
    planes = max(F.n_limbs, 1)
    col_bytes = (1 << lg) * 4 * planes
    cols_pb = min(128, M, max(1, (1 << 21) // col_bytes))
    while M % cols_pb:
        cols_pb -= 1
    if cols_pb % 128 and cols_pb != M:
        # Mosaic: last block dim must be a 128 multiple or the whole axis.
        # Wide fields land here (fat columns shrink the budgeted width);
        # a 128-lane block is the only legal sub-block, VMEM allowing.
        cols_pb = min(128, M)
    return cols_pb


def _apply_cols(field_name: str, x, lg: int, table, mul=None):
    """Column NTTs (axis -2) over (.., n, M) in ~2 MiB lane-group blocks.
    Leading batch dims (recursive six-step) collapse into one grid dim."""
    F = get_jax_field(field_name)
    nl = 1 if F.n_limbs else 0
    M = x.shape[-1]
    cols_pb = _mid_cols_pb(field_name, lg, M)
    fn = _cols_kernel(field_name, lg, cols_pb, with_mul=mul is not None)
    if x.ndim > nl + 3:                  # collapse multi-level batch dims
        shape = x.shape
        xf = x.reshape(shape[:nl] + (-1,) + shape[-2:])
        return fn(xf, table, mul).reshape(shape)
    return fn(x, table, mul)


# ---------------------------------------------------------------------------
# single-chip large-domain NTT: four-step with fused row kernels
# ---------------------------------------------------------------------------

def _fused_core(field_name: str, x, lg: int, inverse: bool, tables,
                in_rev: bool = True, out_rev: bool = False,
                scale: bool = True):
    """Natural-in natural-out NTT body (traced inside some jit).  `tables`
    is (staged_full,) for lg <= LG_TILE, (staged_full(lg1),
    staged_full(lg2), middle_twiddle_matrix) for the four-step split, or
    (staged_full(lg1), mid, *subtables(lg2)) for the recursive
    (lg > LG_COL_CAP + LG_TILE) six-step split.

    For lg <= LG_TILE, `in_rev=False` accepts bit-reversed input and
    `out_rev=True` produces bit-reversed output, both free in VMEM (R*
    orders without a permutation pass).  `scale=False` suppresses the
    inverse 1/N factor (recursive sub-transforms: the TOP level owns the
    single global scale, folded into its middle-twiddle table)."""
    params = get_field(field_name)
    F = get_jax_field(field_name)
    scale_int = (params.domain_size_inverse(lg)
                 if (inverse and scale) else None)

    def _scaled(out):
        if scale_int is None:
            return out
        return F.mul(out, F.const(scale_int, batch_shape=(1,)))

    if lg <= _tile_cap(field_name):
        (table,) = tables
        xr = x.reshape(x.shape[:-1] + (1, 1 << lg))
        out = _apply_rows(field_name, xr, lg, table, in_rev=in_rev,
                          out_rev=out_rev)
        return _scaled(out.reshape(x.shape))
    assert in_rev and not out_rev, \
        "R orders above LG_TILE use standalone bit_reverse passes"

    t1, tmid = tables[0], tables[1]
    lg1 = _split_lg1(lg, field_name)
    lg2 = lg - lg1
    n1, n2 = 1 << lg1, 1 << lg2
    n = 1 << lg
    # Two HBM passes, zero standalone transposes (the reference needs 2-4
    # kernel steps plus bit-rev passes, ntt/ntt.cuh:100-158):
    #   A: column NTTs along axis -2 (sublane butterflies) produce
    #      B[k1, i2] in place, middle twiddle T[k1, i2] = w^(k1*i2)
    #      (1/N-scaled for the inverse when this level owns the scale)
    #      multiplied in-kernel;
    #   B: row NTTs along lanes produce D[k1, k2], each tile transposed in
    #      VMEM on write, so the flat result is already X[k1 + N1*k2].
    # For lg2 > LG_TILE (lg 25+, up to lg 24 + LG_COL_CAP — the role of the
    # reference's 3/4-way step split to lg 40, ntt/ntt.cuh:118-128), step B
    # is itself a recursive four-step on the last axis, followed by one
    # explicit transpose pass (its in-VMEM transposed write already spent
    # on the inner split).
    a = x.reshape(x.shape[:-1] + (n1, n2))
    if isinstance(tmid, tuple):
        # wide fields: factored mid applied as its own light kernel (see
        # _mid_factored_kernel for why it is not inlined in the butterflies)
        c = _apply_cols(field_name, a, lg1, t1)
        c = _apply_mid_factored(field_name, c, lg1, tmid)
    else:
        c = _apply_cols(field_name, a, lg1, t1, mul=tmid)  # (.., k1, i2)
    if lg2 <= _tile_cap(field_name):
        t2 = tables[2]
        outt = _apply_rows(field_name, c, lg2, t2, out_t=True)  # (.., k2, k1)
        return outt.reshape(x.shape[:-1] + (n,))
    d = _fused_core(field_name, c, lg2, inverse, tables[2:],
                    scale=False)                           # (.., k1, k2)
    outt = jnp.swapaxes(d, -1, -2)                         # (.., k2, k1)
    return outt.reshape(x.shape[:-1] + (n,))


# column length cap: 2^11 keeps column blocks ~2 MiB in VMEM at full
# 128-lane width
LG_COL_CAP = 11
# wide (multi-limb Montgomery) fields: kernel graph size scales with
# L^2 * stages, and the remote Mosaic compiler falls over past ~25K ops —
# smaller tiles trade one more pass for compilability
LG_COL_CAP_WIDE = 8
LG_TILE_WIDE = 10


def _is_wide(field_name: str) -> bool:
    return get_jax_field(field_name).n_limbs > 2


def _tile_cap(field_name: str) -> int:
    return LG_TILE_WIDE if _is_wide(field_name) else LG_TILE


def _split_lg1(lg: int, field_name: str = "") -> int:
    """Split for the four/six-step decomposition: column length capped at
    2^LG_COL_CAP (less for wide fields), row length at 2^LG_TILE; beyond
    their sum the row side recurses (handled in _fused_core)."""
    cap = LG_COL_CAP_WIDE if (field_name and _is_wide(field_name)) \
        else LG_COL_CAP
    return min(lg // 2, cap)


@functools.lru_cache(maxsize=None)
def _scaled_mid(field_name: str, lg: int):
    """Middle twiddle matrix with 1/N folded in — the inverse four-step's
    per-element scale costs nothing extra this way (the reference folds 1/n
    into the last stage, ct_mixed_radix_narrow.cu:156-162).  For wide
    fields the factored (A, B) pair is used and the scale folds into A."""
    params = get_field(field_name)
    F = get_jax_field(field_name)
    pm = get_parameters(field_name)
    lg1 = _split_lg1(lg, field_name)
    scale = F.const(params.domain_size_inverse(lg), batch_shape=(1, 1))
    if _is_wide(field_name):
        A, B = _factored_mid(field_name, lg, True, lg1)
        return (jax.jit(F.mul)(A, scale), B)
    tmid = pm.middle_twiddle_matrix(lg, True, lg1)
    return jax.jit(F.mul)(tmid, scale)


def _factored_mid(field_name: str, lg: int, inverse: bool, lg1: int):
    """(A, B) factored middle twiddles sized to the column kernel's block
    width (see _cols_kernel's factored path)."""
    pm = get_parameters(field_name)
    n2 = 1 << (lg - lg1)
    block = _mid_cols_pb(field_name, lg1, n2)
    return pm.middle_twiddle_factored(lg, inverse, lg1, block)


def _fused_tables(field_name: str, lg: int, inverse: bool,
                  top: bool = True):
    pm = get_parameters(field_name)
    if lg <= _tile_cap(field_name):
        return (pm.staged_full_table(lg, inverse),)
    lg1 = _split_lg1(lg, field_name)
    lg2 = lg - lg1
    if inverse and top:
        mid = _scaled_mid(field_name, lg)
    elif _is_wide(field_name):
        # wide fields: O(sqrt n) factored pair instead of the O(n) matrix
        # (a 256-bit field at lg 26 would need ~4 GB/direction otherwise)
        mid = _factored_mid(field_name, lg, inverse, lg1)
    else:
        mid = pm.middle_twiddle_matrix(lg, inverse, lg1)
    head = (pm.staged_full_table(lg1, inverse), mid)
    if lg2 <= _tile_cap(field_name):
        return head + (pm.staged_full_table(lg2, inverse),)
    return head + _fused_tables(field_name, lg2, inverse, top=False)


@functools.lru_cache(maxsize=None)
def _fused_fn(field_name: str, lg: int, inverse: bool):
    return jax.jit(functools.partial(_fused_core, field_name, lg=lg,
                                     inverse=inverse))


def ntt_fused(field, x, lg: int, inverse: bool = False):
    """Single-chip natural-order NTT through the fused Pallas path."""
    name = field if isinstance(field, str) else field.name
    fn = _fused_fn(name, lg, inverse)
    return fn(x, tables=_fused_tables(name, lg, inverse))


def coset_shift_bitrev(field_name: str, lg: int, order: str,
                       inverse: bool) -> bool:
    """Single source of truth for the coset shift table's layout: True when
    the table must be BIT-REVERSED to match the array it multiplies.

    Forward pre-multiplies the wire input, whose layout is R iff the input
    order is R.  Inverse post-multiplies the output, which is natural
    everywhere except the fused single-tile path whose kernel emits R
    directly (ntt/ntt.cuh:196-209 passes the same bitrev flag to
    LDE_powers).  base_dev builds the table with this; fused_facade_fn
    asserts against it — the two can't drift."""
    if not inverse:
        return order[0] == "R"
    return (use_fused(field_name, lg) and lg <= _tile_cap(field_name)
            and order[1] == "R")


@functools.lru_cache(maxsize=None)
def fused_facade_fn(field_name: str, lg: int, order: str, inverse: bool,
                    coset: bool):
    """Full facade semantics (NN/NR/RN/RR orders, coset pre/post shift) on
    the fused path.

    For lg <= LG_TILE the R orders are free: the kernel skips its in-VMEM
    input bit-reversal (R input) or adds an output one (R output) — the
    role of the reference's CT/GS kernel selection that avoids standalone
    permutation passes entirely (ntt/ntt.cuh:161-213).  Above LG_TILE the
    four-step path keeps natural-order dataflow and R orders cost one
    bit-reverse gather pass (~7% of the NTT at 2^24).

    Coset shift tables arrive already layout-matched from base_dev
    (bit-reversed when they multiply a bit-reversed-layout array)."""
    F = get_jax_field(field_name)
    single = lg <= _tile_cap(field_name)
    in_r = order[0] == "R"
    out_r = order[1] == "R"
    if coset:
        # the layout this facade multiplies the shift table in must agree
        # with the layout base_dev built the table in.  NOTE: checked once
        # per (field, lg, order, inverse, coset) construction (lru_cache);
        # use_fused consults live env state, so a mid-process SPPARK_FUSED
        # flip is not re-checked here (base_dev still routes correctly).
        expect_br = in_r if not inverse else (single and out_r)
        if coset_shift_bitrev(field_name, lg, order, inverse) != expect_br:
            raise AssertionError(
                f"coset shift layout drift: {(field_name, lg, order, inverse)}")

    def run(x, tables, shift):
        if coset and not inverse:
            # shift is bitrev'd by the caller when the input layout is R
            x = F.mul(x, shift)
        if single:
            y = _fused_core(field_name, x, lg, inverse, tables,
                            in_rev=not in_r, out_rev=out_r)
            if coset and inverse:
                # shift is bitrev'd by the caller when the output layout is R
                y = F.mul(y, shift)
            return y
        if in_r:
            x = bit_reverse(x, lg)
        y = _fused_core(field_name, x, lg, inverse, tables)
        if coset and inverse:
            y = F.mul(y, shift)
        if out_r:
            y = bit_reverse(y, lg)
        return y

    return jax.jit(run)


def use_fused(field_name: str, lg: int) -> bool:
    """Fused path applies to every field engine on TPU backends: narrow
    (gl64/mont32, <= 2 u32 planes) and wide multi-limb Montgomery, whose
    butterflies inline the list-form mont mul from ff/bigmont.py (the role
    of the reference's dedicated wide kernels,
    ntt/kernels/ct_mixed_radix_wide.cu:5-191,
    gs_mixed_radix_wide.cu:5-181).  CPU runs go through the generic XLA
    stages.  SPPARK_FUSED=0/1 forces either way."""
    import os
    if lg < 1:
        return False
    forced = os.environ.get("SPPARK_FUSED")
    if forced is not None:
        return bool(int(forced))
    return jax.default_backend() not in ("cpu",)
