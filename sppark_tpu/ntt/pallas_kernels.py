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
    with one `canon()` at kernel exit."""

    def __init__(self, F):
        self.F = F
        cls = type(F)
        self.add = lambda a, b: cls.add(F, a, b)
        self.sub = lambda a, b: cls.sub(F, a, b)
        self.mul = lambda a, b: cls.mul(F, a, b)
        self.select = lambda c, a, b: cls.select(F, c, a, b)
        self.n_limbs = F.n_limbs
        lazy = hasattr(cls, "add_lazy")
        self.addl = (lambda a, b: cls.add_lazy(F, a, b)) if lazy else self.add
        self.subl = (lambda a, b: cls.sub_lazy(F, a, b)) if lazy else self.sub
        self.mull = (lambda a, b: cls.mul_lazy(F, a, b)) if lazy else self.mul
        self.canon = (lambda a: cls.canon(F, a)) if lazy else (lambda a: a)


def _roll(x, shift: int):
    n = x.shape[-1]
    return pltpu.roll(x, shift % n, axis=x.ndim - 1)


def _bitrev_lanes(ops: _RawOps, x, lg: int):
    """Bit-reverse permutation along the last axis, entirely in VMEM.

    The permutation factors into lg/2 independent mirrored-bit-pair swaps;
    each swap moves elements by a fixed +/-d, so it is two static lane
    rolls and selects — no gather, no extra HBM pass (the role of the
    bit_rev_permutation kernels, ntt/kernels.cu:16-129, done for free
    inside the butterfly kernel's tile)."""
    nl = 1 if ops.n_limbs else 0
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape[nl:], x.ndim - nl - 1)
    for k in range(lg // 2):
        lo, hi = k, lg - 1 - k
        d = (1 << hi) - (1 << lo)
        blo = (lane >> np.uint32(lo)) & np.uint32(1)
        bhi = (lane >> np.uint32(hi)) & np.uint32(1)
        take_up = (blo == 1) & (bhi == 0)     # comes from index i + d
        take_dn = (blo == 0) & (bhi == 1)     # comes from index i - d
        x = ops.select(take_up, _roll(x, -d),
                       ops.select(take_dn, _roll(x, d), x))
    return x


# butterfly stages with h >= _SPLIT_H use 128-aligned lane slices instead of
# roll/select: the twiddle multiply then runs on HALF the lanes (the lo
# half's product in the roll form is dead work) and the roll/select pair
# disappears entirely.
_SPLIT_H = 128


def _stages_roll(ops: _RawOps, x, lg: int, table):
    """All lg CT stages along the last axis (bit-reversed input, natural
    output).  `table` = (.., lg, n) staged_full_table; everything stays in
    VMEM with a fixed last-axis length.  Arithmetic is lazy (partially
    reduced) where the field supports it; output is canonical."""
    n = 1 << lg
    nl = 1 if ops.n_limbs else 0
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape[nl:], x.ndim - nl - 1)
    for s in range(1, lg + 1):
        h = 1 << (s - 1)
        w = table[..., s - 1, :]                    # (.., n)
        if h >= _SPLIT_H and n // (2 * h) <= 16:
            # sliced-half butterflies: block [a, a+2h) splits into lo/hi
            pieces = []
            for a in range(0, n, 2 * h):
                lo = x[..., a:a + h]
                hi = x[..., a + h:a + 2 * h]
                t = ops.mull(w[..., a + h:a + 2 * h], hi)
                pieces.append(ops.addl(lo, t))
                pieces.append(ops.subl(lo, t))
            x = jnp.concatenate(pieces, axis=-1)
        else:
            y = ops.mull(w, x)
            lo_val = ops.addl(x, _roll(y, -h))      # x[i] + w*x[i+h]
            hi_val = ops.subl(_roll(x, h), y)       # x[i-h] - w*x[i]
            is_lo = (lane & np.uint32(h)) == 0
            x = ops.select(is_lo, lo_val, hi_val)
    return ops.canon(x)


@functools.lru_cache(maxsize=None)
def _rows_kernel(field_name: str, lg: int, rows_pb: int,
                 with_mul: bool = False):
    """pallas_call: batched independent NTTs along the last axis.
    Input (.., B, n) NATURAL-order rows (bit-reversal happens in VMEM);
    output natural order.  With `with_mul`, a per-row multiplier block of
    the same (.., B, n) layout is applied to the OUTPUT — this fuses the
    four-step middle twiddle multiply into the column-NTT kernel so it
    costs no separate HBM pass."""
    F = get_jax_field(field_name)
    ops = _RawOps(F)
    nl = 1 if F.n_limbs else 0
    n = 1 << lg
    limb = (F.n_limbs,) if nl else ()

    def kernel(x_ref, tw_ref, *rest):
        out_ref = rest[-1]
        x = _bitrev_lanes(ops, x_ref[:], lg)
        y = _stages_roll(ops, x, lg, tw_ref[:])
        if with_mul:
            y = ops.mul(y, rest[0][:])
        out_ref[:] = y

    def call(x, tw, mul=None):
        B = x.shape[nl]
        grid = (B // rows_pb,)
        blk = limb + (rows_pb, n)
        idx = (lambda i: (0, i, 0)) if nl else (lambda i: (i, 0))
        tw_blk = limb + (max(lg, 1), n)
        tw_idx = (lambda i: (0, 0, 0)) if nl else (lambda i: (0, 0))
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
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
        )(*args)

    return call


def _pick_rows(field_name: str, lg: int) -> int:
    """Rows per block: keep a block around <=1 MiB of VMEM."""
    F = get_jax_field(field_name)
    planes = max(F.n_limbs, 1)
    row_bytes = (1 << lg) * 4 * planes
    rows = max(1, (1 << 20) // row_bytes)
    return 8 * max(rows // 8, 1) if rows >= 8 else rows


def _apply_rows(field_name: str, x, lg: int, table, mul=None):
    """Fused bitrev + stage kernel over a batch of natural-order rows (last
    axis), optionally post-multiplying `mul` (same shape as x) in-kernel."""
    F = get_jax_field(field_name)
    nl = 1 if F.n_limbs else 0
    B = x.shape[nl]
    rows_pb = min(_pick_rows(field_name, lg), B)
    while B % rows_pb:
        rows_pb -= 1
    fn = _rows_kernel(field_name, lg, rows_pb, with_mul=mul is not None)
    return fn(x, table, mul)


# ---------------------------------------------------------------------------
# single-chip large-domain NTT: four-step with fused row kernels
# ---------------------------------------------------------------------------

def _fused_core(field_name: str, x, lg: int, inverse: bool, tables):
    """Natural-in natural-out NTT body (traced inside some jit).  `tables`
    is (staged_full,) for lg <= LG_TILE or (staged_full(lg1),
    staged_full(lg2), middle_twiddle_matrix) for the four-step split."""
    params = get_field(field_name)
    F = get_jax_field(field_name)
    scale_int = params.domain_size_inverse(lg) if inverse else None

    def _scaled(out):
        if scale_int is None:
            return out
        return F.mul(out, F.const(scale_int, batch_shape=(1,)))

    if lg <= LG_TILE:
        (table,) = tables
        xr = x.reshape(x.shape[:-1] + (1, 1 << lg))
        out = _apply_rows(field_name, xr, lg, table)
        return _scaled(out.reshape(x.shape))

    t1, t2, tmid = tables
    lg1 = lg // 2
    lg2 = lg - lg1
    n1, n2 = 1 << lg1, 1 << lg2
    n = 1 << lg
    # x natural (.., n) -> (.., N1, N2) row-major
    a = x.reshape(x.shape[:-1] + (n1, n2))
    # column NTTs: transpose so columns land on the last axis; the middle
    # twiddle T[i2, k1] = w^(i2*k1) (pre-scaled by 1/N for the inverse) is
    # applied inside the same kernel pass
    b = jnp.swapaxes(a, -1, -2)                           # (.., N2, N1)
    c = _apply_rows(field_name, b, lg1, t1, mul=tmid)
    # row NTTs of the original rows = last axis after transpose back
    d = jnp.swapaxes(c, -1, -2)                           # (.., N1=k1, N2=i2)
    e = _apply_rows(field_name, d, lg2, t2)               # D[k1, k2]
    # natural order: out[k1 + N1*k2] -> flatten D^T
    return jnp.swapaxes(e, -1, -2).reshape(x.shape[:-1] + (n,))


@functools.lru_cache(maxsize=None)
def _scaled_mid(field_name: str, lg: int):
    """Middle twiddle matrix with 1/N folded in — the inverse four-step's
    per-element scale costs nothing extra this way (the reference folds 1/n
    into the last stage, ct_mixed_radix_narrow.cu:156-162)."""
    params = get_field(field_name)
    F = get_jax_field(field_name)
    pm = get_parameters(field_name)
    tmid = pm.middle_twiddle_matrix(lg, True)
    scale = F.const(params.domain_size_inverse(lg), batch_shape=(1, 1))
    return jax.jit(F.mul)(tmid, scale)


def _fused_tables(field_name: str, lg: int, inverse: bool):
    pm = get_parameters(field_name)
    if lg <= LG_TILE:
        return (pm.staged_full_table(lg, inverse),)
    lg1 = lg // 2
    return (pm.staged_full_table(lg1, inverse),
            pm.staged_full_table(lg - lg1, inverse),
            _scaled_mid(field_name, lg) if inverse
            else pm.middle_twiddle_matrix(lg, False))


@functools.lru_cache(maxsize=None)
def _fused_fn(field_name: str, lg: int, inverse: bool):
    return jax.jit(functools.partial(_fused_core, field_name, lg=lg,
                                     inverse=inverse))


def ntt_fused(field, x, lg: int, inverse: bool = False):
    """Single-chip natural-order NTT through the fused Pallas path."""
    name = field if isinstance(field, str) else field.name
    fn = _fused_fn(name, lg, inverse)
    return fn(x, tables=_fused_tables(name, lg, inverse))


@functools.lru_cache(maxsize=None)
def fused_facade_fn(field_name: str, lg: int, order: str, inverse: bool,
                    coset: bool):
    """Full facade semantics (NN/NR/RN/RR orders, coset pre/post shift) on
    the fused path.  R orders cost one extra full-domain bit-reverse gather
    (~7% of the NTT at 2^24) — the reference's CT/GS switcheroo that avoids
    it entirely (ntt/ntt.cuh:161-213) is a later optimization."""
    F = get_jax_field(field_name)

    def run(x, tables, shift):
        if coset and not inverse:
            x = F.mul(x, shift)
        if order[0] == "R":
            x = bit_reverse(x, lg)
        y = _fused_core(field_name, x, lg, inverse, tables)
        if coset and inverse:
            y = F.mul(y, shift)
        if order[1] == "R":
            y = bit_reverse(y, lg)
        return y

    return jax.jit(run)


def use_fused(field_name: str, lg: int) -> bool:
    """Fused path applies to narrow fields (<= 2 u32 planes: gl64 and the
    mont32 family) on TPU backends; wide (multi-limb Montgomery) fields and
    CPU runs go through the generic XLA stages.  SPPARK_FUSED=0/1 forces."""
    import os
    forced = os.environ.get("SPPARK_FUSED")
    if forced is not None:
        return bool(int(forced))
    F = get_jax_field(field_name)
    return (F.n_limbs <= 2 and lg >= 1
            and jax.default_backend() not in ("cpu",))
