"""Multi-limb Montgomery fields (BN254/BLS12-381/377/Pasta) — mont_t analogue.

The reference's mont_t (ff/mont_t.cuh:33-36) rides PTX add-with-carry chains;
TPUs have no carry flag, so the design is different:

  * Elements are ``(L, *batch)`` uint32 planes, little-endian **16-bit
    limbs** (each plane holds values < 2^16 between ops).  L = mont_bits/16,
    so R = 2^(16*L) equals the reference's R = 2^(32*n) and Montgomery wire
    forms match bit-exactly.
  * Products of 16-bit limbs fit u32 exactly; column accumulation of the
    schoolbook product keeps every accumulator < 8*L*2^16 < 2^32 for all
    supported L (<= 24), so **no carries are materialized inside the hot
    loop** — one normalization pass at the end.
  * Montgomery reduction is interleaved word-by-word (CIOS-flavoured): at
    step i only position i must be exact mod 2^16, which needs just the
    running carry, not a full normalization (analogous to mad_n_redc,
    ff/mont_t.cuh:381-423).

The limb math lives in free functions over *Python lists of planes*
(`mul_limbs`, `sqr_limbs`) — pure unrolled elementwise dataflow with no
stacking, slicing, or dynamic updates, shared verbatim by three backends:

  1. a **Pallas kernel** (the default on TPU): all ~2.5K intermediate limb
     values stay in VMEM/vector registers — measured ~10x over any XLA
     formulation, which materializes every intermediate through HBM;
  2. a plain XLA graph (CPU tests, tiny batches);
  3. fused consumers (EC point kernels, wide-field NTT butterflies) that
     inline these functions inside their own Pallas kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import FieldParams
from .base import BaseField

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)

# lanes per Pallas block: (L, _BLOCK_ROWS, 128) u32
_BLOCK_ROWS = 32


def _interpret() -> bool:
    import os
    return os.environ.get("SPPARK_PALLAS_INTERPRET") == "1"


# ---------------------------------------------------------------------------
# list-form limb math (shared by Pallas kernels and XLA graphs)
# ---------------------------------------------------------------------------

def norm_limbs(planes):
    """Propagate carries through u32 planes (< 2^32) -> (16-bit planes,
    final carry plane)."""
    out = []
    carry = jnp.zeros_like(planes[0])
    for x in planes:
        s = x + carry
        out.append(s & _MASK16)
        carry = s >> 16
    return out, carry


def sub_p_limbs(xs, P_LIMBS):
    """x - p with borrow; returns (planes, borrow in {0,1})."""
    L = len(xs)
    out = []
    borrow = jnp.zeros_like(xs[0])
    for i in range(L):
        t = xs[i] + np.uint32(0x10000) - P_LIMBS[i] - borrow
        out.append(t & _MASK16)
        borrow = np.uint32(1) - (t >> 16)
    return out, borrow


def cond_sub_p(xs, P_LIMBS, force=None):
    """Subtract p where (value >= p) or force; xs must be 16-bit planes."""
    sub, borrow = sub_p_limbs(xs, P_LIMBS)
    need = borrow == 0
    if force is not None:
        need = need | (force != 0)
    return [jnp.where(need, s, x) for s, x in zip(sub, xs)]


def _redc_rows(acc, P_LIMBS, M0, L):
    """Interleaved Montgomery reduction of 2L accumulator columns; returns
    canonical 16-bit result planes (the mad_n_redc dataflow,
    ff/mont_t.cuh:381-423, with materialized carries)."""
    carry = jnp.zeros_like(acc[0])
    for i in range(L):
        v = acc[i] + carry
        m = (v * M0) & _MASK16
        for j in range(L):
            p = P_LIMBS[j] * m
            if j == 0:
                carry = (v + (p & _MASK16)) >> 16
            else:
                acc[i + j] = acc[i + j] + (p & _MASK16)
            acc[i + j + 1] = acc[i + j + 1] + (p >> 16)
    out, c = norm_limbs([acc[L] + carry] + acc[L + 1:])
    return cond_sub_p(out, P_LIMBS, force=c)


def mul_limbs(xs, ys, P_LIMBS, M0):
    """Montgomery product over limb-plane lists: x*y*R^-1 mod p, canonical.

    Schoolbook column accumulation (lo into column i+j, hi into i+j+1;
    every column stays < 4L*2^16 < 2^32) followed by interleaved REDC.
    Fully unrolled straight-line dataflow — no tensor stacking/slicing.
    """
    L = len(xs)
    acc = [None] * (2 * L)

    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(L):
        for j in range(L):
            p = xs[i] * ys[j]
            add(i + j, p & _MASK16)
            add(i + j + 1, p >> 16)
    return _redc_rows(acc, P_LIMBS, M0, L)


def sqr_limbs(xs, P_LIMBS, M0):
    """Montgomery square: off-diagonal products computed once and doubled
    (the dedicated squaring of ff/mont_t.cuh:146-193) — ~45% fewer
    multiplies than mul_limbs."""
    L = len(xs)
    acc = [None] * (2 * L)

    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(L):
        p = xs[i] * xs[i]
        add(2 * i, p & _MASK16)
        add(2 * i + 1, p >> 16)
        for j in range(i + 1, L):
            p = xs[i] * xs[j]
            lo2 = (p & _MASK16) << 1          # < 2^17, still safe in column
            hi2 = (p >> 16) << 1
            add(i + j, lo2)
            add(i + j + 1, hi2)
    return _redc_rows(acc, P_LIMBS, M0, L)


def add_limbs(xs, ys, P_LIMBS):
    s = [x + y for x, y in zip(xs, ys)]       # each < 2^17
    planes, carry = norm_limbs(s)
    return cond_sub_p(planes, P_LIMBS, force=carry)


def sub_limbs_mod(xs, ys, P_LIMBS):
    L = len(xs)
    d, borrow = _sub_limbs_list(xs, ys)
    addp = [d[i] + P_LIMBS[i] for i in range(L)]
    addp, _ = norm_limbs(addp)
    return [jnp.where(borrow == 1, a, b) for a, b in zip(addp, d)]


def _sub_limbs_list(xs, ys):
    out = []
    borrow = jnp.zeros_like(xs[0])
    for x, y in zip(xs, ys):
        t = x + np.uint32(0x10000) - y - borrow
        out.append(t & _MASK16)
        borrow = np.uint32(1) - (t >> 16)
    return out, borrow


class BigMontField(BaseField):
    limb_bits = 16

    def __init__(self, params: FieldParams):
        super().__init__(params)
        L = params.mont_bits // 16
        self.L = L
        self.n_limbs = L
        assert 8 * L * (1 << 16) < (1 << 32), "accumulator bound violated"
        self.P_LIMBS = np.asarray(
            [(params.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
            dtype=np.uint32)
        self.M0 = np.uint32(params.m0(16))
        self.RR_LIMBS = self._int_to_limbs(params.RR)
        self.ONE_LIMBS = self._int_to_limbs(params.one_mont)
        self._finalize()

    # -- host limb packing ------------------------------------------------------
    def _int_to_limbs(self, v: int) -> np.ndarray:
        return np.asarray([(v >> (16 * i)) & 0xFFFF for i in range(self.L)],
                          dtype=np.uint32)

    def _limbs_to_int(self, limbs) -> int:
        return sum(int(x) << (16 * i) for i, x in enumerate(limbs))

    def _stack(self, planes):
        return jnp.stack(planes)

    def _unstack(self, arr):
        return [arr[i] for i in range(self.L)]

    # -- Pallas elementwise dispatch -------------------------------------------
    def _use_pallas(self, n_lanes: int) -> bool:
        if n_lanes == 0:
            # associative_scan recursion produces zero-length operands
            return False
        if _interpret():
            # interpreter runs are CI correctness checks: route only
            # batch-sized ops through the (slow) interpreted kernel
            return n_lanes >= 1024
        # on real TPU the kernel wins at EVERY size: a serial Fermat chain
        # of (L, nwins)-shaped muls costs ~5200 tiny XLA ops per step vs
        # one ~5 us pallas call
        return jax.default_backend() not in ("cpu",)

    def _pallas_ew(self, kind: str, *args):
        """Run a limb op through the elementwise Pallas kernel: args are
        (L, *batch) arrays broadcast to a common batch, flattened to
        (L, R, 128) blocks; intermediates never leave VMEM."""
        L = self.L
        batch = jnp.broadcast_shapes(*(a.shape[1:] for a in args))
        args = [jnp.broadcast_to(a, (L,) + batch) for a in args]
        n = int(np.prod(batch)) if batch else 1
        # pad to the 128-lane granule only — tiny ops (Fermat chains on
        # (nwins,)-sized tensors) shouldn't inflate to a full block; large
        # batches pad to 1024 lanes so the row count divides by 8 (Mosaic
        # block constraint)
        g = 1024 if n > 8192 else 128
        n_pad = -(-n // g) * g
        flat = [a.reshape(L, n) for a in args]
        if n_pad != n:
            flat = [jnp.pad(a, ((0, 0), (0, n_pad - n))) for a in flat]
        shaped = [a.reshape(L, n_pad // 128, 128) for a in flat]
        out = _ew_call(self, kind, len(args), n_pad // 128)(*shaped)
        out = out.reshape(L, n_pad)
        if n_pad != n:
            out = out[:, :n]
        return out.reshape((L,) + batch)

    # -- ring ops --------------------------------------------------------------------
    def add(self, x, y):
        return self._stack(add_limbs(self._unstack(x),
                                     [y[i] for i in range(self.L)],
                                     self.P_LIMBS))

    def sub(self, x, y):
        return self._stack(sub_limbs_mod(self._unstack(x),
                                         [y[i] for i in range(self.L)],
                                         self.P_LIMBS))

    def neg(self, x):
        zero = self.is_zero(x)
        pb = [jnp.broadcast_to(jnp.asarray(self.P_LIMBS[i]), x[i].shape)
              for i in range(self.L)]
        d, _ = _sub_limbs_list(pb, self._unstack(x))
        return self._stack([jnp.where(zero, jnp.zeros_like(v), v) for v in d])

    def mul(self, x, y):
        """Montgomery product x*y*R^-1 (mont_t operator*, mad_n_redc
        ff/mont_t.cuh:381-423)."""
        batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        n = int(np.prod(batch)) if batch else 1
        if self._use_pallas(n):
            return self._pallas_ew("mul", x, y)
        return self._mul_xla(x, y)

    def sqr(self, x):
        """Dedicated squaring (wide_t(a) squaring, ff/mont_t.cuh:146-193)."""
        n = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        if self._use_pallas(n):
            return self._pallas_ew("sqr", x)
        return self._mul_xla(x, x)

    def _mul_xla(self, x, y):
        """Compile-friendly XLA form (CPU tests / tiny batches): the same
        schoolbook + interleaved-REDC math, but as L slice-adds on a
        stacked (2L, *batch) accumulator instead of unrolled per-limb
        dataflow — the flat ~L^2-op graph takes MINUTES through XLA-CPU's
        emitter at L=24, the O(L)-op dynamic-slice graph compiles in
        seconds.  The Pallas/Mosaic path (above) prefers the flat form."""
        L = self.L
        batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        acc = jnp.zeros((2 * L,) + batch, _U32)
        zrow = jnp.zeros((1,) + batch, _U32)
        # schoolbook product: row i of x against all of y
        for i in range(L):
            prod = x[i][None] * y             # (L, *batch) u32, exact
            contrib = (jnp.concatenate([prod & _MASK16, zrow])
                       + jnp.concatenate([zrow, prod >> 16]))
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, jax.lax.dynamic_slice_in_dim(acc, i, L + 1) + contrib,
                i, axis=0)
        # interleaved Montgomery reduction
        carry = jnp.zeros(batch, _U32)
        pl_b = jnp.asarray(self.P_LIMBS).reshape((L,) + (1,) * len(batch))
        for i in range(L):
            v = acc[i] + carry
            m = (v * self.M0) & _MASK16
            prod = pl_b * m[None]             # (L, *batch) u32, exact
            lo = prod & _MASK16
            hi = prod >> 16
            carry = (v + lo[0]) >> 16
            contrib = (jnp.concatenate([lo[1:], hi[L - 1:]])
                       + jnp.concatenate([hi[:L - 1], zrow]))
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, jax.lax.dynamic_slice_in_dim(acc, i + 1, L) + contrib,
                i + 1, axis=0)
        # normalize the top half + the running carry
        top = [acc[L] + carry] + [acc[L + j] for j in range(1, L)]
        planes, carry_out = norm_limbs(top)
        return self._stack(cond_sub_p(planes, self.P_LIMBS,
                                      force=carry_out))

    # -- Montgomery domain -----------------------------------------------------------
    def to_mont(self, x):
        rr = self._stack([jnp.broadcast_to(jnp.asarray(self.RR_LIMBS[i]),
                                           x[i].shape) for i in range(self.L)])
        return self.mul(x, rr)

    def from_mont(self, x):
        one = self._stack([
            jnp.broadcast_to(jnp.asarray(np.uint32(1 if i == 0 else 0)),
                             x[i].shape) for i in range(self.L)])
        return self.mul(x, one)

    # -- host conversion -----------------------------------------------------------------
    def from_int_list(self, values, batch_shape=None, broadcast=False):
        """Canonical ints -> device planes (Montgomery wire form)."""
        wire = [self.params.to_mont(v % self.p) for v in values]
        arr = np.zeros((self.L, len(wire)), dtype=np.uint32)
        for c, v in enumerate(wire):
            for i in range(self.L):
                arr[i, c] = (v >> (16 * i)) & 0xFFFF
        if broadcast and batch_shape is not None:
            one = jnp.asarray(arr[:, 0].reshape(
                (self.L,) + (1,) * len(batch_shape)))
            return jnp.broadcast_to(one, (self.L,) + tuple(batch_shape))
        if batch_shape is not None:
            arr = arr.reshape((self.L,) + tuple(batch_shape))
        return jnp.asarray(arr)

    def to_int_list(self, arr) -> list:
        host = np.asarray(arr, dtype=np.uint64)
        flat = host.reshape(self.L, -1)
        out = []
        for c in range(flat.shape[1]):
            v = sum(int(flat[i, c]) << (16 * i) for i in range(self.L))
            out.append(self.params.from_mont(v))
        return out

    def from_wire_np(self, arr: np.ndarray):
        """Wire: (..., n32) little-endian u32 words (the reference FFI layout)
        -> device 16-bit planes."""
        a = np.ascontiguousarray(arr, dtype=np.uint32)
        n32 = self.L // 2
        a = a.reshape(-1, n32)
        planes = np.empty((self.L, a.shape[0]), dtype=np.uint32)
        for w in range(n32):
            planes[2 * w] = a[:, w] & 0xFFFF
            planes[2 * w + 1] = a[:, w] >> 16
        return jnp.asarray(planes)

    def to_wire_np(self, arr) -> np.ndarray:
        host = np.asarray(arr, dtype=np.uint32)
        flat = host.reshape(self.L, -1)
        n32 = self.L // 2
        out = np.empty((flat.shape[1], n32), dtype=np.uint32)
        for w in range(n32):
            out[:, w] = flat[2 * w] | (flat[2 * w + 1] << 16)
        return out


@functools.lru_cache(maxsize=None)
def _ew_call_cached(field_name: str, L: int, kind: str, n_in: int, R: int,
                    interpret: bool):
    from ..params import get_field
    params = get_field(field_name)
    P_LIMBS = np.asarray(
        [(params.modulus >> (16 * i)) & 0xFFFF for i in range(L)],
        dtype=np.uint32)
    M0 = np.uint32(params.m0(16))
    rb = R
    for cand in range(min(_BLOCK_ROWS, R), 7, -1):
        if R % cand == 0 and cand % 8 == 0:
            rb = cand
            break

    def kernel(*refs):
        out_ref = refs[-1]
        ins = [[r[i] for i in range(L)] for r in refs[:-1]]
        if kind == "mul":
            out = mul_limbs(ins[0], ins[1], P_LIMBS, M0)
        elif kind == "sqr":
            out = sqr_limbs(ins[0], P_LIMBS, M0)
        else:  # pragma: no cover
            raise ValueError(kind)
        out_ref[:] = jnp.stack(out)

    blk = (L, rb, 128)
    spec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[spec] * n_in,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, R, 128), jnp.uint32),
        interpret=interpret,
    )


def _ew_call(F: BigMontField, kind: str, n_in: int, R: int):
    return _ew_call_cached(F.params.name, F.L, kind, n_in, R, _interpret())
