"""Radix-2 NTT dataflow on JAX arrays (ntt/ntt.cuh + kernels analogue).

TPU-first design notes:
  * A CT stage is expressed as reshape -> broadcast twiddle multiply ->
    add/sub -> reshape: pure static-shape elementwise dataflow that XLA
    fuses and tiles for the VPU.  No shared-memory staging, no warp
    shuffles — lane permutation is free at the XLA level via reshapes.
  * NN/NR/RN/RR orders reduce to optional bit-reverse gathers around a
    single CT pipeline; the reference instead switches between CT and GS
    kernels to avoid the permutation pass (ntt/ntt.cuh:161-213).  A gather
    is one O(N) pass here, and XLA fuses it into the first stage's loads —
    the Pallas fused kernel removes it entirely for the NR/RN cases.
  * 1/N scaling for the inverse is folded into the last stage's twiddle
    table (like ct_mixed_radix_narrow.cu:156-162 folds it into stage lg).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.base import BaseField


@functools.lru_cache(maxsize=None)
def bitrev_indices(lg_n: int) -> np.ndarray:
    n = 1 << lg_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(lg_n):
        rev |= ((idx >> b) & 1) << (lg_n - 1 - b)
    return rev


def bit_reverse(x, lg_n: int):
    """Bit-reverse permutation along the last axis (kernels.cu:16-129).

    Indices are generated in-graph from an iota (not baked as an O(N)
    constant — large embedded constants blow up the serialized HLO)."""
    n = 1 << lg_n
    idx = jnp.arange(n, dtype=jnp.uint32)
    rev = jnp.zeros(n, jnp.uint32)
    for b in range(lg_n):
        rev = rev | (((idx >> b) & 1) << (lg_n - 1 - b))
    return jnp.take(x, rev, axis=-1)


def ct_stages(F: BaseField, x, lg_n: int, twiddles, scale=None):
    """All lg_n CT butterfly stages; expects bit-reversed input, returns
    natural order.

    `twiddles` is either the full (.., n/2) power table [w^0..w^(n/2-1)]
    (stage tables are taken as in-graph strided slices — no per-stage
    device constants) or a pre-sliced list where entry s-1 has 2^(s-1)
    twiddles.  `scale` (optional device element broadcastable to x) is
    folded into the final stage (ct_mixed_radix_narrow.cu:156-162)."""
    n = 1 << lg_n
    lead = x.shape[:-1]      # limb planes (if any) + batch dims
    nl = 1 if F.n_limbs else 0
    extra = x.ndim - 1 - nl  # batch dims between limb planes and the domain

    def bcast(w):
        """Shape a (limb?, k) table to broadcast over batch + block axes."""
        return w.reshape(w.shape[:nl] + (1,) * extra + (1, w.shape[-1]))

    is_table = not isinstance(twiddles, (list, tuple))
    for s in range(1, lg_n + 1):
        half = 1 << (s - 1)
        nblocks = n >> s
        v = x.reshape(lead + (nblocks, 2, half))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        if is_table:
            w = twiddles[..., :: 1 << (lg_n - s)]
        else:
            w = twiddles[s - 1]
        if s == lg_n and scale is not None:
            # fold 1/N into the final stage (ct_mixed_radix_narrow.cu:156-162)
            w = F.mul(w, scale)
            lo = F.mul(lo, bcast(scale))
        # broadcast w over the block axis
        t = F.mul(hi, bcast(w))
        new_lo = F.add(lo, t)
        new_hi = F.sub(lo, t)
        x = jnp.stack([new_lo, new_hi], axis=-2).reshape(lead + (n,))
    return x


def ntt_nn(F: BaseField, x, lg_n: int, twiddles: List, scale=None):
    """Natural-in natural-out NTT."""
    return ct_stages(F, bit_reverse(x, lg_n), lg_n, twiddles, scale)
