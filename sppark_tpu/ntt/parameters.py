"""Twiddle factor management (ntt/parameters.cuh analogue).

The reference lazily builds per-GPU twiddle tables (NTTParameters::all,
ntt/parameters.cuh:222-337) with windowed reconstruction to bound table size.
On TPU we cache **per-stage radix-2 twiddle tables** as device arrays, built
by log-depth doubling (log N field muls of growing vectors) — the tables are
device-resident across calls, mirroring the reference's per-GPU cache.

Memory: sum over stages of 2^(s-1) elements = N-1 total (~N field elements),
built once per (field, direction, lg_domain) and cached device-resident.
At the reference's MAX_LG_DOMAIN_SIZE = 28 (parameters.cuh:11-19) that is
~2 GiB for gl64 — acceptable in 16 GiB HBM, and the fused Pallas kernels
use windowed on-the-fly twiddle reconstruction instead (parameters.cuh:86-145
analogue) once they land.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from ..params import FieldParams, get_field
from ..ff import get_jax_field
from ..ff.base import BaseField


def powers_of(F: BaseField, base_int: int, n: int):
    """Device array [1, w, w^2, ..., w^(n-1)] built by log-depth doubling."""
    w = base_int % F.p
    t = F.from_int_list([1])          # length-1 array
    length = 1
    while length < n:
        step = pow(w, length, F.p)
        stepc = F.const(step, batch_shape=(min(length, n - length),))
        ext = F.mul(jax.lax.slice_in_dim(t, 0, min(length, n - length),
                                         axis=-1), stepc)
        t = jnp.concatenate([t, ext], axis=-1)
        length = t.shape[-1]
    return t


class NTTParameters:
    """Per-field twiddle cache (role of NTTParameters, parameters.cuh:222)."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.F = get_jax_field(params)
        self._stage_tables = {}   # (inverse, lg) -> list of per-stage arrays

    def stage_twiddles(self, lg_domain: int, inverse: bool) -> List:
        """List of lg_domain arrays; entry s-1 has 2^(s-1) twiddles
        w_{2^s}^j for the radix-2 butterfly of stage s (CT ordering)."""
        key = (inverse, lg_domain)
        if key not in self._stage_tables:
            F = self.F
            root = (self.params.inv_root_of_unity(lg_domain) if inverse
                    else self.params.root_of_unity(lg_domain))
            top = powers_of(F, root, max(1 << (lg_domain - 1), 1))
            tables = [top]
            # W_{s-1}[j] = W_s[j]^2
            for s in range(lg_domain - 1, 0, -1):
                prev = tables[-1]
                half = jax.lax.slice_in_dim(prev, 0, 1 << (s - 1), axis=-1)
                tables.append(F.sqr(half))
            tables.reverse()
            self._stage_tables[key] = [jax.device_put(t) for t in tables]
        return self._stage_tables[key]

    def domain_size_inverse(self, lg_domain: int):
        return self.params.domain_size_inverse(lg_domain)

    def coset_powers(self, lg_domain: int, inverse: bool):
        """[g^0, g^1, ... g^(N-1)] (or g^-i) for the LDE coset shift
        (partial_group_gen_powers, parameters.cuh:241-282)."""
        g = self.params.generator
        if inverse:
            g = pow(g, self.params.modulus - 2, self.params.modulus)
        return powers_of(self.F, g, 1 << lg_domain)


@functools.lru_cache(maxsize=None)
def get_parameters(field_name: str) -> NTTParameters:
    return NTTParameters(get_field(field_name))
