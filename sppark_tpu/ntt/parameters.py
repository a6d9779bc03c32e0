"""Twiddle factor management (ntt/parameters.cuh analogue).

The reference lazily builds per-GPU twiddle tables (NTTParameters::all,
ntt/parameters.cuh:222-337) and reconstructs arbitrary roots from windowed
partial products (get_intermediate_root, parameters.cuh:86-145).  The TPU
version uses the same windowed-reconstruction idea, but vectorized: the full
power table [w^0 .. w^(n-1)] is built in ONE fixed-shape jitted computation
as a product over bit-planes — powers[i] = prod_k (w^(2^k))^bit_k(i) — which
is lg(n) full-width multiplies and selects, all at a single shape (one XLA
compile per (field, lg)).  Per-stage radix-2 tables are then strided gathers
into that table: W_s[j] = W[j << (lg-s)].

Tables are cached device-resident per (field, direction, lg), mirroring the
reference's per-GPU cache (parameters.cuh:308-336).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FieldParams, get_field
from ..ff import get_jax_field
from ..ff.base import BaseField


def powers_of(F: BaseField, base_int: int, n: int, mul_by: int = 1):
    """Device array [c, c*w, c*w^2, ..., c*w^(n-1)] (c = mul_by), built by
    doubling concatenation: T_{2m} = [T_m, T_m * w^m].  Total work is ~n
    field muls (vs n*lg for the bit-plane product) with no selects, so the
    2^24 table builds in milliseconds instead of minutes."""
    w = base_int % F.p
    lg = max((n - 1).bit_length(), 1)
    # host: w^(2^k) as wire constants
    step_ints = [pow(w, 1 << k, F.p) for k in range(lg)]

    def build():
        acc = F.const(mul_by % F.p, batch_shape=(1,))
        for k in range(lg):
            hi = F.mul(acc, F.const(step_ints[k], batch_shape=(1,)))
            acc = jnp.concatenate([acc, hi], axis=-1)
        return acc[..., :n]

    return jax.jit(build)()


class NTTParameters:
    """Per-field twiddle cache (role of NTTParameters, parameters.cuh:222)."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.F = get_jax_field(params)
        self._power_tables = {}   # (inverse, lg) -> full power table
        self._coset_tables = {}

    def power_table(self, lg_domain: int, inverse: bool):
        """[w^0 .. w^(N/2 - 1)] for the primitive 2^lg root w."""
        key = (inverse, lg_domain)
        if key not in self._power_tables:
            root = (self.params.inv_root_of_unity(lg_domain) if inverse
                    else self.params.root_of_unity(lg_domain))
            n = max(1 << (lg_domain - 1), 1)
            self._power_tables[key] = jax.device_put(
                powers_of(self.F, root, n))
        return self._power_tables[key]

    def stage_twiddles(self, lg_domain: int, inverse: bool) -> List:
        """List of lg_domain arrays; entry s-1 has the 2^(s-1) twiddles
        w_{2^s}^j for the radix-2 CT butterfly of stage s — strided views of
        the full table."""
        top = self.power_table(lg_domain, inverse)
        tables = []
        for s in range(1, lg_domain + 1):
            stride = 1 << (lg_domain - s)
            idx = np.arange(1 << (s - 1), dtype=np.uint32) * stride
            tables.append(jnp.take(top, jnp.asarray(idx), axis=-1))
        return tables

    def staged_table(self, lg_domain: int, inverse: bool):
        """Stage-major twiddle tree of size n: position [2^(s-1) + j] holds
        stage s's j-th twiddle w^(j << (lg-s)); entry [0] is unused.  Lets
        kernels take each stage as a STATIC slice [half : 2*half] (Pallas
        cannot gather/stride arbitrarily in VMEM)."""
        key = ("staged", inverse, lg_domain)
        if key not in self._power_tables:
            top = self.power_table(lg_domain, inverse)
            parts = [jax.lax.slice_in_dim(top, 0, 1, axis=-1)]  # dummy [0]
            for s in range(1, lg_domain + 1):
                parts.append(top[..., :: 1 << (lg_domain - s)])
            self._power_tables[key] = jax.device_put(
                jnp.concatenate(parts, axis=-1))
        return self._power_tables[key]

    def staged_full_table(self, lg_domain: int, inverse: bool):
        """(.., lg, n) matrix of PER-POSITION stage twiddles:
        W[s-1, i] = w^((i mod 2^(s-1)) << (lg-s)) — each stage row is the
        stage's twiddles tiled across the domain so kernels apply them with
        plain elementwise ops (no reshapes/strided gathers, which Mosaic
        cannot lower).  Only used for row kernels (lg <= LG_TILE), so the
        n*lg footprint stays a few MiB."""
        key = ("staged_full", inverse, lg_domain)
        if key not in self._power_tables:
            top = self.power_table(lg_domain, inverse)
            n = 1 << lg_domain
            idx = np.zeros((max(lg_domain, 1), n), dtype=np.uint32)
            for s in range(1, lg_domain + 1):
                i = np.arange(n, dtype=np.uint32)
                idx[s - 1] = (i & ((1 << (s - 1)) - 1)) << (lg_domain - s)
            self._power_tables[key] = jax.device_put(
                jnp.take(top, jnp.asarray(idx), axis=-1))
        return self._power_tables[key]

    def middle_twiddle_matrix(self, lg_domain: int, inverse: bool,
                              lg1: int = 0):
        """Cached (.., N1, N2) four-step twiddle matrix T[k1, i2] =
        w^(k1*i2) for N1 = 2^lg1, N2 = 2^(lg-lg1) (lg1 defaults to the
        fused kernels' split; the layout matches the column-kernel output
        B[k1, i2] so the multiply fuses into that pass).

        Built gather-free by exponent doubling: with P_m[i2] = w^(m*i2),
        T rows [m, 2m) = T rows [0, m) * P_m and P_2m = P_m^2 — lg(N1)
        elementwise doubling steps, ~one field mul per matrix element
        total (a row gather at 2^24 took minutes through XLA's gather
        path; this builds in milliseconds)."""
        if not lg1:
            from .pallas_kernels import _split_lg1
            lg1 = _split_lg1(lg_domain, self.params.name)
        key = ("mid", inverse, lg_domain, lg1)
        if key not in self._power_tables:
            root = (self.params.inv_root_of_unity(lg_domain) if inverse
                    else self.params.root_of_unity(lg_domain))
            n2 = 1 << (lg_domain - lg1)
            F = self.F
            # only w^[0, n2) is needed — NOT the full 2^(lg-1) power table
            base = powers_of(F, root, n2)

            def build(tf):
                T = F.ones((1, n2))                    # row k1 = 0
                P = tf[..., None, :]                   # w^i2 as (.., 1, n2)
                for _ in range(lg1):
                    T = jnp.concatenate([T, F.mul(T, P)], axis=-2)
                    P = F.sqr(P)
                return T

            self._power_tables[key] = jax.jit(build)(base)
        return self._power_tables[key]

    def middle_twiddle_factored(self, lg_domain: int, inverse: bool,
                                lg1: int, block: int):
        """O(sqrt(n))-memory factorization of the four-step middle matrix
        (role of the reference's windowed reconstruction,
        parameters.cuh:86-145, which keeps tables O(WINDOW_NUM*WINDOW_SIZE)
        instead of O(n)):

            T[k1, j0 + t] = w^(k1*(j0+t)) = A[k1, j0/block] * B[k1, t]

        with A[k1, b] = w^(k1*b*block) of shape (.., N1, N2/block) and
        B[k1, t] = w^(k1*t) of shape (.., N1, block).  The column kernel
        multiplies both in-kernel (one extra mul per element) — at a
        256-bit field and lg 26 this replaces a ~4 GB device table with
        ~2 MB."""
        key = ("midf", inverse, lg_domain, lg1, block)
        if key not in self._power_tables:
            root = (self.params.inv_root_of_unity(lg_domain) if inverse
                    else self.params.root_of_unity(lg_domain))
            n2 = 1 << (lg_domain - lg1)
            assert n2 % block == 0
            F = self.F

            def rows_from(base_tf):
                # rows by exponent doubling: rows [m, 2m) = rows [0, m) * P,
                # P_{2m} = P_m^2 (same scheme as middle_twiddle_matrix)
                def build(tf):
                    T = F.ones((1, tf.shape[-1]))
                    Pv = tf[..., None, :]
                    for _ in range(lg1):
                        T = jnp.concatenate([T, F.mul(T, Pv)], axis=-2)
                        Pv = F.sqr(Pv)
                    return T
                return jax.jit(build)(base_tf)

            A = rows_from(powers_of(self.F, pow(root, block, self.params.modulus),
                                    n2 // block))
            B = rows_from(powers_of(self.F, root, block))
            self._power_tables[key] = (jax.device_put(A), jax.device_put(B))
        return self._power_tables[key]

    def domain_size_inverse(self, lg_domain: int):
        return self.params.domain_size_inverse(lg_domain)

    def coset_powers(self, lg_domain: int, inverse: bool,
                     bitrev: bool = False):
        """[g^0, g^1, ... g^(N-1)] (or g^-i) for the LDE coset shift
        (partial_group_gen_powers, parameters.cuh:241-282).

        `bitrev=True` returns the table in bit-reversed layout — the shift
        for an array whose domain axis is itself in R order (the bitrev
        flag of LDE_powers, ntt/ntt.cuh:196-209, kernels.cu:195-199)."""
        key = (inverse, lg_domain, bitrev)
        if key not in self._coset_tables:
            if bitrev:
                from .core import bit_reverse
                nat = self.coset_powers(lg_domain, inverse, bitrev=False)
                self._coset_tables[key] = jax.device_put(
                    jax.jit(functools.partial(bit_reverse,
                                              lg_n=lg_domain))(nat))
            else:
                g = self.params.generator
                if inverse:
                    g = pow(g, self.params.modulus - 2, self.params.modulus)
                self._coset_tables[key] = jax.device_put(
                    powers_of(self.F, g, 1 << lg_domain))
        return self._coset_tables[key]


@functools.lru_cache(maxsize=None)
def get_parameters(field_name: str) -> NTTParameters:
    return NTTParameters(get_field(field_name))
