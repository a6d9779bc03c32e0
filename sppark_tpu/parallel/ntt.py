"""Mesh-sharded NTT via the four-step (Bailey) decomposition.

N = N1*N2 viewed as a row-major (N1, N2) matrix A[i1][i2]:

  1. size-N1 NTT of every column          (local once column-sharded)
  2. twiddle multiply by w^(i2*k1)        (local; sharded twiddle matrix)
  3. all_to_all transpose col->row shards (the ICI exchange)
  4. size-N2 NTT of every row             (local)

giving D[k1][k2] = X[k1 + N1*k2].  This is exactly the reference's staged
kernel split (ntt/ntt.cuh:100-158 splits lg>10 domains into 2-4 passes with
implicit transposes through device memory) lifted to a device mesh: the
"pass through HBM between kernels" becomes an all_to_all over the mesh axis.

Orderings: `ntt_matrix_sharded` keeps the data in its natural sharded matrix
layout (column-sharded in, row-sharded out, one all_to_all) — the composable
form.  `ntt_sharded` is flat-natural in/out (three all_to_alls).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..params import get_field, FieldParams
from ..ff import get_jax_field
from ..ntt.core import bit_reverse, ct_stages
from ..ntt.parameters import get_parameters, powers_of
from .mesh import AXIS


def _split(lg_n: int):
    lg1 = lg_n // 2
    return lg1, lg_n - lg1


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(field_name: str, lg_n: int, inverse: bool):
    """Full (N1, N2) matrix T[k1, i2] = w^(k1*i2) as exponent-gather into the
    1-D power table (windowed-reconstruction analogue, parameters.cuh:86-145;
    the product k1*i2 mod 2^lg_n is just u32 wraparound + mask)."""
    params = get_field(field_name)
    F = get_jax_field(field_name)
    lg1, lg2 = _split(lg_n)
    n = 1 << lg_n
    root = (params.inv_root_of_unity(lg_n) if inverse
            else params.root_of_unity(lg_n))
    table = powers_of(F, root, n)                       # (.., n)
    k1 = jnp.arange(1 << lg1, dtype=jnp.uint32)
    i2 = jnp.arange(1 << lg2, dtype=jnp.uint32)
    idx = (k1[:, None] * i2[None, :]) & np.uint32(n - 1)
    return jnp.take(table, idx, axis=-1)                # (.., N1, N2)


def _local_ntt_last(F, x, lg: int, twiddles):
    """Natural-order NTT along the last axis."""
    return ct_stages(F, bit_reverse(x, lg), lg, twiddles)


@functools.lru_cache(maxsize=None)
def _matrix_fn(field_name: str, lg_n: int, inverse: bool, mesh_key,
               flat: bool):
    """Build + jit the sharded four-step NTT for one (field, lg, mesh)."""
    mesh = _MESHES[mesh_key]
    params = get_field(field_name)
    F = get_jax_field(field_name)
    pm = get_parameters(field_name)
    lg1, lg2 = _split(lg_n)
    tw1 = pm.power_table(lg1, inverse)
    tw2 = pm.power_table(lg2, inverse)
    scale_int = params.domain_size_inverse(lg_n) if inverse else None
    lead = (F.n_limbs,) if F.n_limbs else ()
    nl = len(lead)

    def body(a, tw):
        # a: local (.., N1, N2/D) column shard of the (N1, N2) matrix
        # 1) column NTTs: along axis -2 -> transpose to last
        b = jnp.swapaxes(a, -1, -2)
        b = _local_ntt_last(F, b, lg1, tw1)
        b = jnp.swapaxes(b, -1, -2)
        # 2) twiddle multiply (tw is the matching column shard of T)
        c = F.mul(b, tw)
        # 3) transpose shards: (N1, N2/D) -> (N1/D, N2)
        d = jax.lax.all_to_all(c, AXIS, split_axis=nl, concat_axis=nl + 1,
                               tiled=True)
        # 4) row NTTs (last axis is complete)
        e = _local_ntt_last(F, d, lg2, tw2)
        if scale_int is not None:
            e = F.mul(e, F.const(scale_int, batch_shape=(1,)))
        return e

    spec_col = P(*([None] * nl + [None, AXIS]))
    spec_row = P(*([None] * nl + [AXIS, None]))

    if not flat:
        fn = shard_map(body, mesh=mesh, in_specs=(spec_col, spec_col),
                       out_specs=spec_row)
        return jax.jit(fn)

    def flat_body(x, tw):
        # x: local flat shard = rows block of (N1, N2) -> (N1/D, N2)
        n2 = 1 << lg2
        a = x.reshape(x.shape[:-1] + (-1, n2))
        # row shards -> column shards
        a = jax.lax.all_to_all(a, AXIS, split_axis=nl + 1, concat_axis=nl,
                               tiled=True)
        e = body(a, tw)                                  # (N1/D, N2)
        # D[k1,k2] = X[k1 + N1 k2]; natural flat = (N2, N1) row-major = D^T
        # local transpose gives D^T column-sharded; a final all_to_all makes
        # it row-sharded = flat natural block shards
        t = jnp.swapaxes(e, -1, -2)                      # (N2, N1/D)
        t = jax.lax.all_to_all(t, AXIS, split_axis=nl, concat_axis=nl + 1,
                               tiled=True)               # (N2/D, N1)
        return t.reshape(t.shape[:-2] + (-1,))

    fn = shard_map(flat_body, mesh=mesh, in_specs=(P(*([None] * nl + [AXIS])),
                                                   spec_col),
                   out_specs=P(*([None] * nl + [AXIS])))
    return jax.jit(fn)


# mesh objects aren't hashable keys across recreations; register by id
_MESHES = {}


def _mesh_key(mesh: Mesh):
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    _MESHES[key] = mesh
    return key


def ntt_matrix_sharded(field, a, lg_n: int, mesh: Mesh,
                       inverse: bool = False):
    """Four-step NTT keeping matrix layout: input is the (N1, N2) row-major
    view of the natural-order vector, column-sharded over the mesh; output
    is D[k1, k2] = X[k1 + N1*k2], row-sharded."""
    name = field.name if isinstance(field, FieldParams) else str(field)
    fn = _matrix_fn(name, lg_n, inverse, _mesh_key(mesh), False)
    tw = _twiddle_matrix(name, lg_n, inverse)
    return fn(a, tw)


def ntt_sharded(field, x, lg_n: int, mesh: Mesh, inverse: bool = False):
    """Flat natural-order in/out sharded NTT (three all_to_alls)."""
    name = field.name if isinstance(field, FieldParams) else str(field)
    fn = _matrix_fn(name, lg_n, inverse, _mesh_key(mesh), True)
    tw = _twiddle_matrix(name, lg_n, inverse)
    return fn(x, tw)
