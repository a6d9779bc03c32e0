"""NTT facade (ntt/ntt.cuh analogue).

Public API mirrors the reference's NTT class surface (ntt/ntt.cuh:31-36,
216-361): InputOutputOrder {NN, NR, RN, RR}, Direction {forward, inverse},
Type {standard, coset}, the `base()` one-shot entry (host array in/out, the
H2D -> kernels -> D2H convenience of NTT::Base), `base_dev` for
device-resident arrays (Base_dev_ptr), and `lde` / `lde_aux`
(LDE_spread_distribute_powers + forward NTT, ntt/ntt.cuh:283-338).

Each (field, lg, order, direction, type) configuration is jit-compiled once
and cached — the analogue of the reference's per-GPU twiddle/setup caching.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import get_field, FieldParams
from ..ff import get_jax_field
from ..util.errors import SpparkError
from .parameters import get_parameters, powers_of
from .core import bit_reverse, ct_stages, bitrev_indices


class InputOutputOrder(enum.Enum):
    NN = "NN"
    NR = "NR"
    RN = "RN"
    RR = "RR"


class Direction(enum.Enum):
    forward = 0
    inverse = 1


class Type(enum.Enum):
    standard = 0
    coset = 1


def _field_name(field) -> str:
    return field.name if isinstance(field, FieldParams) else str(field)


@functools.lru_cache(maxsize=None)
def _compiled(field_name: str, lg: int, order: str, direction: int,
              ntt_type: int):
    """Build + jit the full NTT computation for one configuration.

    Twiddle/coset tables are passed as ARGUMENTS (cached device arrays from
    NTTParameters), not closures — closures would be baked into the HLO as
    O(N) constants and blow up the serialized program at large domains."""
    params = get_field(field_name)
    if lg > params.two_adicity:
        raise SpparkError(1, f"{field_name}: 2^{lg} exceeds two-adicity")
    F = get_jax_field(params)
    inverse = direction == Direction.inverse.value
    coset = ntt_type == Type.coset.value
    scale_int = params.domain_size_inverse(lg) if inverse else None

    def run(x, twiddles, shift):
        pre = order[0] == "N"    # CT stages want bit-reversed input
        post = order[1] == "R"
        if coset and not inverse:
            x = F.mul(x, shift)
        if pre:
            x = bit_reverse(x, lg)
        scale = (F.const(scale_int, batch_shape=(1,))
                 if scale_int is not None and lg > 0 else None)
        x = ct_stages(F, x, lg, twiddles, scale=scale)
        if scale_int is not None and lg == 0:
            x = F.mul(x, F.const(scale_int, batch_shape=(1,)))
        if coset and inverse:
            x = F.mul(x, shift)
        if post:
            x = bit_reverse(x, lg)
        return x

    return jax.jit(run)


def base_dev(field, x, lg_domain: int,
             order: InputOutputOrder = InputOutputOrder.NN,
             direction: Direction = Direction.forward,
             ntt_type: Type = Type.standard):
    """NTT on a device-resident array (NTT::Base_dev_ptr, ntt/ntt.cuh:344).

    Narrow fields route through the fused Pallas kernels; wide fields
    through the generic XLA stage pipeline."""
    from .pallas_kernels import (use_fused, fused_facade_fn, _fused_tables,
                                 coset_shift_bitrev)

    name = _field_name(field)
    params = get_field(name)
    if lg_domain > params.two_adicity:
        raise SpparkError(1, f"{name}: 2^{lg_domain} exceeds two-adicity")
    direction = Direction(direction)
    ntt_type = Type(ntt_type)
    order = InputOutputOrder(order)
    pm = get_parameters(name)
    inverse = direction == Direction.inverse
    coset = ntt_type == Type.coset
    fused = use_fused(name, lg_domain)
    shift = ()
    if coset:
        # the shift table must match the LAYOUT of the array it multiplies;
        # the condition lives in pallas_kernels.coset_shift_bitrev (asserted
        # against inside fused_facade_fn so the two sides can't drift)
        shift = pm.coset_powers(
            lg_domain, inverse,
            bitrev=coset_shift_bitrev(name, lg_domain, order.value, inverse))
    if fused:
        fn = fused_facade_fn(name, lg_domain, order.value, inverse, coset)
        return fn(x, _fused_tables(name, lg_domain, inverse), shift)
    fn = _compiled(name, lg_domain, order.value, direction.value,
                   ntt_type.value)
    return fn(x, pm.power_table(lg_domain, inverse), shift)


def base(field, inout: np.ndarray, lg_domain: int,
         order: InputOutputOrder = InputOutputOrder.NN,
         direction: Direction = Direction.forward,
         ntt_type: Type = Type.standard) -> np.ndarray:
    """One-shot host-array NTT (NTT::Base, ntt/ntt.cuh:216-244): upload,
    transform, download, in the field's wire format."""
    name = _field_name(field)
    F = get_jax_field(get_field(name))
    dev = F.from_wire_np(inout)
    out = base_dev(name, dev, lg_domain, order, direction, ntt_type)
    return F.to_wire_np(out)


# -- convenience wrappers mirroring poc/ntt-cuda/src/lib.rs:20-118 -----------

def ntt(field, inout, lg_domain, order=InputOutputOrder.NN):
    return base(field, inout, lg_domain, order, Direction.forward)


def intt(field, inout, lg_domain, order=InputOutputOrder.NN):
    return base(field, inout, lg_domain, order, Direction.inverse)


def coset_ntt(field, inout, lg_domain, order=InputOutputOrder.NN):
    return base(field, inout, lg_domain, order, Direction.forward, Type.coset)


def coset_intt(field, inout, lg_domain, order=InputOutputOrder.NN):
    return base(field, inout, lg_domain, order, Direction.inverse, Type.coset)


# -- LDE (ntt/ntt.cuh:283-338) -------------------------------------------------

@functools.lru_cache(maxsize=None)
def _compiled_lde(field_name: str, lg: int, lg_blowup: int, with_aux: bool):
    from .pallas_kernels import use_fused, _fused_core

    params = get_field(field_name)
    F = get_jax_field(params)
    lg_ext = lg + lg_blowup
    if lg_ext > params.two_adicity:
        raise SpparkError(1, f"{field_name}: extended domain 2^{lg_ext} "
                             f"exceeds two-adicity")
    scale_int = params.domain_size_inverse(lg)
    fused = use_fused(field_name, lg)

    def run(x, tw_inv, tw_fwd, shift):
        # 1) interpolate: iNTT (input natural, output natural)
        if lg == 0:
            coeffs = F.mul(x, F.const(scale_int, batch_shape=(1,)))
        elif fused:
            coeffs = _fused_core(field_name, x, lg, True, tw_inv)
        else:
            scale = F.const(scale_int, batch_shape=(1,))
            coeffs = ct_stages(F, bit_reverse(x, lg), lg, tw_inv,
                               scale=scale)
        # 2) zero-extend to the blown-up domain
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (1 << lg_ext) - (1 << lg))]
        ext = jnp.pad(coeffs, pad)
        # 3) coset shift + forward NTT over the extended domain
        ext = F.mul(ext, shift)
        if fused:
            out = _fused_core(field_name, ext, lg_ext, False, tw_fwd)
        else:
            out = ct_stages(F, bit_reverse(ext, lg_ext), lg_ext, tw_fwd)
        if with_aux:
            return out, coeffs
        return out

    return jax.jit(run)


def _lde_args(name: str, lg: int, lg_blowup: int):
    from .pallas_kernels import use_fused, _fused_tables

    pm = get_parameters(name)
    if use_fused(name, lg):
        return (_fused_tables(name, lg, True),
                _fused_tables(name, lg + lg_blowup, False),
                pm.coset_powers(lg + lg_blowup, False))
    return (pm.power_table(lg, True),
            pm.power_table(lg + lg_blowup, False),
            pm.coset_powers(lg + lg_blowup, False))


def lde_dev(field, x, lg_domain: int, lg_blowup: int):
    """Low-degree extension on device arrays: size-n evaluations over H ->
    size n<<blowup evaluations over the coset g*H' (NTT::LDE_aux semantics,
    without the aux copy)."""
    name = _field_name(field)
    return _compiled_lde(name, lg_domain, lg_blowup, False)(
        x, *_lde_args(name, lg_domain, lg_blowup))


def lde_aux_dev(field, x, lg_domain: int, lg_blowup: int):
    """LDE returning (extended evaluations, coefficient-domain aux copy) —
    mirrors NTT::LDE_aux's optional aux output (ntt/ntt.cuh:309-312)."""
    name = _field_name(field)
    return _compiled_lde(name, lg_domain, lg_blowup, True)(
        x, *_lde_args(name, lg_domain, lg_blowup))


def lde(field, inout: np.ndarray, lg_domain: int, lg_blowup: int) -> np.ndarray:
    name = _field_name(field)
    F = get_jax_field(get_field(name))
    return F.to_wire_np(lde_dev(name, F.from_wire_np(inout), lg_domain,
                                lg_blowup))


@functools.lru_cache(maxsize=None)
def _compiled_lde_powers(field_name: str, lg: int, bitrev: bool):
    F = get_jax_field(get_field(field_name))

    def run(x, shift):
        if bitrev:
            shift = bit_reverse(shift, lg)
        return F.mul(x, shift)

    return jax.jit(run)


def lde_powers_dev(field, x, lg_domain: int, bitrev: bool = True):
    """In-place-style coset-power multiply: x[i] * g^bitrev(i) (NTT::
    LDE_powers, ntt/ntt.cuh:352-356; kernel kernels.cu:131-153's
    distribute_powers with the bit_rev indexing of
    LDE_spread_distribute_powers:195-199)."""
    name = _field_name(field)
    pm = get_parameters(name)
    return _compiled_lde_powers(name, lg_domain, bitrev)(
        x, pm.coset_powers(lg_domain, False))


@functools.lru_cache(maxsize=None)
def _compiled_lde_expand(field_name: str, lg: int, lg_blowup: int):
    F = get_jax_field(get_field(field_name))
    n, blowup = 1 << lg, 1 << lg_blowup

    def run(x):
        # bit-reversed-layout spread: value at idx lands at idx << blowup,
        # zeros between (LDE_spread_distribute_powers with
        # perform_shift=false, ntt/kernels.cu:155-237)
        col = x[..., None]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, 0), (0, blowup - 1)]
        return jnp.pad(col, pad).reshape(x.shape[:-1] + (n * blowup,))

    return jax.jit(run)


def lde_expand_dev(field, x, lg_domain: int, lg_blowup: int):
    """Spread bit-reversed coefficients into the blown-up bit-reversed
    domain without the coset shift (NTT::LDE_expand, ntt/ntt.cuh:361-366)."""
    return _compiled_lde_expand(_field_name(field), lg_domain, lg_blowup)(x)


__all__ = [
    "InputOutputOrder", "Direction", "Type",
    "base", "base_dev", "ntt", "intt", "coset_ntt", "coset_intt",
    "lde", "lde_dev", "lde_aux_dev", "lde_powers_dev", "lde_expand_dev",
    "bit_reverse", "bitrev_indices",
]
