"""NTT facade vs oracle + self-consistency (mirrors poc/ntt-cuda/tests/ntt.rs).

Protocols replicated from the reference tests:
  - round-trips iNTT(NTT(v)) == v in both NN and NR->RN chains (ntt.rs:9-79)
  - NN == RR-on-bitrev-data equivalence
  - differential against the oracle DFT for every NTT field (ntt.rs:89-152's
    arkworks role is played by sppark_tpu.oracle)
  - coset NTT/iNTT round-trip and LDE vs oracle
"""

import numpy as np
import pytest

from sppark_tpu import params
from sppark_tpu.ff import get_jax_field
from sppark_tpu import ntt as tntt
from sppark_tpu.oracle import ntt as ontt

# 256-bit fields go through the wide (BigMont) kernels whose XLA-CPU
# compile dominates the fast suite on a 1-core box -> marked slow; the
# CI slow job still runs all of them (poc/ntt-cuda/tests/ntt.rs:89-152
# covers the same five fields)
NTT_FIELDS = [params.BABY_BEAR, params.GOLDILOCKS] + [
    pytest.param(f, marks=pytest.mark.slow)
    for f in (params.BN254_FR, params.BLS12_381_FR, params.BLS12_377_FR,
              params.PALLAS_P, params.VESTA_Q)]
SMALL = [params.BABY_BEAR, params.GOLDILOCKS]


def rand_wire(F, fp, rng, n):
    ints = [rng.randrange(fp.modulus) for _ in range(n)]
    return ints, F.from_int_list(ints)


@pytest.mark.parametrize("fp", NTT_FIELDS, ids=lambda f: f.name)
def test_ntt_vs_oracle(fp, rng):
    F = get_jax_field(fp)
    lg = 6 if fp.bits > 64 else 10
    n = 1 << lg
    ints, dev = rand_wire(F, fp, rng, n)
    got = F.to_int_list(tntt.base_dev(fp.name, dev, lg))
    assert got == ontt.ntt_natural(fp, ints)
    got_inv = F.to_int_list(tntt.base_dev(fp.name, dev, lg,
                                          direction=tntt.Direction.inverse))
    assert got_inv == ontt.intt_natural(fp, ints)


@pytest.mark.parametrize("fp", SMALL, ids=lambda f: f.name)
def test_ntt_orders(fp, rng):
    F = get_jax_field(fp)
    lg = 8
    n = 1 << lg
    ints, dev = rand_wire(F, fp, rng, n)
    for order in tntt.InputOutputOrder:
        got = F.to_int_list(tntt.base_dev(fp.name, dev, lg, order=order))
        assert got == ontt.apply_order(fp, ints, lg, order.value), order
        gi = F.to_int_list(tntt.base_dev(fp.name, dev, lg, order=order,
                                         direction=tntt.Direction.inverse))
        assert gi == ontt.apply_order(fp, ints, lg, order.value,
                                      inverse=True), order


@pytest.mark.parametrize("fp", SMALL, ids=lambda f: f.name)
def test_roundtrips(fp, rng):
    """iNTT(NTT(v)) == v across sizes, incl. the NR -> RN no-bitrev chain."""
    F = get_jax_field(fp)
    for lg in (1, 2, 3, 7, 12):
        ints, dev = rand_wire(F, fp, rng, 1 << lg)
        fwd = tntt.base_dev(fp.name, dev, lg)
        back = tntt.base_dev(fp.name, fwd, lg, direction=tntt.Direction.inverse)
        assert F.to_int_list(back) == ints, lg
        # NR then RN round-trip avoids any bit-reversal in the reference;
        # semantics must still compose to identity
        fwd = tntt.base_dev(fp.name, dev, lg, order=tntt.InputOutputOrder.NR)
        back = tntt.base_dev(fp.name, fwd, lg, order=tntt.InputOutputOrder.RN,
                             direction=tntt.Direction.inverse)
        assert F.to_int_list(back) == ints, lg


@pytest.mark.parametrize("fp", SMALL + [pytest.param(
    params.BLS12_381_FR, marks=pytest.mark.slow)],
                         ids=lambda f: f.name)
def test_coset(fp, rng):
    F = get_jax_field(fp)
    lg = 5
    ints, dev = rand_wire(F, fp, rng, 1 << lg)
    got = F.to_int_list(tntt.base_dev(fp.name, dev, lg,
                                      ntt_type=tntt.Type.coset))
    assert got == ontt.coset_ntt(fp, ints)
    back = tntt.base_dev(fp.name, F.from_int_list(got), lg,
                         direction=tntt.Direction.inverse,
                         ntt_type=tntt.Type.coset)
    assert F.to_int_list(back) == ints


@pytest.mark.parametrize("fp", SMALL, ids=lambda f: f.name)
def test_coset_orders(fp, rng):
    """Coset NTT/iNTT honoring every InputOutputOrder: the coset shift must
    be applied in the NATURAL index domain regardless of the array layout
    (the bitrev flag threaded to LDE_powers, ntt/ntt.cuh:196-209)."""
    F = get_jax_field(fp)
    lg = 6
    ints, dev = rand_wire(F, fp, rng, 1 << lg)
    exp_fwd = ontt.coset_ntt(fp, ints)
    exp_inv = ontt.coset_intt(fp, ints)
    for order in tntt.InputOutputOrder:
        xin = (ontt.bit_reverse(ints, lg) if order.value[0] == "R"
               else ints)
        got = F.to_int_list(tntt.base_dev(
            fp.name, F.from_int_list(xin), lg, order=order,
            ntt_type=tntt.Type.coset))
        exp = (ontt.bit_reverse(exp_fwd, lg) if order.value[1] == "R"
               else exp_fwd)
        assert got == exp, ("fwd", order)
        gi = F.to_int_list(tntt.base_dev(
            fp.name, F.from_int_list(xin), lg, order=order,
            direction=tntt.Direction.inverse, ntt_type=tntt.Type.coset))
        expi = (ontt.bit_reverse(exp_inv, lg) if order.value[1] == "R"
                else exp_inv)
        assert gi == expi, ("inv", order)


@pytest.mark.parametrize("fp", SMALL, ids=lambda f: f.name)
def test_lde(fp, rng):
    F = get_jax_field(fp)
    lg, lg_blowup = 4, 2
    ints, dev = rand_wire(F, fp, rng, 1 << lg)
    got = F.to_int_list(tntt.lde_dev(fp.name, dev, lg, lg_blowup))
    assert got == ontt.lde(fp, ints, lg_blowup)
    ext, aux = tntt.lde_aux_dev(fp.name, dev, lg, lg_blowup)
    assert F.to_int_list(ext) == got
    assert F.to_int_list(aux) == ontt.intt_natural(fp, ints)


@pytest.mark.parametrize("fp", SMALL, ids=lambda f: f.name)
def test_lde_powers_expand(fp, rng):
    """LDE_powers + LDE_expand building blocks (ntt/ntt.cuh:352-366)
    composed into the full LDE: iNTT(NR) -> LDE_powers(ext domain, bitrev)
    -> LDE_expand -> NTT(RN) must equal lde()."""
    F = get_jax_field(fp)
    lg, lg_blowup = 4, 2
    n = 1 << lg
    ints, dev = rand_wire(F, fp, rng, n)
    # coefficients in bit-reversed order, no bit-reversal pass (NR)
    coeffs_br = tntt.base_dev(fp.name, dev, lg,
                              order=tntt.InputOutputOrder.NR,
                              direction=tntt.Direction.inverse)
    ext_br = tntt.lde_expand_dev(fp.name, coeffs_br, lg, lg_blowup)
    # coset shift in the extended (bit-reversed) domain
    ext_br = tntt.lde_powers_dev(fp.name, ext_br, lg + lg_blowup)
    out = tntt.base_dev(fp.name, ext_br, lg + lg_blowup,
                        order=tntt.InputOutputOrder.RN)
    assert F.to_int_list(out) == ontt.lde(fp, ints, lg_blowup)
    # lde_powers natural indexing multiplies by g^i
    g = fp.generator
    one = tntt.lde_powers_dev(fp.name, F.from_int_list([1] * n), lg,
                              bitrev=False)
    assert F.to_int_list(one) == [pow(g, i, fp.modulus) for i in range(n)]


def test_wire_roundtrip_goldilocks(rng):
    """NTT through the host wire API (NTT::Base analogue) on u64 data."""
    fp = params.GOLDILOCKS
    lg = 10
    wire = np.asarray([rng.randrange(fp.modulus) for _ in range(1 << lg)],
                      dtype=np.uint64)
    out = tntt.ntt(fp.name, wire, lg)
    back = tntt.intt(fp.name, out, lg)
    assert (back == wire).all()
    assert out.dtype == np.uint64


def test_domain_too_large():
    import pytest as _pytest
    from sppark_tpu.util.errors import SpparkError
    F = get_jax_field(params.BABY_BEAR)
    dev = F.from_int_list(list(range(4)))
    with _pytest.raises(SpparkError):
        tntt.base_dev("baby_bear", dev, 28)
