"""Fused Pallas NTT kernels under the Pallas interpreter (CPU-runnable).

The reference gates kernels on GPU-less CI by compiling only (SURVEY §4);
here the interpreter actually EXECUTES the Mosaic kernel semantics (roll
butterflies, in-VMEM bit-reversal, fused middle-twiddle multiply) against
the big-int oracle without a TPU."""

import os
import random

import pytest

from sppark_tpu import params
from sppark_tpu.ff import get_jax_field
from sppark_tpu.ntt.pallas_kernels import ntt_fused, LG_TILE
from sppark_tpu.oracle import ntt as ontt

FIELDS = [params.BABY_BEAR, params.GOLDILOCKS]


@pytest.fixture(autouse=True, scope="module")
def _force_fused_interpret():
    # Set ONLY inside the fixture (i.e., while this module's tests run) —
    # env mutation at module import time would leak forced-fused mode into
    # every other module of a full-suite run (pytest imports all test
    # modules during collection, before any test executes).
    old = {k: os.environ.get(k) for k in
           ("SPPARK_FUSED", "SPPARK_PALLAS_INTERPRET")}
    os.environ["SPPARK_FUSED"] = "1"
    os.environ["SPPARK_PALLAS_INTERPRET"] = "1"
    yield
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("lg", [1, 2, 5, 9, LG_TILE + 1])
def test_fused_vs_oracle(fp, lg, rng):
    """Single-tile (lg <= LG_TILE) and four-step (lg > LG_TILE) paths."""
    F = get_jax_field(fp)
    n = 1 << lg
    ints = [rng.randrange(fp.modulus) for _ in range(n)]
    dev = F.from_int_list(ints)
    assert F.to_int_list(ntt_fused(fp.name, dev, lg)) == \
        ontt.ntt_natural(fp, ints)
    assert F.to_int_list(ntt_fused(fp.name, dev, lg, inverse=True)) == \
        ontt.intt_natural(fp, ints)


def test_fused_orders_and_coset(rng):
    """The in-VMEM R-order kernel variants (in_rev/out_rev) + the
    layout-matched coset shift, through the full facade in interpret mode."""
    from sppark_tpu import ntt as tntt

    fp = FIELDS[0]
    F = get_jax_field(fp)
    lg = 5
    n = 1 << lg
    ints = [rng.randrange(fp.modulus) for _ in range(n)]
    exp_fwd = ontt.coset_ntt(fp, ints)
    for order in tntt.InputOutputOrder:
        xin = (ontt.bit_reverse(ints, lg) if order.value[0] == "R"
               else ints)
        got = F.to_int_list(tntt.base_dev(
            fp.name, F.from_int_list(xin), lg, order=order,
            ntt_type=tntt.Type.coset))
        exp = (ontt.bit_reverse(exp_fwd, lg) if order.value[1] == "R"
               else exp_fwd)
        assert got == exp, order
        plain = F.to_int_list(tntt.base_dev(
            fp.name, F.from_int_list(xin), lg, order=order))
        assert plain == ontt.apply_order(fp, xin, lg, order.value), order


def test_fused_four_step_orders_and_coset(rng, monkeypatch):
    """The four-step branch (lg > LG_TILE) with coset + R orders — the
    OTHER branch of fused_facade_fn.run (standalone bit_reverse passes,
    natural-layout inverse coset shift).  LG_TILE is patched down so the
    branch is reachable cheaply in interpret mode (ADVICE.md item 3)."""
    from sppark_tpu import ntt as tntt
    from sppark_tpu.ntt import pallas_kernels as pk

    def _clear():
        for f in (pk._rows_kernel, pk._cols_kernel, pk._fused_fn,
                  pk.fused_facade_fn, pk._scaled_mid):
            f.cache_clear()

    monkeypatch.setattr(pk, "LG_TILE", 4)
    _clear()
    try:
        fp = FIELDS[0]
        F = get_jax_field(fp)
        lg = 6                      # four-step: lg1 = 3, lg2 = 3
        n = 1 << lg
        ints = [rng.randrange(fp.modulus) for _ in range(n)]
        exp_fwd = ontt.coset_ntt(fp, ints)
        exp_inv = ontt.coset_intt(fp, ints)
        for order in tntt.InputOutputOrder:
            xin = (ontt.bit_reverse(ints, lg) if order.value[0] == "R"
                   else ints)
            for direction, exp0 in ((tntt.Direction.forward, exp_fwd),
                                    (tntt.Direction.inverse, exp_inv)):
                got = F.to_int_list(tntt.base_dev(
                    fp.name, F.from_int_list(xin), lg, order=order,
                    direction=direction, ntt_type=tntt.Type.coset))
                exp = (ontt.bit_reverse(exp0, lg)
                       if order.value[1] == "R" else exp0)
                assert got == exp, (order, direction)
    finally:
        # drop executables traced against the patched LG_TILE so later
        # modules don't see them
        _clear()


@pytest.mark.parametrize("lg", [1, 5, 9])
def test_fused_wide_field_vs_oracle(lg, rng):
    """Wide-field (multi-limb Montgomery) fused butterflies — the role of
    ct/gs_mixed_radix_wide.cu — with the list-form mont mul inlined in the
    kernel, vs the big-int oracle.  Runs on the 4-limb test field (the
    16-limb fields' interpreted kernels take tens of minutes of XLA-CPU
    compile on CI; a 256-bit case runs at lg 5 below and the TPU bench
    exercises bls12_381_fr at 2^20)."""
    fp = params.TEST_BM64_FR
    F = get_jax_field(fp)
    n = 1 << lg
    ints = [rng.randrange(fp.modulus) for _ in range(n)]
    dev = F.from_int_list(ints)
    assert F.to_int_list(ntt_fused(fp.name, dev, lg)) == \
        ontt.ntt_natural(fp, ints)
    assert F.to_int_list(ntt_fused(fp.name, dev, lg, inverse=True)) == \
        ontt.intt_natural(fp, ints)


def test_fused_wide_256bit_small(rng):
    """One 256-bit (16-limb) interpreted case at lg 5 — the production
    field's exact kernel, kept small enough for CI."""
    fp = params.BLS12_381_FR
    F = get_jax_field(fp)
    lg, n = 5, 32
    ints = [rng.randrange(fp.modulus) for _ in range(n)]
    dev = F.from_int_list(ints)
    assert F.to_int_list(ntt_fused(fp.name, dev, lg)) == \
        ontt.ntt_natural(fp, ints)


def test_fused_recursive_six_step(rng, monkeypatch):
    """lg > LG_COL_CAP + LG_TILE takes the recursive six-step split
    (role of the reference's 3/4-way step split, ntt/ntt.cuh:118-128):
    batched column kernels + inner four-step + one transpose pass.  Caps
    are patched down so multi-level recursion is reachable in interpret
    mode (production hits this at lg 25-28)."""
    from sppark_tpu.ntt import pallas_kernels as pk

    def _clear():
        for f in (pk._rows_kernel, pk._cols_kernel, pk._fused_fn,
                  pk.fused_facade_fn, pk._scaled_mid):
            f.cache_clear()

    monkeypatch.setattr(pk, "LG_TILE", 3)
    monkeypatch.setattr(pk, "LG_COL_CAP", 2)
    _clear()
    try:
        fp = params.GOLDILOCKS
        F = get_jax_field(fp)
        for lg in (7, 9):
            n = 1 << lg
            ints = [rng.randrange(fp.modulus) for _ in range(n)]
            dev = F.from_int_list(ints)
            assert F.to_int_list(ntt_fused(fp.name, dev, lg)) == \
                ontt.ntt_natural(fp, ints), lg
            assert F.to_int_list(
                ntt_fused(fp.name, dev, lg, inverse=True)) == \
                ontt.intt_natural(fp, ints), lg
    finally:
        _clear()


def test_fused_wide_factored_mid(rng, monkeypatch):
    """Wide-field four-step with the FACTORED middle twiddles
    (T[k1, i2] = A[k1, blk] * B[k1, t], ntt/parameters.py:
    middle_twiddle_factored — the O(sqrt n) replacement for the O(n)
    matrix, role of parameters.cuh:86-145).  Caps patched down so the
    wide four-step (and, at lg 7, the recursive six-step) is reachable
    in interpret mode; inverse exercises the scale-folded A."""
    from sppark_tpu.ntt import pallas_kernels as pk

    def _clear():
        for f in (pk._rows_kernel, pk._cols_kernel, pk._fused_fn,
                  pk.fused_facade_fn, pk._scaled_mid):
            f.cache_clear()

    monkeypatch.setattr(pk, "LG_TILE_WIDE", 3)
    monkeypatch.setattr(pk, "LG_COL_CAP_WIDE", 2)
    _clear()
    try:
        fp = params.TEST_BM64_FR
        F = get_jax_field(fp)
        for lg in (5, 7):
            n = 1 << lg
            ints = [rng.randrange(fp.modulus) for _ in range(n)]
            dev = F.from_int_list(ints)
            assert F.to_int_list(ntt_fused(fp.name, dev, lg)) == \
                ontt.ntt_natural(fp, ints), lg
            assert F.to_int_list(
                ntt_fused(fp.name, dev, lg, inverse=True)) == \
                ontt.intt_natural(fp, ints), lg
    finally:
        _clear()
