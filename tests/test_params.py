"""Validate that derived constants reproduce the reference's wire constants.

Expected values below are the reference's published field constants
(ff/baby_bear.hpp:19, ff/mersenne31.hpp:14, ntt/parameters/*.h) — mathematical
facts re-derived here from (modulus, generator) alone.
"""

from sppark_tpu import params


def test_baby_bear_mont_constants():
    f = params.BABY_BEAR
    assert f.one_mont == 0x0FFFFFFE
    assert f.RR == 0x45DDDDE3
    assert f.m0(32) == 0x77FFFFFF
    assert f.two_adicity == 27
    # Montgomery-form roots from ntt/parameters/baby_bear.h
    assert f.to_mont(f.root_of_unity(27)) == 0x57FAB6EE
    assert f.to_mont(f.root_of_unity(1)) == 0x68000003
    assert f.to_mont(f.root_of_unity(0)) == 0x0FFFFFFE


def test_mersenne31_mont_constants():
    f = params.MERSENNE31
    assert f.one_mont == 2
    assert f.RR == 4
    assert f.m0(32) == 0x80000001


def test_goldilocks_roots():
    f = params.GOLDILOCKS
    assert f.two_adicity == 32
    assert f.root_of_unity(32) == 0x185629DCDA58878C
    assert f.root_of_unity(8) == 0xBF79143CE60CA966
    assert f.root_of_unity(1) == 0xFFFFFFFF00000000
    assert f.domain_size_inverse(1) == 0x7FFFFFFF80000001
    assert f.inv_root_of_unity(8) == 0x1D62E30FA4A4EEB0
    g2 = params.GOLDILOCKS_PLONKY2
    assert g2.root_of_unity(32) == 0x64FDD1A46201E246


def test_big_field_montgomery_generators():
    # group_gen Montgomery forms from ntt/parameters/{alt_bn128,bls12_381,
    # bls12_377,pallas,vesta}.h:11
    def limbs(x, n=4):
        return [(x >> (64 * i)) & ((1 << 64) - 1) for i in range(n)]

    f = params.BN254_FR
    assert limbs(f.to_mont(5)) == [0x1B0D0EF99FFFFFE6, 0xEABA68A3A32A913F,
                                   0x47D8EB76D8DD0689, 0x15D0085520F5BBC3]
    f = params.BLS12_381_FR
    assert limbs(f.to_mont(7)) == [0x0000000EFFFFFFF1, 0x17E363D300189C0F,
                                   0xFF9C57876F8457B0, 0x351332208FC5A8C4]
    f = params.BLS12_377_FR
    assert limbs(f.to_mont(22)) == [0x296C7FFFFFFFFED3, 0x929216656FFFFEC7,
                                    0x4C01534D92860E69, 0x0C79CFC4B9819970]
    f = params.PALLAS_P
    assert limbs(f.to_mont(5)) == [0xA1A55E68FFFFFFED, 0x74C2A54B4F4982F3,
                                   0xFFFFFFFFFFFFFFFD, 0x3FFFFFFFFFFFFFFF]
    f = params.VESTA_Q
    assert limbs(f.to_mont(5)) == [0x96BC8C8CFFFFFFED, 0x74C2A54B49F7778E,
                                   0xFFFFFFFFFFFFFFFD, 0x3FFFFFFFFFFFFFFF]


def test_ref_limb_counts():
    assert params.BABY_BEAR.n_ref_limbs == 1
    assert params.GOLDILOCKS.n_ref_limbs == 2
    assert params.BN254_FR.n_ref_limbs == 8
    assert params.BLS12_381_FR.n_ref_limbs == 8
    assert params.BLS12_381_FP.n_ref_limbs == 12
    assert params.BLS12_377_FP.n_ref_limbs == 12
    assert params.PALLAS_P.n_ref_limbs == 8


def test_mont_roundtrip():
    for f in params.FIELDS.values():
        x = 1234567890123456789 % f.modulus
        assert f.from_mont(f.to_mont(x)) == x
