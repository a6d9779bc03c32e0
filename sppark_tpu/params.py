"""Field and curve parameter definitions for sppark-tpu.

Every constant here is *derived* from the published mathematical definition of
the field/curve (modulus, multiplicative generator, curve coefficient) and is
cross-checked by tests against the derived Montgomery forms used by the
reference wire format (see tests/test_params.py).

Reference parity notes (file:line cites into /root/reference):
  - Montgomery radix R = 2^(32 * ceil(bits/32) rounded to the reference limb
    count): the reference stores 256-bit fields in 8x32-bit limbs with
    R = 2^256 (ff/mont_t.cuh:33-36) and 384-bit fields (BLS12-381/377 fp) in
    12x32 limbs with R = 2^384.  Our 16-bit device limbs use the *same* R, so
    Montgomery wire forms match the reference bit-exactly.
  - BabyBear: mont32_t<31, 0x78000001, 0x77ffffff, 0x45dddde3, 0x0ffffffe>
    (ff/baby_bear.hpp:19); canonical generator 31 (ntt/parameters/baby_bear.h:9).
  - Mersenne-31: mont32_t<31, 0x7fffffff, 0x80000001, 4, 2> (ff/mersenne31.hpp:14).
  - Goldilocks: p = 2^64 - 2^32 + 1, NOT Montgomery (ff/gl64_t.cuh:39);
    canonical generator 7, plonky2 alternative 0xc65c18b67785d900
    (ntt/parameters/goldilocks.h:9,86).
  - NTT root tables: forward_roots_of_unity[s] = g^((p-1)/2^s); we derive them
    rather than tabulate (ntt/parameters/*.h carry the same values).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """Static description of a prime field (or the base prime of a tower)."""

    name: str
    modulus: int
    #: generator of the full multiplicative group F_p^* ("group_gen" in the
    #: reference NTT tables; also the LDE coset generator).
    generator: int
    #: True if the canonical wire format is Montgomery form (all mont_t /
    #: mont32_t fields); False for Goldilocks (raw u64, ff/gl64_t.cuh:56).
    montgomery_wire: bool = True
    #: reference limb width in bits for R = 2^(limb_bits * n_ref_limbs)
    ref_limb_bits: int = 32
    #: maximum lg2 NTT domain (ntt/parameters.cuh:11-19); 0 = no NTT support
    max_lg_domain: int = 0
    #: force a specific limb engine ("bigmont"); "" = pick by modulus shape
    #: (the role of the reference's explicit mont_t-vs-gl64_t typedef choice)
    engine: str = ""

    @property
    def bits(self) -> int:
        return self.modulus.bit_length()

    @property
    def n_ref_limbs(self) -> int:
        """Number of reference 32-bit limbs (mont_t: n=(N+31)/32, even, >=4 for
        big fields; 1 for mont32_t; 2 for gl64)."""
        if self.ref_limb_bits == 32 and self.bits <= 32:
            return 1
        n = (self.bits + 31) // 32
        if n >= 4 and n % 2:
            n += 1  # mont_t requires even n (ff/mont_t.cuh:35)
        return n

    @property
    def mont_bits(self) -> int:
        """R = 2^mont_bits."""
        return 32 * self.n_ref_limbs

    @property
    def R(self) -> int:
        return 1 << self.mont_bits

    @property
    def RR(self) -> int:
        return self.R * self.R % self.modulus

    @property
    def one_mont(self) -> int:
        return self.R % self.modulus

    @property
    def two_adicity(self) -> int:
        """s such that 2^s || (p - 1)."""
        t = self.modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        return s

    def m0(self, word_bits: int) -> int:
        """-p^-1 mod 2^word_bits (the Montgomery M0 constant)."""
        return (-pow(self.modulus, -1, 1 << word_bits)) % (1 << word_bits)

    @functools.lru_cache(maxsize=None)
    def root_of_unity(self, lg_domain: int) -> int:
        """Canonical (non-Montgomery) primitive 2^lg_domain-th root of unity:
        g^((p-1)/2^lg_domain).  Matches ntt/parameters/*.h forward tables."""
        if lg_domain > self.two_adicity:
            raise ValueError(
                f"{self.name}: lg_domain {lg_domain} > two-adicity {self.two_adicity}")
        return pow(self.generator, (self.modulus - 1) >> lg_domain, self.modulus)

    def inv_root_of_unity(self, lg_domain: int) -> int:
        return pow(self.root_of_unity(lg_domain), self.modulus - 2, self.modulus)

    def domain_size_inverse(self, lg_domain: int) -> int:
        """1 / 2^lg_domain mod p (ntt/parameters/*.h domain_size_inverse)."""
        return pow((1 << lg_domain) % self.modulus, self.modulus - 2, self.modulus)

    def to_mont(self, a: int) -> int:
        return a * self.R % self.modulus

    def from_mont(self, a: int) -> int:
        return a * pow(self.R, -1, self.modulus) % self.modulus


@dataclasses.dataclass(frozen=True)
class Fp2Params:
    """Quadratic extension F_p[u]/(u^2 - nonresidue).

    The reference represents fp2 as a warp lane pair (ff/alt_bn128-fp2.hpp:25);
    we represent it as an explicit leading coefficient axis.
    """

    name: str
    base: FieldParams
    #: u^2 = nonresidue (mod p); -1 for BN254/BLS12-381, -5 for BLS12-377.
    nonresidue: int


@dataclasses.dataclass(frozen=True)
class CurveParams:
    """Short Weierstrass curve y^2 = x^3 + a4*x + b over `field`, with scalar
    field `scalar`.  All supported curves have a4 == 0 (the reference's
    jacobian_t/xyzz_t templates allow a4 != 0 but no in-tree instantiation
    uses it)."""

    name: str
    field: FieldParams
    scalar: FieldParams
    b: int
    a4: int = 0
    #: for G2: base is an Fp2 and b has two coefficients
    fp2: Optional[Fp2Params] = None
    b_c1: int = 0  # imaginary part of b for G2 curves
    #: cofactor h = #E / r — multiplied in when sampling test points so they
    #: land in the prime-order subgroup the scalar field acts on.
    cofactor: int = 1


# ---------------------------------------------------------------------------
# Small fields
# ---------------------------------------------------------------------------

BABY_BEAR = FieldParams(
    name="baby_bear",
    modulus=0x78000001,          # 15 * 2^27 + 1
    generator=31,                # ntt/parameters/baby_bear.h:9 (canonical)
    max_lg_domain=27,
)

# RISC-Zero convention uses generator 3 (ntt/parameters/baby_bear.h:78)
BABY_BEAR_RISC0 = dataclasses.replace(BABY_BEAR, name="baby_bear_risc0", generator=3)

MERSENNE31 = FieldParams(
    name="mersenne31",
    modulus=(1 << 31) - 1,
    generator=7,                 # any generator; mrs31 has no 2-adic NTT
    # memory format is canonical; the reference's mem_t shifts <<1/>>1 into a
    # Montgomery register form on load/store (ff/mersenne31.hpp:14-39)
    montgomery_wire=False,
    max_lg_domain=0,
)

GOLDILOCKS = FieldParams(
    name="goldilocks",
    modulus=(1 << 64) - (1 << 32) + 1,
    generator=7,                 # ntt/parameters/goldilocks.h:86 (canonical)
    montgomery_wire=False,       # gl64_t is not Montgomery (ff/gl64_t.cuh:39)
    max_lg_domain=32,
)

GOLDILOCKS_PLONKY2 = dataclasses.replace(
    GOLDILOCKS, name="goldilocks_plonky2", generator=0xC65C18B67785D900)

# ---------------------------------------------------------------------------
# 256-bit scalar fields (fr) and base fields (fp)
# ---------------------------------------------------------------------------

BN254_FR = FieldParams(
    name="bn254_fr",
    modulus=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=5,                 # verified against ntt/parameters/alt_bn128.h:11
    max_lg_domain=28,
)

BN254_FP = FieldParams(
    name="bn254_fp",
    modulus=21888242871839275222246405745257275088696311157297823662689037894645226208583,
    generator=3,
)

BLS12_381_FR = FieldParams(
    name="bls12_381_fr",
    modulus=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    generator=7,                 # verified against ntt/parameters/bls12_381.h:11
    max_lg_domain=28,
)

BLS12_381_FP = FieldParams(
    name="bls12_381_fp",
    modulus=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    generator=2,
)

BLS12_377_FR = FieldParams(
    name="bls12_377_fr",
    modulus=0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    generator=22,                # verified against ntt/parameters/bls12_377.h:11
    max_lg_domain=28,            # field supports 47; reference caps domains at 28
)

BLS12_377_FP = FieldParams(
    name="bls12_377_fp",
    modulus=0x1AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
    generator=15,
)

PALLAS_P = FieldParams(
    # Base field of the Pallas curve == scalar field of Vesta ("pallas_t")
    name="pallas",
    modulus=0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
    generator=5,                 # verified against ntt/parameters/pallas.h:11
    max_lg_domain=28,
)

VESTA_Q = FieldParams(
    # Base field of the Vesta curve == scalar field of Pallas ("vesta_t")
    name="vesta",
    modulus=0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
    generator=5,                 # verified against ntt/parameters/vesta.h:11
    max_lg_domain=28,
)

# ---------------------------------------------------------------------------
# Quadratic extensions (G2 base fields)
# ---------------------------------------------------------------------------

BN254_FP2 = Fp2Params("bn254_fp2", BN254_FP, BN254_FP.modulus - 1)          # u^2 = -1
BLS12_381_FP2 = Fp2Params("bls12_381_fp2", BLS12_381_FP, BLS12_381_FP.modulus - 1)
BLS12_377_FP2 = Fp2Params("bls12_377_fp2", BLS12_377_FP, BLS12_377_FP.modulus - 5)  # u^2 = -5

# ---------------------------------------------------------------------------
# Curves
# ---------------------------------------------------------------------------

BN254_G1 = CurveParams("bn254", BN254_FP, BN254_FR, b=3)  # prime order, h=1
BLS12_381_G1 = CurveParams("bls12_381", BLS12_381_FP, BLS12_381_FR, b=4,
                           cofactor=0x396C8C005555E1568C00AAAB0000AAAB)
BLS12_377_G1 = CurveParams("bls12_377", BLS12_377_FP, BLS12_377_FR, b=1,
                           cofactor=0x170B5D44300000000000000000000000)
PALLAS_G1 = CurveParams("pallas", PALLAS_P, VESTA_Q, b=5)   # h=1
VESTA_G1 = CurveParams("vesta", VESTA_Q, PALLAS_P, b=5)     # h=1

# Toy curve over the BabyBear field: NOT a cryptographic group (its order is
# not validated) — exists so sharding/compile dry-runs (driver dryrun,
# CPU-mesh CI) can exercise the full MSM pipeline with single-u32 field ops
# instead of minutes-long 256-bit graph compiles.  Never use for correctness
# tests of group arithmetic.
TOY_BB31_G1 = CurveParams("toy_bb31", BABY_BEAR, BABY_BEAR, b=1)

# Genuine small test curve: y^2 = x^3 + 10x + 2 over the Goldilocks field.
# #E = 18446744061260817534 = 2 * 3^2 * r with prime
# r = 1024819114514489863 (60 bits); the subgroup of order r (cofactor 18)
# is a real prime-order group with cheap (2-word) field arithmetic and
# 2-word scalars — MSM/EC structure tests run against the oracle in seconds
# where a 256-bit curve needs minutes of XLA compile.  Order found by
# BSGS over the Hasse interval + Pollard rho (not a standard curve).
TEST_GL64_FR = FieldParams(
    name="test_gl64_fr",
    modulus=1024819114514489863,
    generator=3,                 # arbitrary; no NTT use (two-adicity is 1)
    montgomery_wire=False,
)
TEST_GL64_G1 = CurveParams("test_gl64", GOLDILOCKS, TEST_GL64_FR,
                           b=2, a4=10, cofactor=18)

# G2-analog test curve: y^2 = x^3 + 2 over GF(p^2) for the Goldilocks p,
# GF(p^2) = F_p[u]/(u^2 - 7) (7 is a nonresidue mod p).  The j = 0 curve's
# trace over F_p is t = 2^32 + 1 (from 4p = L^2 + 27 M^2, L = 2^32+1,
# M = (2^32-1)/3, Deuring), so #E(F_p) = N = p + 1 - t and
# #E(F_p^2) = N * (p + 1 + t) with p + 1 + t = 467443687 * 39463029637.
# The prime-order-39463029637 subgroup (~35-bit scalars) has genuinely
# quadratic coordinates — it exercises the full fp2 MSM/EC machinery
# (ff/alt_bn128-fp2.hpp's warp-pair role) at gl64 compile cost.
GOLDILOCKS_FP2 = Fp2Params("goldilocks_fp2", GOLDILOCKS, 7)
TEST_GL64_G2_FR = FieldParams(
    name="test_gl64_g2_fr",
    modulus=39463029637,
    generator=2,                 # arbitrary; no NTT use
    montgomery_wire=False,
)
TEST_GL64_G2 = CurveParams(
    "test_gl64_g2", GOLDILOCKS, TEST_GL64_G2_FR, b=2, fp2=GOLDILOCKS_FP2,
    cofactor=18446744065119617025 * 467443687)


# Small big-Montgomery test curve: y^2 = x^3 + 3 over the largest 64-bit
# prime 2^64 - 59 (L = 4 sixteen-bit limb planes through BigMontField).
# It exists so the fused Pallas EC kernels (ec/pallas_ops.py) execute
# under the Pallas interpreter on GPU-less CI in seconds, where the
# 256-bit curves' interpreted kernels take tens of minutes of XLA-CPU
# compile.  p = 2 mod 3 makes the curve supersingular, so #E = p + 1 =
# 2 * 3 * 7 * 439208192231179799 exactly; the 59-bit prime subgroup is
# the scalar group (verified by ell * P = O for random cofactor-cleared
# P, tests/test_params.py) — MSM's signed-digit fold (order - s, negate)
# needs the TRUE subgroup order, so a placeholder order is not an option.
TEST_BM64_FP = FieldParams(name="test_bm64_fp", modulus=(1 << 64) - 59,
                           generator=2)
TEST_BM64_FR_SCALAR = FieldParams(
    name="test_bm64_fr_scalar",
    modulus=439208192231179799,
    generator=3,                 # arbitrary; no NTT use
    montgomery_wire=False,
)
TEST_BM64_G1 = CurveParams("test_bm64", TEST_BM64_FP, TEST_BM64_FR_SCALAR,
                           b=3, cofactor=42)

# NTT-capable small big-Montgomery test field: 63-bit prime with
# 2-adicity 32 (p = 0x7FFFFFF9 * 2^32 + 1), L = 4 limb planes — lets
# the wide-field fused NTT kernels run under the Pallas interpreter
# on CI at a quarter of the 256-bit fields' graph size.
TEST_BM64_FR = FieldParams(name="test_bm64_fr",
                           modulus=0x7FFFFFF900000001,  # 0x7FFFFFF9*2^32+1
                           generator=3, max_lg_domain=20)

# BigMont-fp2 G2 test curve: the SAME group as TEST_GL64_G2 (same j = 0
# curve over the Goldilocks prime, same Deuring point count) but with the
# base field forced through the BigMontField engine (4 sixteen-bit limb
# planes, Montgomery wire) — so the fused fp2 EC kernels
# (ec/pallas_ops.py _KCtx degree-2 paths) execute under the Pallas
# interpreter on CI at 64-bit compile cost, standing in for
# BLS12-381/BN254/BLS12-377 G2 exactly as TEST_BM64_G1 stands in for their
# G1 (ff/alt_bn128-fp2.hpp:25-160, poc/msm-cuda/src/lib.rs:84).
GOLDILOCKS_BM = FieldParams(name="goldilocks_bm",
                            modulus=(1 << 64) - (1 << 32) + 1,
                            generator=7, engine="bigmont")
TEST_BM64_FP2 = Fp2Params("test_bm64_fp2", GOLDILOCKS_BM, 7)
TEST_BM64_G2 = CurveParams(
    "test_bm64_g2", GOLDILOCKS_BM, TEST_GL64_G2_FR, b=2, fp2=TEST_BM64_FP2,
    cofactor=18446744065119617025 * 467443687)


# G2 curves: b in Fp2.
_381_b2 = 4
BLS12_381_G2 = CurveParams(
    "bls12_381_g2", BLS12_381_FP, BLS12_381_FR,
    b=_381_b2, b_c1=_381_b2, fp2=BLS12_381_FP2,
    cofactor=0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5)
# BN254 G2: b2 = 3 / (9 + u)
_bn_p = BN254_FP.modulus
_bn_denom_norm = pow(9 * 9 + 1, -1, _bn_p)  # 1/(81 - nonresidue) with nr=-1
_bn_b2_c0 = 3 * 9 * _bn_denom_norm % _bn_p
_bn_b2_c1 = (-3) * _bn_denom_norm % _bn_p
BN254_G2 = CurveParams(
    "bn254_g2", BN254_FP, BN254_FR,
    b=_bn_b2_c0, b_c1=_bn_b2_c1, fp2=BN254_FP2,
    cofactor=21888242871839275222246405745257275088844257914179612981679871602714643921549)
# BLS12-377 G2: b2 = 1 / u  (i.e. 0 + (1/nonresidue) * u... canonical value)
_377_p = BLS12_377_FP.modulus
_377_b2_c1 = 155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906 % _377_p
BLS12_377_G2 = CurveParams(
    "bls12_377_g2", BLS12_377_FP, BLS12_377_FR,
    b=0, b_c1=_377_b2_c1, fp2=BLS12_377_FP2,
    cofactor=0x26BA558AE9562ADDD88D99A6F6A829FBB36B00E1DCC40C8C505634FAE2E189D693E8C36676BD09A0F3622FBA094800452217CC900000000000000000000001)


FIELDS = {
    f.name: f
    for f in [
        BABY_BEAR, BABY_BEAR_RISC0, MERSENNE31, GOLDILOCKS, GOLDILOCKS_PLONKY2,
        BN254_FR, BN254_FP, BLS12_381_FR, BLS12_381_FP, BLS12_377_FR,
        BLS12_377_FP, PALLAS_P, VESTA_Q, TEST_BM64_FP, TEST_BM64_FR,
        GOLDILOCKS_BM,
    ]
}

CURVES = {
    c.name: c
    for c in [BN254_G1, BLS12_381_G1, BLS12_377_G1, PALLAS_G1, VESTA_G1,
              BLS12_381_G2, BN254_G2, BLS12_377_G2, TOY_BB31_G1,
              TEST_GL64_G1, TEST_GL64_G2, TEST_BM64_G1, TEST_BM64_G2]
}


def get_field(name: str) -> FieldParams:
    try:
        return FIELDS[name]
    except KeyError:
        raise KeyError(f"unknown field {name!r}; available: {sorted(FIELDS)}")


def get_curve(name: str) -> CurveParams:
    try:
        return CURVES[name]
    except KeyError:
        raise KeyError(f"unknown curve {name!r}; available: {sorted(CURVES)}")
