"""Pure-Python reference implementations ("the oracle").

The reference repo tests against arkworks / blst as independent oracles
(poc/ntt-cuda/tests/ntt.rs:89-152, poc/msm-cuda/tests/msm.rs:20-63).  Since we
build TPU-native from scratch, this package plays that role: bit-exact,
big-int based field / EC / NTT / MSM implementations with no JAX dependency.
"""

from .field import Fr, Fp2
from .ec import AffinePoint, JacobianPoint, XyzzPoint, curve_generator
from .ntt import ntt_natural, intt_natural, bit_reverse, coset_ntt, coset_intt, lde
from .msm import msm_naive, msm_pippenger

__all__ = [
    "Fr", "Fp2", "AffinePoint", "JacobianPoint", "XyzzPoint", "curve_generator",
    "ntt_natural", "intt_natural", "bit_reverse", "coset_ntt", "coset_intt",
    "lde", "msm_naive", "msm_pippenger",
]
