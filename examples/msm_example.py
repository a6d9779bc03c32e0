"""poc/msm-cuda analogue: multi_scalar_mult over a chosen curve
(poc/msm-cuda/src/lib.rs:18-84), with the reference's planted edge cases
(infinity at index 3, replicated base set — src/util.rs:13-38).

Run: python examples/msm_example.py [curve] [lg_npoints]
"""

import random
import sys
import time

from sppark_tpu.params import get_curve
from sppark_tpu.msm import mult_pippenger, MSMContext
from sppark_tpu.ffi import cpu_msm, cpu_available
from sppark_tpu.oracle.ec import get_oracle, AffinePoint


def main():
    curve = sys.argv[1] if len(sys.argv) > 1 else "test_gl64"
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = 1 << lg
    cp = get_curve(curve)
    o = get_oracle(cp)
    rng = random.Random(42)

    base = [o.random_point(rng) for _ in range(1 << min(lg, 11))]
    points = [base[i % len(base)] for i in range(n)]
    if n > 3:
        points[3] = AffinePoint(0, 0, True)
    scalars = [rng.randrange(cp.scalar.modulus) for _ in range(n)]

    t0 = time.time()
    res = mult_pippenger(curve, points, scalars)
    print(f"device MSM({curve}, 2^{lg}) = ({res.x}, {res.y}) "
          f"[{time.time()-t0:.2f}s incl. compile]")

    if cpu_available() and cp.fp2 is None and not cp.a4:
        t0 = time.time()
        host = cpu_msm(curve, points, scalars)
        assert (host.x, host.y, host.inf) == (res.x, res.y, res.inf)
        print(f"native CPU MSM agrees [{time.time()-t0:.2f}s]")


if __name__ == "__main__":
    main()
