"""MSM steady-state benchmark (criterion msm.rs analogue).

Prints one JSON line per run: curve, lg, points/s (excluding compile).
Env: SPPARK_MSM_CURVE (default pallas), SPPARK_MSM_LG (default 20),
SPPARK_MSM_REPS (default 3), SPPARK_MSM_MODE (auto/affine/xyzz).
"""

import json
import os
import random
import time

import numpy as np


def main():
    import jax
    from sppark_tpu.params import get_curve
    from sppark_tpu.msm.pippenger import MSMContext, _scalar_words_from_ints
    from sppark_tpu.oracle.ec import get_oracle, AffinePoint

    curve = os.environ.get("SPPARK_MSM_CURVE", "pallas")
    lg = int(os.environ.get("SPPARK_MSM_LG", 20))
    reps = int(os.environ.get("SPPARK_MSM_REPS", 3))
    mode = os.environ.get("SPPARK_MSM_MODE", "auto")
    n = 1 << lg
    cp = get_curve(curve)
    o = get_oracle(cp)
    rng = random.Random(42)

    # reference bench protocol: 2^11 distinct random points cloned up to n,
    # infinity planted at 3 (poc/msm-cuda/src/util.rs:13-38)
    base = [o.random_point(rng) for _ in range(1 << min(lg, 11))]
    points = [base[i % len(base)] for i in range(n)]
    if n > 3:
        points[3] = AffinePoint(0, 0, True)
    scalars = [rng.randrange(cp.scalar.modulus) for _ in range(n)]

    ctx = MSMContext(curve, n, mode=mode)
    ctx.set_points(points)
    words0 = _scalar_words_from_ints(scalars, cp.scalar.modulus, ctx.n_words)

    t0 = time.perf_counter()
    res = ctx.invoke(words0.copy())
    compile_s = time.perf_counter() - t0

    times = []
    for r in range(reps):
        w = np.asarray(words0)
        w[0] ^= np.uint32(r)  # perturb so no layer can cache the answer
        w[0] %= np.uint32(0xFFFFFFFF)
        t0 = time.perf_counter()
        ctx.invoke(w)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": f"{curve} MSM 2^{lg} points/s ({jax.default_backend()},"
                  f" mode={mode}, wbits={ctx.wbits})",
        "value": round(n / dt, 1),
        "unit": "points/s",
        "msm_s": round(dt, 3),
        "first_call_s": round(compile_s, 1),
        "check_x": str(res.x)[:12],
    }))


if __name__ == "__main__":
    main()
