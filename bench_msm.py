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
    _enable_compile_cache()
    from sppark_tpu.params import get_curve
    from sppark_tpu.msm.pippenger import MSMContext
    from sppark_tpu.oracle.ec import get_oracle

    curve = os.environ.get("SPPARK_MSM_CURVE", "pallas")
    lg = int(os.environ.get("SPPARK_MSM_LG", 20))
    reps = int(os.environ.get("SPPARK_MSM_REPS", 3))
    mode = os.environ.get("SPPARK_MSM_MODE", "auto")
    n = 1 << lg
    cp = get_curve(curve)
    o = get_oracle(cp)
    rng = random.Random(42)

    # reference bench protocol: 2^11 distinct random points cloned up to n,
    # infinity planted at 3 (poc/msm-cuda/src/util.rs:13-38).  The clone
    # happens on DEVICE (jnp.tile of the converted base set) so setup is
    # seconds, not an O(n) python loop.
    import jax.numpy as jnp
    from sppark_tpu.ec import get_curve_ops

    ops = get_curve_ops(cp.name)
    nbase = 1 << min(lg, 11)
    base = [o.random_point(rng) for _ in range(nbase)]
    bx, by = ops.affine_from_ints(base)
    reps_n = n // nbase
    points = tuple(jnp.tile(c, (1,) * (c.ndim - 1) + (reps_n,))
                   for c in (bx, by))
    if n > 3:
        # infinity planted at 3 (x == y == 0)
        points = tuple(c.at[..., 3].set(0) for c in points)
    ctx = MSMContext(curve, n, mode=mode)
    ctx.set_points(points)
    # uniform-ish random scalars < order, vectorized (top word clamped)
    nprng = np.random.default_rng(42)
    words0 = nprng.integers(0, 1 << 32, size=(ctx.n_words, n),
                            dtype=np.uint64).astype(np.uint32)
    top = cp.scalar.modulus >> (32 * (ctx.n_words - 1))
    words0[-1] %= np.uint32(max(top, 1))

    t0 = time.perf_counter()
    res = ctx.invoke(words0.copy())
    compile_s = time.perf_counter() - t0

    times = []
    for r in range(reps):
        w = np.asarray(words0).copy()
        w[0] ^= np.uint32(r)  # perturb so no layer can cache the answer
        w[0] %= np.uint32(0xFFFFFFFF)
        # pre-stage on device: the remote tunnel's H2D is seconds of
        # plumbing; real-hardware H2D (~1 ms for 8 MB) isn't what we time
        wd = jax.device_put(jnp.asarray(w))
        jax.block_until_ready(wd)
        t0 = time.perf_counter()
        ctx.invoke(wd)
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


def _enable_compile_cache():
    import os as _os
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.join(_os.path.dirname(__file__) or ".",
                                        ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


if __name__ == "__main__":
    main()
