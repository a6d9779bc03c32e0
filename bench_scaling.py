"""Scaling-efficiency harness (BASELINE config 5 measurement artifact).

Measures sharded NTT and MSM throughput at D ∈ {1, 2, 4, 8} devices and
reports ops/s + parallel efficiency vs D=1.  On a machine without a
multi-chip slice it runs on the virtual CPU mesh (the same shard_map code
path the driver dry-runs); on a pod slice, run one process per host after
`sppark_tpu.parallel.init_distributed()` and the same harness measures the
real ICI/DCN collectives.

Prints one JSON line:
  {"metric": "scaling", "ntt": {"1": ops, ...}, "msm": {...},
   "ntt_efficiency_8": e, "msm_efficiency_8": e}

Env: SPPARK_SCALE_LG (default 14), SPPARK_SCALE_MSM_LG (default 10),
SPPARK_SCALE_DEVICES (default "1,2,4,8"), SPPARK_SCALE_REPS (default 3).
"""

import json
import os
import time

import numpy as np


def _backend_started() -> bool:
    import jax
    from jax._src import xla_bridge
    return xla_bridge.backends_are_initialized()


def main():
    import jax

    # force the CPU mesh BEFORE any computation: this image pre-imports
    # jax on the TPU platform, so env vars alone are too late
    want = max(int(d) for d in os.environ.get(
        "SPPARK_SCALE_DEVICES", "1,2,4,8").split(","))
    if len(jax.devices()) < want if _backend_started() else True:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", want)
        except RuntimeError:
            pass

    import jax.numpy as jnp
    from sppark_tpu.parallel import make_mesh
    from sppark_tpu.parallel.ntt import ntt_sharded
    from sppark_tpu.parallel.msm import msm_sharded
    from sppark_tpu.params import get_field, get_curve
    from sppark_tpu.ff import get_jax_field
    from sppark_tpu.oracle.ec import get_oracle

    lg = int(os.environ.get("SPPARK_SCALE_LG", 14))
    mlg = int(os.environ.get("SPPARK_SCALE_MSM_LG", 10))
    reps = int(os.environ.get("SPPARK_SCALE_REPS", 3))
    dev_counts = [int(d) for d in
                  os.environ.get("SPPARK_SCALE_DEVICES", "1,2,4,8").split(",")]
    dev_counts = [d for d in dev_counts if d <= len(jax.devices())]

    import random
    rng = random.Random(99)
    field = "goldilocks"
    params = get_field(field)
    F = get_jax_field(field)
    n = 1 << lg
    npr = np.random.default_rng(3)
    x = F.from_wire_np(npr.integers(0, params.modulus, size=n,
                                    dtype=np.uint64))

    curve = get_curve("test_gl64")
    o = get_oracle(curve)
    from sppark_tpu.ec import get_curve_ops
    ops = get_curve_ops("test_gl64")
    nbase = 64
    base = [o.random_point(rng) for _ in range(nbase)]
    bx, by = ops.affine_from_ints(base)
    mn = 1 << mlg
    points = tuple(jnp.tile(c, (1,) * (c.ndim - 1) + (mn // nbase,))
                   for c in (bx, by))
    swords = npr.integers(0, 1 << 32, size=(2, mn),
                          dtype=np.uint64).astype(np.uint32)
    swords[-1] %= np.uint32(curve.scalar.modulus >> 32)

    def fence(v):
        leaf = jax.tree.leaves(v)[0]
        return np.asarray(jax.device_get(leaf.ravel()[:1]))

    ntt_r, msm_r = {}, {}
    for D in dev_counts:
        mesh = make_mesh(jax.devices()[:D])
        # NTT
        out = ntt_sharded(field, x, lg, mesh)      # compile
        fence(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = ntt_sharded(field, out, lg, mesh)
        fence(out)
        dt = (time.perf_counter() - t0) / reps
        ntt_r[str(D)] = round(n * lg / 2 / dt, 1)   # butterflies/s
        # MSM
        msm_sharded("test_gl64", points, swords, mesh)  # compile+run
        t0 = time.perf_counter()
        for _ in range(reps):
            msm_sharded("test_gl64", points, swords, mesh)
        dt = (time.perf_counter() - t0) / reps
        msm_r[str(D)] = round(mn / dt, 1)

    def eff(r):
        ds = sorted(int(d) for d in r)
        if len(ds) < 2:
            return None
        d0, dN = ds[0], ds[-1]
        return round(r[str(dN)] / (r[str(d0)] * dN / d0), 4)

    print(json.dumps({
        "metric": f"scaling gl64 NTT 2^{lg} + test_gl64 MSM 2^{mlg} "
                  f"({jax.default_backend()})",
        "ntt_butterflies_per_s": ntt_r,
        "msm_points_per_s": msm_r,
        "ntt_efficiency": eff(ntt_r),
        "msm_efficiency": eff(msm_r),
        "devices": dev_counts,
    }))


if __name__ == "__main__":
    main()
