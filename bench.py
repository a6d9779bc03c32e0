"""Headline benchmark: Goldilocks NTT butterflies/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no numbers; the
driver-set bar is "Goldilocks NTT 2^24 within 2x of A100 sppark per chip".
sppark's Goldilocks NTT at 2^24 on A100 is estimated at ~25 ms (HBM-bound:
~lg passes over 128 MiB at ~1.5 TB/s effective), i.e. ~8.0e9 butterflies/s.
vs_baseline reports ours / 8.0e9 — so vs_baseline >= 0.5 meets the 2x bar.

Env knobs: SPPARK_BENCH_LG (default 24 on TPU, 16 elsewhere),
SPPARK_BENCH_FIELD (default goldilocks), SPPARK_BENCH_REPS (default 5).
"""

import json
import os
import time

import numpy as np

A100_BUTTERFLIES_PER_S = 8.0e9   # estimated sppark A100 gl64 NTT 2^24


def main():
    import jax
    from sppark_tpu.params import get_field
    from sppark_tpu.ff import get_jax_field
    from sppark_tpu.ntt import base_dev

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    lg = int(os.environ.get("SPPARK_BENCH_LG", 24 if on_tpu else 16))
    field = os.environ.get("SPPARK_BENCH_FIELD", "goldilocks")
    reps = int(os.environ.get("SPPARK_BENCH_REPS", 5))

    params = get_field(field)
    F = get_jax_field(field)
    n = 1 << lg
    rng = np.random.default_rng(42)
    if field == "goldilocks":
        wire = rng.integers(0, params.modulus, size=n, dtype=np.uint64)
    else:
        wire = rng.integers(0, params.modulus, size=n,
                            dtype=np.uint64).astype(np.uint32)
    x = F.from_wire_np(np.asarray(wire))
    x = jax.device_put(x)

    def fence(arr):
        """Force execution to completion: fetch one element to the host
        (block_until_ready alone does not fence remote-tunnel backends)."""
        return np.asarray(jax.device_get(
            arr[(0,) * (arr.ndim - 1) + (slice(0, 1),)]))

    # warm-up / compile
    out = base_dev(field, x, lg)
    fence(out)

    # time a dependent chain (each NTT consumes the previous result) so no
    # layer — XLA, the runtime, or a remote-execution cache — can reuse a
    # previous answer, then divide by chain length
    chain = 4
    times = []
    for _ in range(reps):
        y = out
        t0 = time.perf_counter()
        for _ in range(chain):
            y = base_dev(field, y, lg)
        fence(y)
        times.append((time.perf_counter() - t0) / chain)
        out = y
    dt = min(times)
    butterflies = (n // 2) * lg
    rate = butterflies / dt
    print(json.dumps({
        "metric": f"{field} NTT 2^{lg} butterflies/s ({backend})",
        "value": round(rate, 1),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / A100_BUTTERFLIES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
