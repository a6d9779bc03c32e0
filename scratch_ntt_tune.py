"""Scratch: sweep four-step split + transposed-write cap at lg 24 on TPU."""
import os
import sys
import time

import numpy as np

lg = int(os.environ.get("LG", 24))
lg1_force = os.environ.get("LG1")
tcap = int(os.environ.get("TCAP_MIB", 2)) << 20

import sppark_tpu.ntt.pallas_kernels as pk

if lg1_force is not None:
    v = int(lg1_force)
    pk._split_lg1 = lambda lg_, _v=v: _v

# patch the transposed-write block cap inside _apply_rows
_src_cap = 2 << 20


def _apply_rows(field_name, x, lg_, table, mul=None, out_t=False):
    F = pk.get_jax_field(field_name)
    nl = 1 if F.n_limbs else 0
    B = x.shape[nl]
    rows_pb = min(pk._pick_rows(field_name, lg_), B)
    while B % rows_pb:
        rows_pb -= 1
    if out_t and rows_pb != B and rows_pb % 128:
        planes = max(F.n_limbs, 1)
        blk_bytes = 128 * (1 << lg_) * 4 * planes
        if B % 128 == 0 and blk_bytes <= tcap:
            rows_pb = 128
        else:
            fn = pk._rows_kernel(field_name, lg_, rows_pb,
                                 with_mul=mul is not None, out_t=False)
            import jax.numpy as jnp
            return jnp.swapaxes(fn(x, table, mul), -1, -2)
    fn = pk._rows_kernel(field_name, lg_, rows_pb, with_mul=mul is not None,
                         out_t=out_t)
    return fn(x, table, mul)


pk._apply_rows = _apply_rows

import jax
from sppark_tpu.params import GOLDILOCKS
from sppark_tpu.ff import get_jax_field
from sppark_tpu.ntt.pallas_kernels import ntt_fused

F = get_jax_field("goldilocks")
n = 1 << lg
rng = np.random.default_rng(42)
wire = rng.integers(0, GOLDILOCKS.modulus, size=n, dtype=np.uint64)
x = jax.device_put(F.from_wire_np(wire))


def fence(arr):
    return np.asarray(jax.device_get(arr[(0,) * (arr.ndim - 1) + (slice(0, 1),)]))


out = ntt_fused("goldilocks", x, lg)
fence(out)
times = []
for _ in range(3):
    y = out
    t0 = time.perf_counter()
    for _ in range(4):
        y = ntt_fused("goldilocks", y, lg)
    fence(y)
    times.append((time.perf_counter() - t0) / 4)
    out = y
dt = min(times)
rate = (n // 2) * lg / dt
print(f"lg={lg} lg1={pk._split_lg1(lg)} tcap={tcap>>20}MiB: "
      f"{dt*1e3:.2f} ms  {rate/1e9:.2f}e9 bf/s", flush=True)
