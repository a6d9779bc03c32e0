"""Worker process for test_distributed.py: one of N jax.distributed
processes on the CPU backend.

Each process owns 4 virtual CPU devices; the global mesh spans all
processes, so the sharded NTT's all_to_all stages actually cross the
process boundary through the distributed runtime — the code path a
multi-host TPU pod slice runs (SURVEY §2.10 distributed comm backend row),
which single-process virtual meshes never touch.

Usage: _distributed_worker.py <coordinator> <num_procs> <pid>
Prints "WORKER_OK" on success; any mismatch asserts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from sppark_tpu.parallel import init_distributed, make_mesh, ntt_sharded
    got_procs = init_distributed(coordinator_address=coord,
                                 num_processes=nprocs, process_id=pid)
    assert got_procs == nprocs, (got_procs, nprocs)
    assert len(jax.devices()) == 4 * nprocs

    from jax.sharding import NamedSharding, PartitionSpec as P
    from sppark_tpu.parallel.mesh import AXIS
    from sppark_tpu.ff import get_jax_field
    from sppark_tpu.params import get_field
    from sppark_tpu.oracle.ntt import ntt_natural

    mesh = make_mesh()
    field = "goldilocks"
    params = get_field(field)
    F = get_jax_field(field)
    lg = 9
    n = 1 << lg
    rng = np.random.default_rng(1234)
    wire = rng.integers(0, params.modulus, size=n, dtype=np.uint64)
    planes_np = np.asarray(F.from_wire_np(wire))      # (2, n)

    sharding = NamedSharding(mesh, P(None, AXIS))
    x = jax.make_array_from_callback(planes_np.shape, sharding,
                                     lambda idx: planes_np[idx])
    y = ntt_sharded(field, x, lg, mesh)

    want = ntt_natural(params, [int(v) for v in wire])
    want_planes = np.asarray(
        F.from_wire_np(np.asarray(want, dtype=np.uint64)))
    # each process checks the shards it can address
    for shard in y.addressable_shards:
        exp = want_planes[shard.index]
        if not np.array_equal(np.asarray(shard.data), exp):
            raise AssertionError(f"shard {shard.index} mismatch on pid {pid}")
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
