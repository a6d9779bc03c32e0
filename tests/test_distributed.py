"""Real multi-process jax.distributed test (SURVEY §2.10 "distributed comm
backend" row).

Two OS processes, a localhost coordinator, 4 virtual CPU devices each: the
sharded NTT runs over the 8-device GLOBAL mesh, so its all_to_all stages
cross the process boundary through the distributed runtime — the actual
code path of a multi-host TPU pod (virtual single-process meshes, which
every other test uses, never initialize jax.distributed at all).

Marked slow: two fresh interpreters compile the four-step pipeline
independently on the 1-core CI box.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_ntt():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__),
                          "_distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
        assert "WORKER_OK" in out, f"worker incomplete:\n{out[-2000:]}"
