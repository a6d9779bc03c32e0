"""Multi-device layer (the subsystem sppark does NOT have — SURVEY.md §2.10).

sppark's multi-GPU story is independent per-device handles addressed by
device_id (util/all_gpus.cpp:39-63); scaling across a TPU pod instead uses a
`jax.sharding.Mesh` with explicit collectives:

  * NTT    — four-step/Bailey decomposition: local column NTTs, twiddle
             multiply, `all_to_all` transpose over ICI, local row NTTs
             (the distributed analogue of the reference's 2-4-way kernel
             step split, ntt/ntt.cuh:100-158).
  * MSM    — points/scalars sharded; every device runs the full local
             Pippenger pipeline; per-window partial sums are all_gathered
             (a few KB) and tree-reduced.
"""

from .mesh import make_mesh, local_mesh, init_distributed
from .ntt import ntt_sharded, ntt_matrix_sharded
from .msm import msm_sharded

__all__ = ["make_mesh", "local_mesh", "init_distributed", "ntt_sharded", "ntt_matrix_sharded",
           "msm_sharded"]
