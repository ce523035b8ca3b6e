from rl_agents_tpu.parallel.distributed import (
    data_axes,
    make_pod_mesh,
    maybe_initialize_distributed,
)
from rl_agents_tpu.parallel.mesh import make_mesh, shard_batch

__all__ = ["make_mesh", "shard_batch", "make_pod_mesh",
           "maybe_initialize_distributed", "data_axes"]
