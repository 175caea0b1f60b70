"""SPMD parallelism: meshes, shardings, distributed init."""

from ocflow_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from ocflow_tpu.parallel.distributed import (
    initialize,
    is_main_process,
    global_mean_metrics,
    local_shard_info,
)
from ocflow_tpu.parallel.spatial import (
    halo_exchange,
    spatial_cost_volume,
    spatial_warp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "initialize",
    "is_main_process",
    "global_mean_metrics",
    "local_shard_info",
    "halo_exchange",
    "spatial_cost_volume",
    "spatial_warp",
]
