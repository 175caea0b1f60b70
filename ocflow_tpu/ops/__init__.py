"""Differentiable primitives (L3 of the layer map): the kernel layer."""

from ocflow_tpu.ops.warp import warp, flow_to_warp, mesh_grid
from ocflow_tpu.ops.cost_volume import cost_volume, normalize_features
from ocflow_tpu.ops.range_map import (
    compute_range_map,
    occlusion_fb_consistency,
    occlusion_from_back_flow,
)
from ocflow_tpu.ops.resize import resize_bilinear, resize_flow, upsample2x
from ocflow_tpu.ops.ste import hard_threshold_ste
from ocflow_tpu.ops.pooling import (
    max_pool_2x2,
    max_pool_2x2_with_argmax,
    max_unpool_2x2,
)

__all__ = [
    "warp",
    "flow_to_warp",
    "mesh_grid",
    "cost_volume",
    "normalize_features",
    "compute_range_map",
    "occlusion_fb_consistency",
    "occlusion_from_back_flow",
    "resize_bilinear",
    "resize_flow",
    "upsample2x",
    "hard_threshold_ste",
    "max_pool_2x2",
    "max_pool_2x2_with_argmax",
    "max_unpool_2x2",
]
