"""Data layer (L4): file IO, datasets, host pipeline."""

from ocflow_tpu.data.flow_io import (
    read_flo,
    write_flo,
    read_kitti_png_flow,
    write_kitti_png_flow,
    read_pfm,
    resize_flow_np,
)
from ocflow_tpu.data.frame_io import read_gen
from ocflow_tpu.data.occlusion import (
    static_random_occlusion,
    free_form_occlusion,
    apply_occlusion,
)
from ocflow_tpu.data.datasets import (
    DATASET_REGISTRY,
    SyntheticFlow,
    SyntheticFlowWarp,
    SyntheticInpainting,
)
from ocflow_tpu.data.pipeline import (
    CacheDataset,
    DataLoader,
    DeviceCacheLoader,
    random_split,
    prefetch,
    device_iterator,
    build_dataset,
)

__all__ = [
    "read_flo",
    "write_flo",
    "read_kitti_png_flow",
    "write_kitti_png_flow",
    "read_pfm",
    "resize_flow_np",
    "read_gen",
    "static_random_occlusion",
    "free_form_occlusion",
    "apply_occlusion",
    "DATASET_REGISTRY",
    "SyntheticFlow",
    "SyntheticFlowWarp",
    "SyntheticInpainting",
    "CacheDataset",
    "DataLoader",
    "DeviceCacheLoader",
    "random_split",
    "prefetch",
    "device_iterator",
    "build_dataset",
]
