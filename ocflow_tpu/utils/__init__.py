"""Utilities: visualization, checkpointing, profiling, logging."""

from ocflow_tpu.utils.viz import (
    flow_to_image,
    compute_color,
    make_color_wheel,
    denormalize_image,
)
from ocflow_tpu.utils.checkpoint import (
    CheckpointManager,
    save_pytree,
    load_pytree,
    load_subtree,
)
from ocflow_tpu.utils.profiling import (
    StepTimer,
    enable_compilation_cache,
    trace,
    annotate,
)

__all__ = [
    "flow_to_image",
    "compute_color",
    "make_color_wheel",
    "denormalize_image",
    "CheckpointManager",
    "save_pytree",
    "load_pytree",
    "load_subtree",
    "StepTimer",
    "enable_compilation_cache",
    "trace",
    "annotate",
]
