"""Training system (L1): jitted step functions, train state, config, loop."""

from ocflow_tpu.train.state import TrainState, create_train_state
from ocflow_tpu.train import steps, steps_inpainting, steps_joint, steps_two_stage
from ocflow_tpu.train.config import Config, load_config, config_from_dict

__all__ = [
    "TrainState",
    "create_train_state",
    "steps",
    "steps_inpainting",
    "steps_joint",
    "steps_two_stage",
    "Config",
    "load_config",
    "config_from_dict",
]
