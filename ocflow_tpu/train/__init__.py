"""Training system (L1): jitted step functions, train state, config, loop."""

from ocflow_tpu.train.state import TrainState, create_train_state
from ocflow_tpu.train import steps

__all__ = ["TrainState", "create_train_state", "steps"]
