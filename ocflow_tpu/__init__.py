"""OCFlow-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised optical
flow with occlusion handling and occlusion-aware image inpainting.

Re-designed from scratch for TPU hardware with the capabilities of the
dongliangcao/OCFlow reference (PyTorch-Lightning). Layout is NHWC throughout
(TPU-friendly); flow fields are ``[B, H, W, 2]`` with channel 0 = horizontal
displacement (u / x) and channel 1 = vertical displacement (v / y), matching
the reference's channel convention (reference models/flow_model.py:59-73).
"""

__version__ = "0.1.0"

from ocflow_tpu import ops, losses, models, data, train, parallel, metrics, utils  # noqa: F401
