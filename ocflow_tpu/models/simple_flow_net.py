"""SimpleFlowNet: U-Net style flow predictor with per-level flow feedback
(reference models/networks/simple_flow_net.py:60-141).

5-level proj-bottleneck encoder (16→32→64→96→128), bilinear-upsample decoder
with skip connections; at every decoder level the flow predicted so far is
concatenated back into the features. Returns full-resolution flow [B,H,W,2].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import PredictFlowStack, ProjDown, ProjUp


class SimpleFlowNet(nn.Module):
    out_channels: int = 2

    @nn.compact
    def __call__(self, img, train: bool = False):
        x1 = ProjDown(16, proj_ratio=1)(img, train)
        x2 = ProjDown(32, proj_ratio=2)(x1, train)
        x3 = ProjDown(64, proj_ratio=4)(x2, train)
        x4 = ProjDown(96, proj_ratio=4)(x3, train)
        x5 = ProjDown(128, proj_ratio=4)(x4, train)

        flow5 = PredictFlowStack(self.out_channels)(x5)
        x = jnp.concatenate([x5, flow5], axis=-1)
        x = ProjUp(96)(x, x4, train)

        flow4 = PredictFlowStack(self.out_channels)(x)
        x = jnp.concatenate([x, flow4], axis=-1)
        x = ProjUp(64)(x, x3, train)

        flow3 = PredictFlowStack(self.out_channels)(x)
        x = jnp.concatenate([x, flow3], axis=-1)
        x = ProjUp(32)(x, x2, train)

        flow2 = PredictFlowStack(self.out_channels)(x)
        x = jnp.concatenate([x, flow2], axis=-1)
        x = ProjUp(16)(x, x1, train)

        flow1 = PredictFlowStack(self.out_channels)(x)
        x = jnp.concatenate([x, flow1], axis=-1)
        x = ProjUp(16)(x, img, train)

        return PredictFlowStack(self.out_channels)(x)
