"""OCFlowNet: the paper-diagram end-to-end composition
flow → warp → STE occlusion mask → scene completion.

The reference's ocflownet.py:8-23 is dead code (it imports
``mask_flow_net`` / ``warping_layer`` / ``SceneCompletionNet``, none of which
exist). This is the working equivalent wired from the real components:
a joint flow+occ net (``SimpleFlowOccNet`` by default) provides flow and the
straight-through hard mask, frame 2 is warped, the occluded region zeroed,
and an inpainting generator completes the scene.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.flow_occ_nets import SimpleFlowOccNet
from ocflow_tpu.models.inpainting_net import InpaintingNet
from ocflow_tpu.ops.warp import warp


class OCFlowNet(nn.Module):
    """Returns (flow, occ_hard, img_completed); input [B, H, W, 6]."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        img2 = x[..., 3:]
        flow, occ = SimpleFlowOccNet()(x, train)  # occ already STE-hardened
        img_warped = warp(img2, flow, align_corners=True)
        completed = InpaintingNet()(img_warped, occ, train)
        return flow, occ, completed
