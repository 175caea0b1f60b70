"""FlowNet: PWC-variant on a shared FPN trunk (reference flow_net.py:39-131).

Coarse-to-fine over [p6..p2]: warp feat2 by ``up_flow * 20 / 2^level``
(align_corners=False), correlate (max_disp=4), per-level OpticalFlowEstimator,
ContextNetwork residual refinement, 4x bilinear output upsample (the
reference deliberately omits the x20 output scaling, flow_net.py:127-128)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.feature_pyramid import (
    ContextNetwork,
    FeaturePyramidNet,
    OpticalFlowEstimator,
)
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear
from ocflow_tpu.ops.warp import warp


class FlowNet(nn.Module):
    displacement: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        im1, im2 = x[..., :3], x[..., 3:]
        fpn = FeaturePyramidNet()
        pyr1 = fpn(im1, train)
        pyr2 = fpn(im2, train)

        flow = feat = None
        flow_up = feat_up = None
        for i, (f1, f2) in enumerate(zip(pyr1, pyr2)):
            level = 6 - i
            last = level == 2
            if i == 0:
                warped2 = f2
            else:
                warped2 = warp(f2, flow_up * (20.0 / 2.0**level), align_corners=False)
            corr = cost_volume(f1, warped2, self.displacement)
            inputs = [corr, f1]
            if i > 0:
                inputs += [flow_up, feat_up]
            xin = jnp.concatenate(inputs, axis=-1)
            est = OpticalFlowEstimator(highest_resolution=last)
            if last:
                flow, feat = est(xin)
            else:
                flow, flow_up, feat_up = est(xin)

        residual = ContextNetwork()(jnp.concatenate([feat, flow], axis=-1))
        refined = flow + residual
        h, w = refined.shape[1] * 4, refined.shape[2] * 4
        return resize_bilinear(refined, h, w, align_corners=False)
