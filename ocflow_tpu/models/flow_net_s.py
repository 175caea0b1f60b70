"""FlowNetS and FlowNetC (reference models/networks/flow_net_s.py:10-108,
flow_net_c.py:11-137).

FlowNetS: 6 conv levels to 1024 channels, 4 deconv levels with per-level flow
prediction, final 4x bilinear upsample of the 1/4-res flow.

FlowNetC: siamese 3-level encoder, correlation at 1/8 resolution with a
32-channel redirect conv, then the FlowNetS-style decoder. The reference's
FlowNetC is shape-broken (conv3_1 expects 473 = 32 + 441 channels but the
cost volume is called with the default max_disp=4 → 81 channels,
flow_net_c.py:25 vs :76); here the correlation uses max_disp=10 so the
advertised architecture actually runs (documented deviation, SURVEY.md §7).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock, Deconv, PredictFlow
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear


class FlowNetS(nn.Module):
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = self.use_bn
        c1 = ConvBlock(64, kernel_size=7, stride=2, use_bn=bn)(x, train)
        c2 = ConvBlock(128, kernel_size=5, stride=2, use_bn=bn)(c1, train)
        c3 = ConvBlock(256, kernel_size=5, stride=2, use_bn=bn)(c2, train)
        c3 = ConvBlock(256, use_bn=bn)(c3, train)
        c4 = ConvBlock(512, stride=2, use_bn=bn)(c3, train)
        c4 = ConvBlock(512, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, stride=2, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, stride=2, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, use_bn=bn)(c6, train)

        flow6 = PredictFlow()(c6)
        flow6_up = Deconv(2, act=False)(flow6)
        d5 = Deconv(512)(c6)

        cat5 = jnp.concatenate([c5, d5, flow6_up], axis=-1)
        flow5 = PredictFlow()(cat5)
        flow5_up = Deconv(2, act=False)(flow5)
        d4 = Deconv(256)(cat5)

        cat4 = jnp.concatenate([c4, d4, flow5_up], axis=-1)
        flow4 = PredictFlow()(cat4)
        flow4_up = Deconv(2, act=False)(flow4)
        d3 = Deconv(128)(cat4)

        cat3 = jnp.concatenate([c3, d3, flow4_up], axis=-1)
        flow3 = PredictFlow()(cat3)
        flow3_up = Deconv(2, act=False)(flow3)
        d2 = Deconv(64)(cat3)

        cat2 = jnp.concatenate([c2, d2, flow3_up], axis=-1)
        flow2 = PredictFlow()(cat2)

        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return resize_bilinear(flow2, h, w, align_corners=False)


class FlowNetC(nn.Module):
    use_bn: bool = True
    displacement: int = 10  # 441-channel correlation (see module docstring)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = self.use_bn
        im1, im2 = x[..., :3], x[..., 3:]

        enc1 = ConvBlock(64, kernel_size=7, stride=2, use_bn=bn)
        enc2 = ConvBlock(128, kernel_size=5, stride=2, use_bn=bn)
        enc3 = ConvBlock(256, kernel_size=5, stride=2, use_bn=bn)
        c1a = enc1(im1, train)
        c1b = enc1(im2, train)
        c2a = enc2(c1a, train)
        c2b = enc2(c1b, train)
        c3a = enc3(c2a, train)
        c3b = enc3(c2b, train)

        corr = nn.leaky_relu(
            cost_volume(c3a, c3b, self.displacement), negative_slope=0.1
        )
        redir = ConvBlock(32, kernel_size=1, padding=0, use_bn=bn)(c3a, train)
        c3 = ConvBlock(256, use_bn=bn)(
            jnp.concatenate([redir, corr], axis=-1), train
        )
        c4 = ConvBlock(512, stride=2, use_bn=bn)(c3, train)
        c4 = ConvBlock(512, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, stride=2, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, stride=2, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, use_bn=bn)(c6, train)

        flow6 = PredictFlow()(c6)
        flow6_up = Deconv(2, act=False)(flow6)
        d5 = Deconv(512)(c6)

        cat5 = jnp.concatenate([c5, d5, flow6_up], axis=-1)
        flow5 = PredictFlow()(cat5)
        flow5_up = Deconv(2, act=False)(flow5)
        d4 = Deconv(256)(cat5)

        cat4 = jnp.concatenate([c4, d4, flow5_up], axis=-1)
        flow4 = PredictFlow()(cat4)
        flow4_up = Deconv(2, act=False)(flow4)
        d3 = Deconv(128)(cat4)

        cat3 = jnp.concatenate([c3, d3, flow4_up], axis=-1)
        flow3 = PredictFlow()(cat3)
        flow3_up = Deconv(2, act=False)(flow3)
        d2 = Deconv(64)(cat3)

        cat2 = jnp.concatenate([c2a, d2, flow3_up], axis=-1)
        flow2 = PredictFlow()(cat2)

        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return resize_bilinear(flow2, h, w, align_corners=False)
