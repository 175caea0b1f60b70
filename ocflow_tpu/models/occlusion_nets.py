"""Occlusion-mask estimation networks (reference simple_occlusion_net.py,
occlusion_net_s.py, occlusion_net_c.py).

Outputs are per-pixel occlusion probabilities in [0, 1] (sigmoid heads);
1 = occluded. ``OcclusionNetC`` uses a working max_disp=10 correlation — the
reference file is import-broken (missing ``cost_volume_net.py`` module,
occlusion_net_c.py:8); semantics recovered per SURVEY.md §2.4.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock, Deconv, ProjDown, ProjUp
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear


class PredictOccStack(nn.Module):
    """conv(32) → conv(16) → conv(1) → sigmoid
    (reference simple_occlusion_net.py:130-136)."""

    sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(32)(x)
        x = ConvBlock(16)(x)
        x = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))(x)
        return nn.sigmoid(x) if self.sigmoid else x


class PredictOcc(nn.Module):
    """Single 3x3 conv → sigmoid (reference occlusion_net_s.py:104-108)."""

    sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))(x)
        return nn.sigmoid(x) if self.sigmoid else x


class SimpleOcclusionNet(nn.Module):
    """U-Net skeleton with per-level occlusion feedback
    (reference simple_occlusion_net.py:60-139)."""

    @nn.compact
    def __call__(self, img, train: bool = False):
        x1 = ProjDown(16, proj_ratio=1)(img, train)
        x2 = ProjDown(32, proj_ratio=2)(x1, train)
        x3 = ProjDown(64, proj_ratio=4)(x2, train)
        x4 = ProjDown(96, proj_ratio=4)(x3, train)
        x5 = ProjDown(128, proj_ratio=4)(x4, train)

        occ5 = PredictOccStack()(x5)
        x = jnp.concatenate([x5, occ5], axis=-1)
        x = ProjUp(96)(x, x4, train)

        occ4 = PredictOccStack()(x)
        x = jnp.concatenate([x, occ4], axis=-1)
        x = ProjUp(64)(x, x3, train)

        occ3 = PredictOccStack()(x)
        x = jnp.concatenate([x, occ3], axis=-1)
        x = ProjUp(32)(x, x2, train)

        occ2 = PredictOccStack()(x)
        x = jnp.concatenate([x, occ2], axis=-1)
        x = ProjUp(16)(x, x1, train)

        occ1 = PredictOccStack()(x)
        x = jnp.concatenate([x, occ1], axis=-1)
        x = ProjUp(16)(x, img, train)

        return PredictOccStack()(x)


class _FNetSEncoder(nn.Module):
    """FlowNetS conv1..conv6_1 trunk (reference flow_net_s.py:15-24)."""

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
        return c2, c3, c4, c5, c6


class OcclusionNetS(nn.Module):
    """FlowNetS skeleton with sigmoid occlusion heads
    (reference occlusion_net_s.py:10-89)."""

    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, c3, c4, c5, c6 = _FNetSEncoder(self.use_bn)(x, train)

        occ6 = PredictOcc()(c6)
        occ6_up = Deconv(1, act=False)(occ6)
        d5 = Deconv(512)(c6)

        cat5 = jnp.concatenate([c5, d5, occ6_up], axis=-1)
        occ5 = PredictOcc()(cat5)
        occ5_up = Deconv(1, act=False)(occ5)
        d4 = Deconv(256)(cat5)

        cat4 = jnp.concatenate([c4, d4, occ5_up], axis=-1)
        occ4 = PredictOcc()(cat4)
        occ4_up = Deconv(1, act=False)(occ4)
        d3 = Deconv(128)(cat4)

        cat3 = jnp.concatenate([c3, d3, occ4_up], axis=-1)
        occ3 = PredictOcc()(cat3)
        occ3_up = Deconv(1, act=False)(occ3)
        d2 = Deconv(64)(cat3)

        cat2 = jnp.concatenate([c2, d2, occ3_up], axis=-1)
        occ2 = PredictOcc()(cat2)

        h, w = occ2.shape[1] * 4, occ2.shape[2] * 4
        return resize_bilinear(occ2, h, w, align_corners=False)


class OcclusionNetC(nn.Module):
    """FlowNetC-style siamese encoder + 441-ch correlation, occlusion decoder
    (reference occlusion_net_c.py:10-118, with the missing CostVolumeLayer(10)
    supplied)."""

    use_bn: bool = True
    displacement: int = 10

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
        c3 = ConvBlock(256, use_bn=bn)(jnp.concatenate([redir, corr], axis=-1), train)
        c4 = ConvBlock(512, stride=2, use_bn=bn)(c3, train)
        c4 = ConvBlock(512, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, stride=2, use_bn=bn)(c4, train)
        c5 = ConvBlock(512, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, stride=2, use_bn=bn)(c5, train)
        c6 = ConvBlock(1024, use_bn=bn)(c6, train)

        occ6 = PredictOcc()(c6)
        occ6_up = Deconv(1, act=False)(occ6)
        d5 = Deconv(512)(c6)

        cat5 = jnp.concatenate([c5, d5, occ6_up], axis=-1)
        occ5 = PredictOcc()(cat5)
        occ5_up = Deconv(1, act=False)(occ5)
        d4 = Deconv(256)(cat5)

        cat4 = jnp.concatenate([c4, d4, occ5_up], axis=-1)
        occ4 = PredictOcc()(cat4)
        occ4_up = Deconv(1, act=False)(occ4)
        d3 = Deconv(128)(cat4)

        cat3 = jnp.concatenate([c3, d3, occ4_up], axis=-1)
        occ3 = PredictOcc()(cat3)
        occ3_up = Deconv(1, act=False)(occ3)
        d2 = Deconv(64)(cat3)

        cat2 = jnp.concatenate([c2a, d2, occ3_up], axis=-1)
        occ2 = PredictOcc()(cat2)

        h, w = occ2.shape[1] * 4, occ2.shape[2] * 4
        return resize_bilinear(occ2, h, w, align_corners=False)
