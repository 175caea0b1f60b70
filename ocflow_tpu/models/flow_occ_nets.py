"""Joint flow + occlusion networks (reference simple_flow_occ_net.py,
flow_occ_net_s.py, flow_occ_net_c.py, cost_volume_flow_occ_net.py,
flow_occ_net.py).

All return ``(flow [B,H,W,2], occ [B,H,W,1])`` with occlusion probabilities
in [0, 1]. The four reference files that import the missing
``cost_volume_net.CostVolumeLayer`` are repaired with a working correlation
(SURVEY.md §2.4); ``FlowOccNetCV2``'s ``fe6_0``-vs-``conv6_0`` attribute bug
(cost_volume_flow_occ_net.py:308 vs 474) is fixed by actually using the
separate flow/occ towers."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock, Deconv, PredictFlow, PredictFlowStack, ProjDown, ProjUp
from ocflow_tpu.models.feature_pyramid import (
    ContextNetwork,
    FeaturePyramidNet,
    OcclusionEstimator,
    OpticalFlowEstimator,
)
from ocflow_tpu.models.occlusion_nets import PredictOcc, PredictOccStack, _FNetSEncoder
from ocflow_tpu.models.pwc_net import SiameseEncoder
from ocflow_tpu.ops.cost_volume import normalize_features
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear


from ocflow_tpu.ops.ste import hard_threshold_ste
from ocflow_tpu.ops.warp import warp


def occlusion_gated_cost_volume(f1, warped, occ, displacement):
    """Occlusion-gated correlation: the warped frame-2 features are
    multiplied by the upsampled occlusion estimate BEFORE the cost volume
    (reference cost_volume_flow_occ_net.py:205,222,239,256). ``occ`` follows
    the reference's gating convention here — a multiplicative confidence in
    [0, 1] — which looks inverted next to the 1=occluded mask convention
    (SURVEY §7 booby-trap). Unit-tested in tests/test_models_semantics.py."""
    corr = cost_volume(f1, warped * occ, displacement)
    return nn.leaky_relu(corr, negative_slope=0.1)


class SimpleFlowOccNet(nn.Module):
    """Shared U-Net encoder, dual flow+occ heads per decoder level; final occ
    via sigmoid(10·x) + straight-through hard mask
    (reference simple_flow_occ_net.py:60-139)."""

    @nn.compact
    def __call__(self, img, train: bool = False):
        x1 = ProjDown(16, proj_ratio=1)(img, train)
        x2 = ProjDown(32, proj_ratio=2)(x1, train)
        x3 = ProjDown(64, proj_ratio=4)(x2, train)
        x4 = ProjDown(96, proj_ratio=4)(x3, train)
        x5 = ProjDown(128, proj_ratio=4)(x4, train)

        x = x5
        for skips, feats in ((x4, 96), (x3, 64), (x2, 32), (x1, 16)):
            flow_l = PredictFlowStack()(x)
            occ_l = PredictOccStack()(x)
            x = jnp.concatenate([x, flow_l, occ_l], axis=-1)
            x = ProjUp(feats)(x, skips, train)

        flow = PredictFlowStack()(x)
        occ_logit = PredictOccStack(sigmoid=False)(x)
        h, w = img.shape[1], img.shape[2]
        flow = resize_bilinear(flow, h, w, align_corners=False)
        occ_soft = nn.sigmoid(
            10.0 * resize_bilinear(occ_logit, h, w, align_corners=False)
        )
        return flow, hard_threshold_ste(occ_soft)


class FlowOccNetS(nn.Module):
    """FlowNetS skeleton with dual heads (reference flow_occ_net_s.py:10-117)."""

    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, c3, c4, c5, c6 = _FNetSEncoder(self.use_bn)(x, train)

        cat = c6
        for skip, dfeat in ((c5, 512), (c4, 256), (c3, 128), (c2, 64)):
            flow_l = PredictFlow()(cat)
            occ_l = PredictOcc()(cat)
            flow_up = Deconv(2, act=False)(flow_l)
            occ_up = Deconv(1, act=False)(occ_l)
            d = Deconv(dfeat)(cat)
            cat = jnp.concatenate([skip, d, flow_up, occ_up], axis=-1)

        flow2 = PredictFlow()(cat)
        occ2 = PredictOcc()(cat)
        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return (
            resize_bilinear(flow2, h, w, align_corners=False),
            resize_bilinear(occ2, h, w, align_corners=False),
        )


class FlowOccNetC(nn.Module):
    """FlowNetC skeleton + 441-ch correlation, dual heads
    (reference flow_occ_net_c.py:11-146, repaired)."""

    use_bn: bool = True
    displacement: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = self.use_bn
        im1, im2 = x[..., :3], x[..., 3:]
        enc1 = ConvBlock(64, kernel_size=7, stride=2, use_bn=bn)
        enc2 = ConvBlock(128, kernel_size=5, stride=2, use_bn=bn)
        enc3 = ConvBlock(256, kernel_size=5, stride=2, use_bn=bn)
        c1a, c1b = enc1(im1, train), enc1(im2, train)
        c2a, c2b = enc2(c1a, train), enc2(c1b, train)
        c3a, c3b = enc3(c2a, train), enc3(c2b, train)

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

        cat = c6
        skips = ((c5, 512), (c4, 256), (c3, 128), (c2a, 64))
        for skip, dfeat in skips:
            flow_l = PredictFlow()(cat)
            occ_l = PredictOcc()(cat)
            flow_up = Deconv(2, act=False)(flow_l)
            occ_up = Deconv(1, act=False)(occ_l)
            d = Deconv(dfeat)(cat)
            cat = jnp.concatenate([skip, d, flow_up, occ_up], axis=-1)

        flow2 = PredictFlow()(cat)
        occ2 = PredictOcc()(cat)
        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return (
            resize_bilinear(flow2, h, w, align_corners=False),
            resize_bilinear(occ2, h, w, align_corners=False),
        )


class _DenseFlowOccDecoder(nn.Module):
    """Concat-growth decoder emitting (flow, occ, features)."""

    @nn.compact
    def __call__(self, x):
        for f in (128, 128, 96, 64, 32):
            x = jnp.concatenate([ConvBlock(f)(x), x], axis=-1)
        flow = PredictFlow()(x)
        occ = PredictOcc()(x)
        return flow, occ, x


class FlowOccNetCV(nn.Module):
    """PWC-style joint net: per level predicts flow AND occ; warped features
    are gated by the upsampled occ before correlation
    (reference cost_volume_flow_occ_net.py:26-271). NB the reference does NOT
    normalize features in this variant — replicated."""

    displacement: int = 4
    warp_scales: Sequence[float] = (0.625, 1.25, 2.5, 5.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        im1, im2 = x[..., :3], x[..., 3:]
        encoder = SiameseEncoder()
        # both frames in one encoder pass (no norm layers -> identical math)
        b = x.shape[0]
        both = encoder(jnp.concatenate([im1, im2], axis=0))
        f1 = [f[:b] for f in both]
        f2 = [f[b:] for f in both]

        corr = nn.leaky_relu(
            cost_volume(f1[5], f2[5], self.displacement), negative_slope=0.1
        )
        flow, occ, feat = _DenseFlowOccDecoder()(corr)
        up_flow = Deconv(2, act=False)(flow)
        up_occ = Deconv(1, act=False)(occ)
        up_feat = Deconv(2, act=False)(feat)

        flow2 = occ2 = None
        for lvl, scale in zip((4, 3, 2, 1), self.warp_scales):
            warped = warp(f2[lvl], up_flow * scale, align_corners=False)
            corr = occlusion_gated_cost_volume(
                f1[lvl], warped, up_occ, self.displacement
            )
            xcat = jnp.concatenate([corr, f1[lvl], up_flow, up_occ, up_feat], axis=-1)
            flow, occ, feat = _DenseFlowOccDecoder()(xcat)
            if lvl > 1:
                up_flow = Deconv(2, act=False)(flow)
                up_occ = Deconv(1, act=False)(occ)
                up_feat = Deconv(2, act=False)(feat)
            else:
                flow2, occ2 = flow, occ
                flow2 = flow2 + ContextNetwork()(feat)

        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return (
            resize_bilinear(flow2, h, w, align_corners=False),
            resize_bilinear(occ2, h, w, align_corners=False),
        )


class _SeparateFlowOccDecoder(nn.Module):
    """Two independent concat-growth towers (flow / occ)."""

    @nn.compact
    def __call__(self, x):
        fx = x
        for f in (128, 128, 96, 64, 32):
            fx = jnp.concatenate([ConvBlock(f)(fx), fx], axis=-1)
        flow = PredictFlow()(fx)
        ox = x
        for f in (128, 128, 96, 64, 32):
            ox = jnp.concatenate([ConvBlock(f)(ox), ox], axis=-1)
        occ = PredictOcc()(ox)
        return flow, occ, fx


class FlowOccNetCV2(nn.Module):
    """FlowOccNetCV with separate flow/occ estimator towers per level
    (reference cost_volume_flow_occ_net.py:273-553; the reference's forward
    references never-defined ``conv6_0`` — here the separate towers are
    actually wired up)."""

    displacement: int = 4
    warp_scales: Sequence[float] = (0.625, 1.25, 2.5, 5.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        im1, im2 = x[..., :3], x[..., 3:]
        encoder = SiameseEncoder()
        # both frames in one encoder pass (no norm layers -> identical math)
        b = x.shape[0]
        both = encoder(jnp.concatenate([im1, im2], axis=0))
        f1 = [f[:b] for f in both]
        f2 = [f[b:] for f in both]

        corr = nn.leaky_relu(
            cost_volume(f1[5], f2[5], self.displacement), negative_slope=0.1
        )
        flow, occ, feat = _SeparateFlowOccDecoder()(corr)
        up_flow = Deconv(2, act=False)(flow)
        up_occ = Deconv(1, act=False)(occ)
        up_feat = Deconv(2, act=False)(feat)

        flow2 = occ2 = None
        for lvl, scale in zip((4, 3, 2, 1), self.warp_scales):
            warped = warp(f2[lvl], up_flow * scale, align_corners=False)
            corr = occlusion_gated_cost_volume(
                f1[lvl], warped, up_occ, self.displacement
            )
            xcat = jnp.concatenate([corr, f1[lvl], up_flow, up_occ, up_feat], axis=-1)
            flow, occ, feat = _SeparateFlowOccDecoder()(xcat)
            if lvl > 1:
                up_flow = Deconv(2, act=False)(flow)
                up_occ = Deconv(1, act=False)(occ)
                up_feat = Deconv(2, act=False)(feat)
            else:
                flow2, occ2 = flow, occ
                flow2 = flow2 + ContextNetwork()(feat)

        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        return (
            resize_bilinear(flow2, h, w, align_corners=False),
            resize_bilinear(occ2, h, w, align_corners=False),
        )


class FlowOccNet(nn.Module):
    """FPN trunk + per-level OcclusionEstimator (occ gates warped features
    *before* correlation) + OpticalFlowEstimator + ContextNetwork
    (reference flow_occ_net.py:69-189)."""

    displacement: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        im1, im2 = x[..., :3], x[..., 3:]
        fpn = FeaturePyramidNet()
        pyr1 = fpn(im1, train)
        pyr2 = fpn(im2, train)

        flow = feat = None
        flow_up = feat_up = None
        occ = occ_up = occ_feat_up = None
        for i, (f1, f2) in enumerate(zip(pyr1, pyr2)):
            level = 6 - i
            last = level == 2
            if i == 0:
                warped2 = f2
            else:
                warped2 = warp(f2, flow_up * (20.0 / 2.0**level), align_corners=False)

            occ_in = [f1, warped2]
            if i > 0:
                occ_in += [occ_feat_up, occ_up]
            occ_in = jnp.concatenate(occ_in, axis=-1)
            occ_est = OcclusionEstimator(highest_resolution=last)
            if last:
                occ = occ_est(occ_in)
            else:
                occ, occ_up, occ_feat_up = occ_est(occ_in)
                warped2 = warped2 * occ
            if last:
                warped2 = warped2 * occ

            corr = cost_volume(f1, warped2, self.displacement)
            flow_in = [corr, f1]
            if i > 0:
                flow_in += [flow_up, feat_up]
            flow_in = jnp.concatenate(flow_in, axis=-1)
            est = OpticalFlowEstimator(highest_resolution=last)
            if last:
                flow, feat = est(flow_in)
            else:
                flow, flow_up, feat_up = est(flow_in)

        residual = ContextNetwork()(jnp.concatenate([feat, flow], axis=-1))
        refined = flow + residual
        h, w = refined.shape[1] * 4, refined.shape[2] * 4
        return (
            resize_bilinear(refined, h, w, align_corners=False),
            resize_bilinear(occ, h, w, align_corners=False),
        )
