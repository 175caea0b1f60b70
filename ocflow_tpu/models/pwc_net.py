"""PWC-style cost-volume flow networks — the flagship model family.

``FlowNetCV`` re-implements the reference's primary model
(models/networks/cost_volume_flow_net.py:22-246, config key ``model: pwc``):
6-level siamese feature pyramid (16/32/64/96/128/196), per-level
warp-by-upsampled-flow (scales 0.625/1.25/2.5/5.0), UFlow feature
normalization, correlation cost volume, DenseNet-style decoder
(128/128/96/64/32 with concat growth), dilated context network (1,2,4,8,16),
and output ``(4x-upsampled flow2 * 20, flow2 * 5)``.

No normalization layers anywhere — the whole forward is conv + warp +
correlation, which XLA fuses aggressively on the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock, Deconv, PredictFlow
from ocflow_tpu.ops.cost_volume import normalize_features
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear
from ocflow_tpu.ops.warp import warp


class SiameseEncoder(nn.Module):
    """Three 3x3 convs per level, first strided (reference :30-47)."""

    level_features: Sequence[int] = (16, 32, 64, 96, 128, 196)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feats = []
        for f in self.level_features:
            x = ConvBlock(f, stride=2, dtype=self.dtype)(x)
            x = ConvBlock(f, dtype=self.dtype)(x)
            x = ConvBlock(f, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class DenseDecoder(nn.Module):
    """Concat-growth decoder: x ← cat(conv_i(x), x) five times, then a flow
    head; also emits the pre-head features (reference :176-183)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for f in (128, 128, 96, 64, 32):
            x = jnp.concatenate([ConvBlock(f, dtype=self.dtype)(x), x], axis=-1)
        flow = PredictFlow(dtype=self.dtype)(x)
        return flow, x


class ContextNetwork(nn.Module):
    """Dilated refinement (dc_conv1..7, reference :106-112)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for f, d in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)):
            x = ConvBlock(f, dilation=d, dtype=self.dtype)(x)
        return PredictFlow(dtype=self.dtype)(x)


class FlowNetCV(nn.Module):
    """Primary flow model. Input [B, H, W, 6] (frames concatenated on
    channels); H and W must be divisible by 64. Returns
    ``(flow_full [B,H,W,2], flow_quarter [B,H/4,W/4,2])``."""

    displacement: int = 4
    # per-level multipliers applied to the upsampled flow before warping
    # (reference :186-231)
    warp_scales: Sequence[float] = (0.625, 1.25, 2.5, 5.0)
    # UFlow feature normalization before correlation (on in FlowNetCV,
    # off in the sniklaus PWCNet port, pwc_net.py:159-169)
    normalize: bool = True
    # FlowNetCV warps with align_corners=False (:149); PWCNet with True (:27)
    warp_align_corners: bool = False
    # computation dtype: None = follow inputs (fp32 parity); jnp.bfloat16 for
    # mixed-precision training/inference with fp32 params
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        im1, im2 = x[..., :3], x[..., 3:]
        encoder = SiameseEncoder(dtype=self.dtype)
        # one encoder pass over both frames stacked on the batch dim: same
        # weights/math, double the GEMM M per conv (better MXU utilization
        # than two half-size passes)
        b = x.shape[0]
        both = encoder(jnp.concatenate([im1, im2], axis=0))
        f1 = [f[:b] for f in both]
        f2 = [f[b:] for f in both]

        # Level 6 (coarsest)
        c16, c26 = f1[5], f2[5]
        if self.normalize:
            c16, c26 = normalize_features([c16, c26])
        corr = nn.leaky_relu(
            cost_volume(c16, c26, self.displacement), negative_slope=0.1
        )
        flow, feat = DenseDecoder(dtype=self.dtype)(corr)
        up_flow = Deconv(2, act=False, dtype=self.dtype)(flow)
        up_feat = Deconv(2, act=False, dtype=self.dtype)(feat)

        # Levels 5..2
        flow2 = None
        feat2 = None
        for lvl, scale in zip((4, 3, 2, 1), self.warp_scales):
            c1 = f1[lvl]
            warped = warp(
                f2[lvl], up_flow * scale, align_corners=self.warp_align_corners
            )
            c1n, wn = (c1, warped)
            if self.normalize:
                c1n, wn = normalize_features([c1n, wn])
            corr = nn.leaky_relu(
                cost_volume(c1n, wn, self.displacement), negative_slope=0.1
            )
            # the reference overwrites c1x with its normalized version before
            # the decoder concat (cost_volume_flow_net.py:187,190) — the
            # decoder sees NORMALIZED pyramid features, not raw ones
            xcat = jnp.concatenate([corr, c1n, up_flow, up_feat], axis=-1)
            flow, feat = DenseDecoder(dtype=self.dtype)(xcat)
            if lvl > 1:
                up_flow = Deconv(2, act=False, dtype=self.dtype)(flow)
                up_feat = Deconv(2, act=False, dtype=self.dtype)(feat)
            else:
                flow2, feat2 = flow, feat

        flow2 = flow2 + ContextNetwork(dtype=self.dtype)(feat2)
        # flow outputs in fp32: losses/metrics need full precision
        flow2 = flow2.astype(jnp.float32)
        h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
        flow1 = resize_bilinear(flow2, h, w, align_corners=True) * 20.0
        return flow1, flow2 * 5.0


class PWCNet(FlowNetCV):
    """sniklaus-style PWC-Net port (reference pwc_net.py:34-240): identical
    coarse-to-fine structure to FlowNetCV but with raw (un-normalized)
    correlation and align_corners=True backwarp. Trains from scratch; the
    reference's URL-fetched pretrained weights are an optional extra."""

    normalize: bool = False
    warp_align_corners: bool = True
