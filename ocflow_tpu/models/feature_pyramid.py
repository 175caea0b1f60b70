"""Feature pyramid + estimator building blocks for the FPN-based flow nets
(reference feature_pyramid_net.py, context_net.py, flow_net.py:11-37,
flow_occ_net.py:11-68)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock, leaky_relu


class DoubleConv(nn.Module):
    """stride-2 conv + conv, both BN+LeakyReLU (feature_pyramid_net.py:5-20)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features, stride=2, use_bn=True)(x, train)
        x = ConvBlock(self.features, use_bn=True)(x, train)
        return x


class FPNUp(nn.Module):
    """Transposed-conv upsample + BN + LeakyReLU, then add skip
    (feature_pyramid_net.py:22-44)."""

    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        # torch ConvTranspose2d(k=3, s=2, p=1, output_size=skip) == flax
        # transpose with explicit ((1, 2), (1, 2)) padding (SAME is one
        # pixel shifted — round-5 parity bug found by the FPN goldens);
        # the slice drops the output_padding row/col at odd skip sizes
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)))(x)
        x = x[:, : skip.shape[1], : skip.shape[2]]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = leaky_relu(x)
        return x + skip


class FeaturePyramidNet(nn.Module):
    """Bottom-up 6 levels (16..196) + top-down with skip fusion; returns
    [p6, p5, p4, p3, p2] coarse→fine (feature_pyramid_net.py:46-93)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = DoubleConv(16)(x, train)
        c2 = DoubleConv(32)(c1, train)
        c3 = DoubleConv(64)(c2, train)
        c4 = DoubleConv(96)(c3, train)
        c5 = DoubleConv(128)(c4, train)
        c6 = DoubleConv(196)(c5, train)

        p6 = ConvBlock(196, kernel_size=1, padding=0, use_bn=True)(c6, train)
        p5 = FPNUp(128)(p6, c5, train)
        p4 = FPNUp(96)(p5, c4, train)
        p3 = FPNUp(64)(p4, c3, train)
        p2 = FPNUp(32)(p3, c2, train)
        return [p6, p5, p4, p3, p2]


class ContextNetwork(nn.Module):
    """Dilated residual-flow refiner (context_net.py:5-27)."""

    out_channels: int = 2

    @nn.compact
    def __call__(self, x):
        for f, d in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)):
            x = ConvBlock(f, dilation=d)(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)))(x)


class OpticalFlowEstimator(nn.Module):
    """Per-level flow tower 128/128/96/64/32→2 with optional 2x upsampled
    (flow, feature) side outputs (flow_net.py:11-37)."""

    highest_resolution: bool = False

    @nn.compact
    def __call__(self, x):
        for f in (128, 128, 96, 64):
            x = ConvBlock(f)(x)
        feat = ConvBlock(32)(x)
        flow = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)))(feat)
        if self.highest_resolution:
            return flow, feat
        # torch k3/s2/p1/op1 transpose == explicit ((1, 2), (1, 2)) padding
        flow_up = nn.ConvTranspose(2, (3, 3), strides=(2, 2),
                                   padding=((1, 2), (1, 2)))(flow)
        feat_up = nn.ConvTranspose(2, (3, 3), strides=(2, 2),
                                   padding=((1, 2), (1, 2)))(feat)
        return flow, flow_up, feat_up


class OcclusionEstimator(nn.Module):
    """Per-level occlusion tower 128/96/64/32→16→1; at the finest level
    returns sigmoid(10·x) (flow_occ_net.py:39-68)."""

    highest_resolution: bool = False

    @nn.compact
    def __call__(self, x):
        for f in (128, 96, 64, 32):
            x = ConvBlock(f)(x)
        feat = ConvBlock(16)(x)
        occ = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))(feat)
        if self.highest_resolution:
            return nn.sigmoid(10.0 * occ)
        occ = nn.sigmoid(occ)
        # torch k3/s2/p1/op1 transpose == explicit ((1, 2), (1, 2)) padding
        feat_up = nn.sigmoid(
            nn.ConvTranspose(1, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)))(feat)
        )
        occ_up = nn.sigmoid(
            nn.ConvTranspose(1, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)))(occ)
        )
        return occ, occ_up, feat_up
