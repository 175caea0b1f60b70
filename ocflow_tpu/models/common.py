"""Shared flax building blocks for the model zoo.

All modules are NHWC. Convolutions use explicit torch-style symmetric
padding (``k//2`` or ``(k-1)//2``) so spatial sizes match the reference
layer-for-layer. LeakyReLU slope is 0.1 everywhere, as in the reference.

BatchNorm note: the reference trains single-GPU BatchNorm. Here BatchNorm
carries an optional ``axis_name`` so batch statistics sync across the data
mesh under pjit/shard_map (the TPU-native replacement for torch
SyncBatchNorm); nets without norm (the PWC flagship) are unaffected.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.ops.resize import resize_bilinear

# Mesh axis over which BatchNorm statistics are synchronized when the module
# runs inside shard_map; None = local stats (single device / pjit full-batch).
BN_AXIS_NAME: str | None = None


def leaky_relu(x, slope: float = 0.1):
    return nn.leaky_relu(x, negative_slope=slope)


class ConvBlock(nn.Module):
    """Conv → (BatchNorm) → LeakyReLU(0.1), torch-style padding.

    ``dtype`` is the computation dtype (mixed precision: params stay fp32,
    compute in bf16 when set)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int | None = None  # default: (k-1)//2 * dilation
    use_bn: bool = False
    act: bool = True
    use_bias: bool | None = None  # default: bias iff no BN follows
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        if p is None:
            p = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=not self.use_bn if self.use_bias is None else self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=BN_AXIS_NAME,
                dtype=self.dtype,
            )(x)
        if self.act:
            x = leaky_relu(x)
        return x


class Deconv(nn.Module):
    """2x transposed-conv upsampling (torch ConvTranspose2d(k=4, s=2, p=1))."""

    features: int
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME", use_bias=True,
            dtype=self.dtype,
        )(x)
        if self.act:
            x = leaky_relu(x)
        return x


class PredictFlow(nn.Module):
    """Single 3x3 conv flow head (PWC/FlowNetS style)."""

    out_channels: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )(x)


class PredictFlowStack(nn.Module):
    """conv(32) → conv(16) → conv(2) head (SimpleFlowNet style,
    reference simple_flow_net.py:130-135)."""

    out_channels: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(32)(x)
        x = ConvBlock(16)(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)))(x)


class ProjDown(nn.Module):
    """Projection-bottleneck strided downsample block
    (reference simple_flow_net.py:6-26): 2x2/s2 conv → 3x3 conv → 1x1 conv,
    each BN + LeakyReLU."""

    features: int
    proj_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = max(x.shape[-1] // self.proj_ratio, 1)
        x = ConvBlock(inter, kernel_size=2, stride=2, padding=0, use_bn=True)(x, train)
        x = ConvBlock(inter, kernel_size=3, use_bn=True)(x, train)
        x = ConvBlock(self.features, kernel_size=1, padding=0, use_bn=True)(x, train)
        return x


class ProjUp(nn.Module):
    """Projection-bottleneck bilinear-upsample block with skip concat
    (reference simple_flow_net.py:28-57)."""

    features: int
    proj_ratio: int = 4

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        h2, w2 = x2.shape[1], x2.shape[2]
        x1 = resize_bilinear(x1, x1.shape[1] * 2, x1.shape[2] * 2, align_corners=False)
        if (x1.shape[1], x1.shape[2]) != (h2, w2):
            dy, dx = h2 - x1.shape[1], w2 - x1.shape[2]
            x1 = jnp.pad(
                x1,
                ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        inter = max(x.shape[-1] // self.proj_ratio, 1)
        x = ConvBlock(inter, kernel_size=1, padding=0, use_bn=True)(x, train)
        x = ConvBlock(inter, kernel_size=3, use_bn=True)(x, train)
        x = ConvBlock(self.features, kernel_size=1, padding=0, use_bn=True)(x, train)
        return x
