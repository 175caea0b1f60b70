"""Simple U-Net image inpainter (reference image_inpainting_net.py:58-103).

``__call__(imgs, masks)``: imgs [B,H,W,3] in [-1,1], masks [B,H,W,1] with
1 = hole. The hole is zeroed, the mask concatenated as a 4th channel, and a
6-level proj-bottleneck U-Net predicts the completed image (tanh)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import ConvBlock
from ocflow_tpu.ops.resize import resize_bilinear


class _Down(nn.Module):
    """2x2/s2 conv → kxk conv → 1x1 conv, BN+LeakyReLU
    (image_inpainting_net.py:5-25); first conv kernel varies (7/5/3)."""

    features: int
    kernel_size: int = 3
    proj_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = max(x.shape[-1] // self.proj_ratio, 1)
        x = ConvBlock(inter, kernel_size=2, stride=2, padding=0, use_bn=True)(x, train)
        x = ConvBlock(inter, kernel_size=self.kernel_size, use_bn=True)(x, train)
        x = ConvBlock(self.features, kernel_size=1, padding=0, use_bn=True)(x, train)
        return x


class _Up(nn.Module):
    """bilinear 2x + skip concat + proj bottleneck
    (image_inpainting_net.py:27-57)."""

    features: int
    proj_ratio: int = 4
    activation: bool = True

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        h2, w2 = x2.shape[1], x2.shape[2]
        x1 = resize_bilinear(x1, x1.shape[1] * 2, x1.shape[2] * 2, align_corners=False)
        if (x1.shape[1], x1.shape[2]) != (h2, w2):
            dy, dx = h2 - x1.shape[1], w2 - x1.shape[2]
            x1 = jnp.pad(
                x1, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0))
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        inter = max(x.shape[-1] // self.proj_ratio, 1)
        x = ConvBlock(inter, kernel_size=1, padding=0, use_bn=True)(x, train)
        x = ConvBlock(inter, kernel_size=3, use_bn=True)(x, train)
        # activation=False drops BN AND LeakyReLU but the conv stays
        # bias-free like every conv in the reference block
        # (image_inpainting_net.py:41-43: conv bias=False, BN→Identity)
        x = ConvBlock(
            self.features, kernel_size=1, padding=0,
            use_bn=self.activation, act=self.activation, use_bias=False,
        )(x, train)
        return x


class InpaintingNet(nn.Module):
    @nn.compact
    def __call__(self, imgs, masks, train: bool = False):
        masked = imgs * (1.0 - masks)
        x0 = jnp.concatenate([masked, masks], axis=-1)

        x1 = _Down(32, kernel_size=7, proj_ratio=1)(x0, train)
        x2 = _Down(64, kernel_size=5)(x1, train)
        x3 = _Down(128, kernel_size=5)(x2, train)
        x4 = _Down(128)(x3, train)
        x5 = _Down(128)(x4, train)
        x6 = _Down(128)(x5, train)

        x = _Up(128, proj_ratio=8)(x6, x5, train)
        x = _Up(128, proj_ratio=8)(x, x4, train)
        x = _Up(128, proj_ratio=8)(x, x3, train)
        x = _Up(64)(x, x2, train)
        x = _Up(32)(x, x1, train)
        x = _Up(3, activation=False)(x, masked, train)
        return jnp.tanh(x)
