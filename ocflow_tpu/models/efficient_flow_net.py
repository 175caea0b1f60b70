"""ENet-style efficient flow networks (reference efficient_flow_net.py).

The reference's MaxUnpool2d (indices carried from encoder max-pools,
efficient_flow_net.py:66-69) is reproduced with a dense one-hot unpool
(ops/pooling.py) — no dynamic scatters, so the whole net jits on TPU.
Dropout2d regularization maps to flax Dropout with spatial broadcast; it is
active only when a 'dropout' rng is provided (train mode).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocflow_tpu.models.common import PredictFlow
from ocflow_tpu.ops.pooling import max_pool_2x2, max_pool_2x2_with_argmax, max_unpool_2x2
from ocflow_tpu.ops.resize import resize_bilinear


class ChannelPReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)``; flax's
    ``nn.PReLU`` is a single shared slope). Init 0.25 like torch."""

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "negative_slope", nn.initializers.constant(0.25),
            (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class InitialBlock(nn.Module):
    """cat(maxpool(x), conv_s2(x)) → BN → PReLU(16) (reference :6-23)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(16 - x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
        pooled = max_pool_2x2(x)
        out = jnp.concatenate([pooled, conv], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        return ChannelPReLU()(out)


class BottleNeck(nn.Module):
    """ENet bottleneck: identity/pool/unpool main branch + projected residual
    (reference :25-146)."""

    out_channels: int | None = None
    dilation: int = 1
    downsample: bool = False
    upsample: bool = False
    asymmetric: bool = False
    proj_ratio: int = 4
    p_drop: float = 0.1
    use_prelu: bool = True

    def act(self, name=None):
        return nn.PReLU() if self.use_prelu else nn.relu

    @nn.compact
    def __call__(self, x, indices=None, out_size=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        inter = in_ch // self.proj_ratio
        bn = lambda y: nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        act = (lambda y: nn.PReLU()(y)) if self.use_prelu else nn.relu

        # Main branch
        identity = x
        if self.upsample:
            identity = bn(nn.Conv(out_ch, (1, 1), use_bias=False)(identity))
            identity = max_unpool_2x2(identity, indices, out_size)
        elif self.downsample:
            identity, idx = max_pool_2x2_with_argmax(identity)
        if out_ch > identity.shape[-1]:
            pad = out_ch - identity.shape[-1]
            identity = jnp.pad(identity, ((0, 0), (0, 0), (0, 0), (0, pad)))

        # Bottleneck branch
        if self.downsample:
            y = nn.Conv(inter, (2, 2), strides=(2, 2), use_bias=False)(x)
        else:
            y = nn.Conv(inter, (1, 1), use_bias=False)(x)
        y = act(bn(y))

        if self.asymmetric:
            y = nn.Conv(inter, (1, 5), padding=((0, 0), (2, 2)))(y)
            y = nn.PReLU()(bn(y))
            y = nn.Conv(inter, (5, 1), padding=((2, 2), (0, 0)))(y)
        elif self.upsample:
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) is the
            # flax transpose with EXPLICIT ((1, 2), (1, 2)) padding — SAME
            # is one pixel shifted (verified numerically; round-5 parity
            # bug found by the EFlowNet golden). Odd out_size = op 0: the
            # slice drops the output_padding row/col.
            y = nn.ConvTranspose(inter, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), use_bias=False)(y)
            if out_size is not None:
                y = y[:, : out_size[0], : out_size[1]]
        else:
            d = self.dilation
            y = nn.Conv(
                inter, (3, 3), padding=((d, d), (d, d)), kernel_dilation=(d, d),
                use_bias=False,
            )(y)
        y = act(bn(y))
        y = act(bn(nn.Conv(out_ch, (1, 1), use_bias=False)(y)))
        y = nn.Dropout(self.p_drop, broadcast_dims=(1, 2), deterministic=not train)(y)

        if identity.shape != y.shape:
            dy = identity.shape[1] - y.shape[1]
            dx = identity.shape[2] - y.shape[2]
            y = jnp.pad(y, ((0, 0), (dy, 0), (dx, 0), (0, 0)))

        out = act(y + identity)
        if self.downsample:
            return out, idx
        return out


class _ENetEncoder(nn.Module):
    """InitialBlock + stages 1-3 (shared by EFlowNet / EFlowNet2)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = InitialBlock()(x, train)
        sz1 = (x.shape[1], x.shape[2])
        x, idx1 = BottleNeck(64, downsample=True, p_drop=0.01)(x, train=train)
        for _ in range(4):
            x = BottleNeck(p_drop=0.01)(x, train=train)

        sz2 = (x.shape[1], x.shape[2])
        x, idx2 = BottleNeck(128, downsample=True)(x, train=train)
        for _ in range(2):  # two rounds: stage 2 and stage 3
            x = BottleNeck()(x, train=train)
            x = BottleNeck(dilation=2)(x, train=train)
            x = BottleNeck(asymmetric=True)(x, train=train)
            x = BottleNeck(dilation=4)(x, train=train)
            x = BottleNeck()(x, train=train)
            x = BottleNeck(dilation=8)(x, train=train)
            x = BottleNeck(asymmetric=True)(x, train=train)
            x = BottleNeck(dilation=16)(x, train=train)
        return x, (idx1, sz1), (idx2, sz2)


class EFlowNet(nn.Module):
    """Plain ENet encoder-decoder, flow at 1/2 res upsampled 2x
    (reference :147-246)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, (idx1, sz1), (idx2, sz2) = _ENetEncoder()(x, train)

        x = BottleNeck(64, upsample=True, use_prelu=False)(x, idx2, sz2, train)
        x = BottleNeck(use_prelu=False)(x, train=train)
        x = BottleNeck(use_prelu=False)(x, train=train)

        x = BottleNeck(16, upsample=True, use_prelu=False)(x, idx1, sz1, train)
        x = BottleNeck(use_prelu=False)(x, train=train)

        flow = PredictFlow()(x)
        h, w = flow.shape[1] * 2, flow.shape[2] * 2
        return resize_bilinear(flow, h, w, align_corners=False)


class EFlowNet2(nn.Module):
    """EFlowNet with multi-scale flow fed back into the decoder
    (reference :248-360)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, (idx1, sz1), (idx2, sz2) = _ENetEncoder()(x, train)
        flow3 = PredictFlow()(x)

        x = jnp.concatenate([x, flow3], axis=-1)
        x = BottleNeck(64, upsample=True, use_prelu=False)(x, idx2, sz2, train)
        x = BottleNeck(use_prelu=False)(x, train=train)
        x = BottleNeck(use_prelu=False)(x, train=train)
        flow4 = PredictFlow()(x)

        x = jnp.concatenate([x, flow4], axis=-1)
        x = BottleNeck(16, upsample=True, use_prelu=False)(x, idx1, sz1, train)
        x = BottleNeck(use_prelu=False)(x, train=train)

        flow = PredictFlow()(x)
        h, w = flow.shape[1] * 2, flow.shape[2] * 2
        return resize_bilinear(flow, h, w, align_corners=False)
