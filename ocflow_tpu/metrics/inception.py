"""InceptionV3 feature extractor for FID / Inception Score
(reference inpainting_metrics/fid/inception.py — a pytorch-fid port).

Faithful torchvision InceptionV3 architecture in flax (NHWC). Weights can be
loaded from a local npz converted from the torch state_dict
(``convert_torch_inception``); without weights the module still runs (random
features — relative FID comparisons remain possible within a fixed seed, but
absolute values are not comparable to the literature; ship weights for
production parity, as the reference downloads them from a URL at runtime,
inception.py:13-14).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | int = 0

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if isinstance(p, int):
            p = ((p, p), (p, p))
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=p, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(48, (1, 1))(x)
        b2 = BasicConv(64, (5, 5), padding=2)(b2)
        b3 = BasicConv(64, (1, 1))(x)
        b3 = BasicConv(96, (3, 3), padding=1)(b3)
        b3 = BasicConv(96, (3, 3), padding=1)(b3)
        b4 = BasicConv(self.pool_features, (1, 1))(_avg_pool3(x))
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(384, (3, 3), stride=2)(x)
        b2 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(96, (3, 3), padding=1)(b2)
        b2 = BasicConv(96, (3, 3), stride=2)(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(c7, (1, 1))(x)
        b2 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b3 = BasicConv(c7, (1, 1))(x)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b4 = BasicConv(192, (1, 1))(_avg_pool3(x))
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(192, (1, 1))(x)
        b1 = BasicConv(320, (3, 3), stride=2)(b1)
        b2 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b2 = BasicConv(192, (3, 3), stride=2)(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1))(x)
        b2 = BasicConv(384, (1, 1))(x)
        b2a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b2)
        b2b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = BasicConv(448, (1, 1))(x)
        b3 = BasicConv(384, (3, 3), padding=1)(b3)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        b4 = BasicConv(192, (1, 1))(_avg_pool3(x))
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 features [B, 2048], logits [B, num_classes])."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        # input: [B, 299, 299, 3] in [-1, 1]
        x = BasicConv(32, (3, 3), stride=2)(x)
        x = BasicConv(32, (3, 3))(x)
        x = BasicConv(64, (3, 3), padding=1)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1))(x)
        x = BasicConv(192, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32)(x)
        x = InceptionA(64)(x)
        x = InceptionA(64)(x)
        x = InceptionB()(x)
        x = InceptionC(128)(x)
        x = InceptionC(160)(x)
        x = InceptionC(160)(x)
        x = InceptionC(192)(x)
        x = InceptionD()(x)
        x = InceptionE()(x)
        x = InceptionE()(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → [B, 2048]
        logits = nn.Dense(self.num_classes)(feats)
        return feats, logits


def init_inception(rng: jax.Array, weights_path: str | None = None):
    net = InceptionV3()
    variables = net.init(rng, jnp.zeros((1, 299, 299, 3)))
    if weights_path:
        loaded = dict(np.load(weights_path, allow_pickle=True))
        variables = jax.tree_util.tree_map(
            lambda x: x, variables
        )  # make mutable copy semantics explicit
        flat = _flatten(variables)
        for k in flat:
            key = "/".join(k)
            if key in loaded:
                flat[k] = jnp.asarray(loaded[key])
        variables = _unflatten(flat)
    return net, variables


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        node = tree
        for part in k[:-1]:
            node = node.setdefault(part, {})
        node[k[-1]] = v
    return tree
