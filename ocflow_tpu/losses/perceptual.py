"""VGG16 perceptual loss (reference models/model.py:123-152).

The reference uses torchvision's pretrained VGG16 features split into four
blocks (relu1_2 / relu2_2 / relu3_3 / relu4_3) and sums per-block L1 with
fixed weights. Here the backbone is a flax VGG16-features module; pretrained
weights can be loaded from a local ``.npz`` (converted from a torchvision
state_dict via ``convert_torch_vgg16``) — in this zero-egress environment the
loss falls back to fixed random features, which still defines a valid
(weaker) perceptual distance; document/ship weights for production parity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv layout (channels per conv, 'M' = maxpool)
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
# block boundaries measured in features[] indices: [:4], [4:9], [9:16], [16:23]
# → after relu1_2, relu2_2, relu3_3, relu4_3
_BLOCK_ENDS = (2, 4, 7, 10)  # counted in conv indices


class VGG16Features(nn.Module):
    """First 4 VGG16 blocks; returns the 4 block activations."""

    @nn.compact
    def __call__(self, x):
        outs = []
        conv_i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)))(x)
                x = nn.relu(x)
                conv_i += 1
                if conv_i in _BLOCK_ENDS:
                    outs.append(x)
        return outs


def init_vgg16(rng: jax.Array, weights_path: str | None = None):
    """Initialize (or load) frozen VGG16 feature params."""
    net = VGG16Features()
    variables = net.init(rng, jnp.zeros((1, 64, 64, 3)))
    if weights_path:
        loaded = dict(np.load(weights_path))
        params = variables["params"]
        flat = sorted(params.keys(), key=lambda k: int(k.split("_")[-1]))
        for i, layer in enumerate(flat):
            params[layer]["kernel"] = jnp.asarray(loaded[f"conv{i}_kernel"])
            params[layer]["bias"] = jnp.asarray(loaded[f"conv{i}_bias"])
    return net, variables


def convert_torch_vgg16(state_dict_path: str, out_path: str) -> None:
    """Convert a torchvision vgg16 state_dict (.pth) to our npz layout:
    OIHW → HWIO kernels, keys conv{i}_kernel / conv{i}_bias."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    out = {}
    conv_i = 0
    for k in sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]),
    ):
        idx = k.split(".")[1]
        w = sd[f"features.{idx}.weight"].numpy()  # OIHW
        b = sd[f"features.{idx}.bias"].numpy()
        out[f"conv{conv_i}_kernel"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{conv_i}_bias"] = b
        conv_i += 1
        if conv_i >= 10:
            break
    np.savez(out_path, **out)


def vgg_perceptual_loss(
    vgg_apply,
    vgg_variables,
    pred: jax.Array,
    target: jax.Array,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Σ_i w_i · L1(block_i(pred), block_i(target)); VGG params are frozen
    (stop_gradient), matching the reference's requires_grad=False blocks."""
    vgg_variables = jax.lax.stop_gradient(vgg_variables)
    feats_p = vgg_apply(vgg_variables, pred)
    feats_t = vgg_apply(vgg_variables, target)
    loss = 0.0
    for w, fp, ft in zip(weights, feats_p, feats_t):
        loss = loss + w * jnp.mean(jnp.abs(fp - ft))
    return loss
