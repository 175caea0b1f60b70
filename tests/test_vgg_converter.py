"""VGG16 torch-weight converter round trip: flax features must match torch
conv outputs after conversion."""

import os
import tempfile

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ocflow_tpu.losses.perceptual import convert_torch_vgg16, init_vgg16
import pytest

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)

# torchvision vgg16 conv indices in `features` up to relu4_3
_CFG = [
    (0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
]


def test_vgg16_converter_matches_torch(rng, tmp_path):
    sd = {}
    for idx, cin, cout in _CFG:
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32) * 0.05
        )
    pth = str(tmp_path / "vgg.pth")
    npz = str(tmp_path / "vgg.npz")
    torch.save(sd, pth)
    convert_torch_vgg16(pth, npz)
    net, variables = init_vgg16(jax.random.PRNGKey(0), npz)

    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    feats = net.apply(variables, jnp.asarray(x))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    conv = torch.nn.Conv2d(3, 64, 3, padding=1)
    conv.weight.data = sd["features.0.weight"]
    conv.bias.data = sd["features.0.bias"]
    conv2 = torch.nn.Conv2d(64, 64, 3, padding=1)
    conv2.weight.data = sd["features.2.weight"]
    conv2.bias.data = sd["features.2.bias"]
    block1 = torch.relu(conv2(torch.relu(conv(tx)))).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(feats[0]), block1, atol=1e-5)
