"""Network-level golden parity vs the torch reference.

Loads the reference networks (read-only at /root/reference) in torch,
converts their randomly-initialized state_dicts with
``ocflow_tpu.models.torch_convert``, and asserts the full forward pass
matches: identical weights + identical input → identical output
(≤1e-4 max abs error in fp32, EPE ≤1e-2 as BASELINE.json requires).

This proves compositional parity — padding conventions, LeakyReLU slopes,
deconv semantics, channel order at every concat — end-to-end, on top of the
op-level goldens in test_ops_golden.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "models", "networks")):
    pytest.skip("torch reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ocflow_tpu import models  # noqa: E402
from ocflow_tpu.models import torch_convert  # noqa: E402


def _to_nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _assert_tree_matches(template, converted, path=""):
    """Converted variables must mirror the init tree exactly (names+shapes)."""
    assert set(template.keys()) == set(converted.keys()), (
        f"{path}: {sorted(set(template) ^ set(converted))}"
    )
    for k in template:
        t, c = template[k], converted[k]
        if isinstance(t, dict):
            _assert_tree_matches(t, c, f"{path}/{k}")
        else:
            assert np.shape(t) == np.shape(c), f"{path}/{k}: {np.shape(t)} vs {np.shape(c)}"


@pytest.fixture(scope="module")
def image_pair(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return rng.uniform(-1, 1, (2, 64, 128, 6)).astype(np.float32)


@pytest.mark.slow
def test_flownetcv_full_forward_parity(image_pair):
    from models.networks.cost_volume_flow_net import FlowNetCV as TorchFlowNetCV

    torch.manual_seed(0)
    ref = TorchFlowNetCV()
    ref.eval()

    variables = torch_convert.convert_flownetcv(ref.state_dict())
    net = models.FlowNetCV()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_full, t_quarter = ref(_to_nchw(image_pair))
    j_full, j_quarter = net.apply(variables, jnp.asarray(image_pair))

    full_err = np.abs(np.asarray(j_full) - _from_nchw(t_full)).max()
    quarter_err = np.abs(np.asarray(j_quarter) - _from_nchw(t_quarter)).max()
    assert full_err < 1e-4, full_err
    assert quarter_err < 1e-4, quarter_err

    epe = np.linalg.norm(np.asarray(j_full) - _from_nchw(t_full), axis=-1).mean()
    assert epe < 1e-2, epe


def test_pwcnet_sniklaus_full_forward_parity(image_pair):
    from models.networks.pwc_net import PWCNet as TorchPWCNet

    torch.manual_seed(0)
    ref = TorchPWCNet(pre_train=False)  # URL weights unavailable (zero egress)
    ref.eval()

    variables = torch_convert.convert_pwcnet(ref.state_dict())
    net = models.PWCNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_full, t_quarter = ref(_to_nchw(image_pair))
    j_full, j_quarter = net.apply(variables, jnp.asarray(image_pair))

    assert np.abs(np.asarray(j_full) - _from_nchw(t_full)).max() < 1e-4
    assert np.abs(np.asarray(j_quarter) - _from_nchw(t_quarter)).max() < 1e-4


def test_pwcnet_converter_accepts_sniklaus_keys(image_pair):
    """The raw sniklaus URL checkpoint uses module* names; the converter must
    accept them too (reference renames module→net at load, pwc_net.py:223)."""
    from models.networks.pwc_net import PWCNet as TorchPWCNet

    torch.manual_seed(2)
    ref = TorchPWCNet(pre_train=False)
    sd = {k.replace("net", "module", 1): v for k, v in ref.state_dict().items()}
    variables = torch_convert.convert_pwcnet(sd)
    net = models.PWCNet()
    j_full, _ = net.apply(variables, jnp.asarray(image_pair))
    ref.eval()
    with torch.no_grad():
        t_full, _ = ref(_to_nchw(image_pair))
    assert np.abs(np.asarray(j_full) - _from_nchw(t_full)).max() < 1e-4


def _warm_batchnorm(ref, shape, steps=3):
    """Populate torch running stats so eval-mode parity is non-trivial."""
    g = torch.Generator().manual_seed(7)
    ref.train()
    with torch.no_grad():
        for _ in range(steps):
            ref(torch.rand((2,) + shape, generator=g) * 2 - 1)
    ref.eval()


@pytest.mark.slow
def test_flownets_full_forward_parity(image_pair):
    from models.networks.flow_net_s import FlowNetS as TorchFlowNetS

    torch.manual_seed(0)
    ref = TorchFlowNetS(input_channels=6, batchNorm=True)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flownets(ref.state_dict(), use_bn=True)
    net = models.FlowNetS(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)

    err = np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max()
    assert err < 1e-4, err


@pytest.mark.slow
def test_simpleflownet_full_forward_parity(image_pair):
    from models.networks.simple_flow_net import SimpleFlowNet as TorchSimple

    torch.manual_seed(0)
    ref = TorchSimple(in_channels=6)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_simpleflownet(ref.state_dict())
    net = models.SimpleFlowNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)

    err = np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max()
    assert err < 1e-4, err


def test_converter_npz_round_trip(tmp_path, image_pair):
    from models.networks.cost_volume_flow_net import FlowNetCV as TorchFlowNetCV

    torch.manual_seed(1)
    ref = TorchFlowNetCV()
    sd_path = tmp_path / "ref.pth"
    torch.save(ref.state_dict(), sd_path)
    npz_path = tmp_path / "ref.npz"
    torch_convert.convert_checkpoint(str(sd_path), "flownetcv", str(npz_path))

    variables = torch_convert.npz_to_variables(str(npz_path))
    net = models.FlowNetCV()
    j_full, _ = net.apply(variables, jnp.asarray(image_pair))
    ref.eval()
    with torch.no_grad():
        t_full, _ = ref(_to_nchw(image_pair))
    assert np.abs(np.asarray(j_full) - _from_nchw(t_full)).max() < 1e-4
