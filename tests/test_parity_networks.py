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


# ---------------------------------------------------------------------------
# Inpainting + occlusion families (round-4: the largest env-unblocked
# correctness exposure — gated towers, get_pad semantics, Self_Attn softmax
# orientation, SN power iteration; reference
# gated_conv_inpainting_net.py / image_inpainting_net.py /
# simple_occlusion_net.py / occlusion_net_s.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def img_mask():
    rng = np.random.default_rng(11)
    imgs = rng.uniform(-1, 1, (2, 64, 128, 3)).astype(np.float32)
    masks = (rng.uniform(size=(2, 64, 128, 1)) > 0.75).astype(np.float32)
    return imgs, masks


def _warm_batchnorm2(ref, make_inputs, steps=3):
    """_warm_batchnorm for modules with (imgs, masks)-style signatures."""
    g = torch.Generator().manual_seed(7)
    ref.train()
    with torch.no_grad():
        for _ in range(steps):
            ref(*make_inputs(g))
    ref.eval()


@pytest.mark.slow
def test_inpainting_net_parity(img_mask):
    from models.networks.image_inpainting_net import InpaintingNet as TorchNet

    torch.manual_seed(0)
    ref = TorchNet()
    _warm_batchnorm2(ref, lambda g: (
        torch.rand((2, 3, 64, 128), generator=g) * 2 - 1,
        (torch.rand((2, 1, 64, 128), generator=g) > 0.75).float(),
    ))

    imgs, masks = img_mask
    variables = torch_convert.convert_inpainting_net(ref.state_dict())
    net = models.InpaintingNet()
    template = net.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.asarray(masks[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_out = ref(_to_nchw(imgs), _to_nchw(masks))
    j_out = net.apply(variables, jnp.asarray(imgs), jnp.asarray(masks))
    err = np.abs(np.asarray(j_out) - _from_nchw(t_out)).max()
    assert err < 1e-4, err


@pytest.mark.slow
def test_simple_occlusion_net_parity(image_pair):
    from models.networks.simple_occlusion_net import (
        SimpleOcclusionNet as TorchNet,
    )

    torch.manual_seed(0)
    ref = TorchNet()
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_simple_occlusion_net(ref.state_dict())
    net = models.SimpleOcclusionNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_occ = ref(_to_nchw(image_pair))
    j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    err = np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max()
    assert err < 1e-4, err


@pytest.mark.slow
def test_occlusion_net_s_parity(image_pair):
    from models.networks.occlusion_net_s import OcclusionNetS as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(input_channels=6, batchNorm=True)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_occlusion_net_s(ref.state_dict())
    net = models.OcclusionNetS(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_occ = ref(_to_nchw(image_pair))
    j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    err = np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max()
    assert err < 1e-4, err


def test_self_attn_parity():
    from models.networks.gated_conv_inpainting_net import Self_Attn

    torch.manual_seed(3)
    ref = Self_Attn(32)
    ref.gamma.data.fill_(0.5)  # zero-init gamma would mask attention errors
    ref.eval()

    sd = torch_convert._Consumer(
        {f"attn.{k}": v for k, v in ref.state_dict().items()})
    params = torch_convert._self_attn(sd, "attn")
    sd.finish()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 16, 32)).astype(np.float32)
    from ocflow_tpu.models.gated_conv import SelfAttention

    with torch.no_grad():
        t_out = ref(_to_nchw(x))
    j_out = SelfAttention().apply({"params": params}, jnp.asarray(x))
    err = np.abs(np.asarray(j_out) - _from_nchw(t_out)).max()
    assert err < 1e-4, err


def _sanet_parity(projected, img_mask):
    from models.networks.gated_conv_inpainting_net import (
        InpaintSANet as TorchSA,
        InpaintSANetOrg as TorchSAOrg,
    )

    torch.manual_seed(0)
    ref = (TorchSA if projected else TorchSAOrg)(img_size=(64, 128))
    ref.refine_attn.gamma.data.fill_(0.7)  # make attention parity observable
    _warm_batchnorm2(ref, lambda g: (
        torch.rand((2, 3, 64, 128), generator=g) * 2 - 1,
        (torch.rand((2, 1, 64, 128), generator=g) > 0.75).float(),
    ))

    imgs, masks = img_mask
    variables = torch_convert.convert_inpaint_sanet(
        ref.state_dict(), projected=projected)
    net = (models.InpaintSANet if projected else models.InpaintSANetOrg)()
    template = net.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), jnp.asarray(masks[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_coarse, t_ref = ref(_to_nchw(imgs), _to_nchw(masks))
    j_coarse, j_ref = net.apply(
        variables, jnp.asarray(imgs), jnp.asarray(masks), train=False)
    errs = (
        np.abs(np.asarray(j_coarse) - _from_nchw(t_coarse)).max(),
        np.abs(np.asarray(j_ref) - _from_nchw(t_ref)).max(),
    )
    # refined output crosses ~29 gated double-towers + softmax attention;
    # fp32 accumulation noise reaches a few 1e-4 on the projected variant
    assert errs[0] < 1e-4 and errs[1] < 1e-3, errs


@pytest.mark.slow
def test_inpaint_sanet_parity(img_mask):
    _sanet_parity(True, img_mask)


@pytest.mark.slow
def test_inpaint_sanet_org_parity(img_mask):
    _sanet_parity(False, img_mask)


@pytest.mark.parametrize("projected", [True, False])
def test_inpaint_discriminator_parity(projected):
    """Spectral-norm parity: with torch's u copied into batch_stats, one
    torch train-mode forward must equal one flax update_stats=True forward
    EXACTLY (same power iteration, same sigma), and the updated u vectors
    must coincide so the equality persists across steps."""
    from models.networks.gated_conv_inpainting_net import (
        InpaintSADiscriminator as TorchD,
        InpaintSADiscriminatorOrg as TorchDOrg,
    )

    torch.manual_seed(0)
    ref = (TorchD if projected else TorchDOrg)(img_size=(64, 128))
    ref.train()

    variables = torch_convert.convert_inpaint_discriminator(
        ref.state_dict(), projected=projected)
    net = (
        models.InpaintSADiscriminator
        if projected
        else models.InpaintSADiscriminatorOrg
    )()

    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 64, 128, 4)).astype(np.float32)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    _assert_tree_matches(template, variables)

    # Compare pre-flatten critic maps: the torch forward flattens NCHW and
    # ours NHWC (a permutation — equivalent under the mean-based SN-PatchGAN
    # losses; the reference's own .view also crashes on its non-contiguous
    # output here, so the Sequential is driven directly).
    for step in range(2):
        with torch.no_grad():
            t_feat = ref.discriminator_net(_to_nchw(x))
        j_out, updates = net.apply(
            variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
        variables = {**variables, "batch_stats": updates["batch_stats"]}
        b, c, h, w = t_feat.shape
        j_feat = np.asarray(j_out).reshape(b, h, w, c)
        err = np.abs(j_feat - _from_nchw(t_feat)).max()
        scale = np.abs(np.asarray(t_feat.detach())).max() + 1e-8
        assert err / scale < 1e-4, (step, err, scale)


@pytest.mark.slow
def test_simple_flow_occ_net_parity(image_pair):
    from models.networks.simple_flow_occ_net import (
        SimpleFlowOccNet as TorchNet,
    )

    torch.manual_seed(0)
    ref = TorchNet()
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_simple_flow_occ_net(ref.state_dict())
    net = models.SimpleFlowOccNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    # the hard-threshold STE output is binary; compare exact agreement away
    # from the 0.5 decision boundary
    t_o = _from_nchw(t_occ)
    j_o = np.asarray(j_occ)
    assert np.mean(j_o == t_o) > 0.999, np.mean(j_o == t_o)


@pytest.mark.slow
def test_flow_occ_net_s_parity(image_pair):
    from models.networks.flow_occ_net_s import FlowOccNetS as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(input_channels=6, batchNorm=True)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flow_occ_net_s(ref.state_dict())
    net = models.FlowOccNetS(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4


def _install_cost_volume_stub():
    """The reference repo is missing models/networks/cost_volume_net.py (its
    known import-broken module, SURVEY §2.4). Supply a stub whose
    CostVolumeLayer implements our documented repair semantics — per-pixel
    channel MEAN of f1 * shifted(f2), dy-major channels, zero padding — so
    the rest of the broken nets (encoders, dense decoders, gated warps,
    deconvs, context net) can be golden-tested against torch."""
    import types

    if "models.networks.cost_volume_net" in sys.modules:
        return
    mod = types.ModuleType("models.networks.cost_volume_net")

    class CostVolumeLayer(torch.nn.Module):
        def __init__(self, max_displacement=4):
            super().__init__()
            self.d = max_displacement

        def forward(self, f1, f2):
            d = self.d
            _, _, h, w = f1.shape
            f2p = torch.nn.functional.pad(f2, (d, d, d, d))
            outs = [
                (f1 * f2p[:, :, i : i + h, j : j + w]).mean(dim=1)
                for i in range(2 * d + 1)
                for j in range(2 * d + 1)
            ]
            return torch.stack(outs, dim=1)

    mod.CostVolumeLayer = CostVolumeLayer
    sys.modules["models.networks.cost_volume_net"] = mod


@pytest.mark.slow
def test_flow_occ_net_cv_parity(image_pair):
    """Full-forward golden for the repaired FlowOccNetCV: everything except
    the irrecoverably-missing CostVolumeLayer (pinned by the stub to our
    documented repair) comes from the reference file."""
    _install_cost_volume_stub()
    from models.networks.cost_volume_flow_occ_net import (
        FlowOccNetCV as TorchNet,
    )

    torch.manual_seed(0)
    ref = TorchNet()
    ref.eval()

    variables = torch_convert.convert_flow_occ_net_cv(ref.state_dict())
    net = models.FlowOccNetCV()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair))
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4


@pytest.mark.slow
def test_flow_occ_net_c_parity(image_pair):
    _install_cost_volume_stub()
    from models.networks.flow_occ_net_c import FlowOccNetC as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(batchNorm=True)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flow_occ_net_c(ref.state_dict())
    net = models.FlowOccNetC(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4


@pytest.mark.slow
def test_occlusion_net_c_parity(image_pair):
    _install_cost_volume_stub()
    from models.networks.occlusion_net_c import OcclusionNetC as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(batchNorm=True)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_occlusion_net_c(ref.state_dict())
    net = models.OcclusionNetC(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_occ = ref(_to_nchw(image_pair))
    j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4


def test_convert_checkpoint_combined_roles(tmp_path, image_pair):
    """A combined Lightning checkpoint holding several sub-module namespaces
    (the two-stage ckpt carries occ_pred.* next to inpainting weights,
    model.py:948-954) must be filtered to the requested network's role
    instead of merging namespaces (ADVICE r4)."""
    from models.networks.simple_occlusion_net import (
        SimpleOcclusionNet as TorchNet,
    )

    torch.manual_seed(3)
    ref = TorchNet()
    sd = {"occ_pred." + k: v for k, v in ref.state_dict().items()}
    # foreign namespaces that previously merged in and broke the consumer
    sd["generator.conv1.weight"] = torch.zeros(1)
    sd["discriminator.conv1.weight"] = torch.zeros(1)
    path = tmp_path / "combined.ckpt"
    torch.save({"state_dict": sd}, path)
    npz = tmp_path / "occ.npz"
    torch_convert.convert_checkpoint(str(path), "simple_occ", str(npz))
    variables = torch_convert.npz_to_variables(str(npz))
    direct = torch_convert.convert_simple_occlusion_net(ref.state_dict())
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, jax.tree_util.tree_map(np.asarray, direct))
    # a roleless network name against a multi-role checkpoint must raise
    with pytest.raises(ValueError):
        torch_convert.convert_checkpoint(
            str(path), "flownetcv", str(tmp_path / "x.npz"))


@pytest.mark.slow
def test_flownetc_full_forward_parity(image_pair):
    """Full-forward golden for the repaired FlowNetC: the reference net is
    constructible but forward-broken (correlation called with default
    max_disp=4 against a 473-ch conv3_1, flow_net_c.py:23,76); pinning the
    documented max_disp=10 repair on the torch side makes the advertised
    architecture run, and the flax net must match it exactly."""
    from models.networks.flow_net_c import FlowNetC as TorchNet
    from models.networks.correlation_layer import compute_cost_volume

    torch.manual_seed(0)
    ref = TorchNet(batchNorm=True)
    ref.corr = lambda a, b: compute_cost_volume(a, b, 10)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flownetc(ref.state_dict())
    net = models.FlowNetC(use_bn=True)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4


@pytest.mark.slow
def test_eflownet_full_forward_parity(image_pair):
    """Full-forward golden for the ENet-style EFlowNet: bottleneck variants
    (down/up/asymmetric/dilated), per-channel InitialBlock PReLU, max
    unpool index round trip (efficient_flow_net.py:147-246)."""
    from models.networks.efficient_flow_net import EFlowNet as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(in_channels=6)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_eflownet(ref.state_dict())
    net = models.EFlowNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4


@pytest.mark.slow
def test_eflownet2_full_forward_parity(image_pair):
    """EFlowNet2: multi-scale flow fed back into the decoder
    (efficient_flow_net.py:248-360)."""
    from models.networks.efficient_flow_net import EFlowNet2 as TorchNet

    torch.manual_seed(0)
    ref = TorchNet(in_channels=6)
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_eflownet2(ref.state_dict())
    net = models.EFlowNet2()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4


@pytest.mark.slow
def test_flownet_fpn_full_forward_parity(image_pair):
    """FlowNet (FPN-trunk PWC variant, flow_net.py:39-131): pyramid with
    BN running stats, in-loop warping (align_corners=False grid_sample),
    correlation, estimator towers, context refinement."""
    from models.networks.flow_net import FlowNet as TorchNet

    torch.manual_seed(0)
    ref = TorchNet()
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flownet_fpn(ref.state_dict())
    net = models.FlowNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow = ref(_to_nchw(image_pair))
    j_flow = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4


@pytest.mark.slow
def test_flow_occ_net_fpn_full_forward_parity(image_pair):
    """FlowOccNet (FPN joint flow+occ, flow_occ_net.py:69-189; reference
    import-broken on the missing CostVolumeLayer — stubbed to the
    documented repair): occ tower gates the warped features BEFORE the
    correlation, occ features/maps feed forward through sigmoided
    upconvs."""
    _install_cost_volume_stub()
    from models.networks.flow_occ_net import FlowOccNet as TorchNet

    torch.manual_seed(0)
    ref = TorchNet()
    _warm_batchnorm(ref, (6, 64, 128))

    variables = torch_convert.convert_flow_occ_net_fpn(ref.state_dict())
    net = models.FlowOccNet()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair), train=False)
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4


@pytest.mark.slow
def test_flow_occ_net_cv2_parity_vs_repaired_mirror(image_pair):
    """FlowOccNetCV2 golden vs a minimally-repaired torch mirror. The
    reference is doubly broken (missing CostVolumeLayer import AND a
    forward that calls never-defined conv{L}_j towers while __init__ builds
    separate fe/oe towers, cost_volume_flow_occ_net.py:308-318 vs 474-478).
    The mirror subclasses the reference module — every weight and helper
    comes from the reference file — and only its forward is rewritten to
    use the towers __init__ declares, which is the repo's documented
    repair (test_models_semantics.py::test_flowoccnetcv2_towers_are_
    separate)."""
    _install_cost_volume_stub()
    from models.networks.cost_volume_flow_occ_net import (
        FlowOccNetCV2 as TorchNet,
    )

    class RepairedCV2(TorchNet):
        def _level(self, lvl, xin):
            fx = xin
            for j in range(5):
                fx = torch.cat((getattr(self, f"fe{lvl}_{j}")(fx), fx), 1)
            flow = getattr(self, f"predict_flow{lvl}")(fx)
            ox = xin
            for j in range(5):
                ox = torch.cat((getattr(self, f"oe{lvl}_{j}")(ox), ox), 1)
            occ = getattr(self, f"predict_occ{lvl}")(ox)
            return flow, occ, fx

        def forward(self, x):
            im1, im2 = x[:, :3], x[:, 3:]
            f1s, f2s = [], []
            c1, c2 = im1, im2
            enc = [("conv1a", "conv1aa", "conv1b"),
                   ("conv2a", "conv2aa", "conv2b"),
                   ("conv3a", "conv3aa", "conv3b"),
                   ("conv4a", "conv4aa", "conv4b"),
                   ("conv5a", "conv5aa", "conv5b"),
                   ("conv6aa", "conv6a", "conv6b")]
            for a, b, c in enc:
                c1 = getattr(self, c)(getattr(self, b)(getattr(self, a)(c1)))
                c2 = getattr(self, c)(getattr(self, b)(getattr(self, a)(c2)))
                f1s.append(c1)
                f2s.append(c2)

            corr = self.leakyRELU(self.corr(f1s[5], f2s[5]))
            flow, occ, feat = self._level(6, corr)
            up_flow = self.upflow6(flow)
            up_occ = self.upocc6(occ)
            up_feat = self.upfeat6(feat)

            flow2 = occ2 = None
            for lvl, scale in zip((5, 4, 3, 2), (0.625, 1.25, 2.5, 5.0)):
                fi = lvl - 1
                warped = self.warp(f2s[fi], up_flow * scale) * up_occ
                corr = self.leakyRELU(self.corr(f1s[fi], warped))
                xin = torch.cat(
                    (corr, f1s[fi], up_flow, up_occ, up_feat), 1)
                flow, occ, feat = self._level(lvl, xin)
                if lvl > 2:
                    up_flow = getattr(self, f"upflow{lvl}")(flow)
                    up_occ = getattr(self, f"upocc{lvl}")(occ)
                    up_feat = getattr(self, f"upfeat{lvl}")(feat)
                else:
                    y = self.dc_conv4(self.dc_conv3(self.dc_conv2(
                        self.dc_conv1(feat))))
                    flow2 = flow + self.dc_conv7(self.dc_conv6(
                        self.dc_conv5(y)))
                    occ2 = occ
            return self.upsample1(flow2), self.upsample2(occ2)

    torch.manual_seed(0)
    ref = RepairedCV2()
    ref.eval()

    variables = torch_convert.convert_flow_occ_net_cv2(ref.state_dict())
    net = models.FlowOccNetCV2()
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(image_pair[:1]))
    _assert_tree_matches(template, variables)

    with torch.no_grad():
        t_flow, t_occ = ref(_to_nchw(image_pair))
    j_flow, j_occ = net.apply(variables, jnp.asarray(image_pair))
    assert np.abs(np.asarray(j_flow) - _from_nchw(t_flow)).max() < 1e-4
    assert np.abs(np.asarray(j_occ) - _from_nchw(t_occ)).max() < 1e-4
