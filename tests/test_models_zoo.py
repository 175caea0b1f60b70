"""Shape/jit tests for the full model zoo (occ, flow-occ, ENet, FPN,
inpainting, GAN)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import models
from ocflow_tpu.ops import max_pool_2x2_with_argmax, max_unpool_2x2

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)


def run(net, *args, train=False):
    variables = net.init(jax.random.PRNGKey(0), *args, train=False)
    if train:
        rngs = {"dropout": jax.random.PRNGKey(1)}
        mutable = [k for k in variables if k != "params"]
        out, _ = net.apply(variables, *args, train=True, mutable=mutable, rngs=rngs)
        return out
    return net.apply(variables, *args, train=False)


# --- pooling ops -----------------------------------------------------------


def test_max_pool_unpool_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 3)).astype(np.float32))
    pooled, idx = max_pool_2x2_with_argmax(x)
    assert pooled.shape == (2, 4, 5, 3)
    # matches torch max_pool2d
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    want = F.max_pool2d(t, 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(pooled), want, atol=1e-6)

    un = max_unpool_2x2(pooled, idx, (8, 10))
    assert un.shape == x.shape
    # each pooled value lands on exactly one pixel; mass is preserved
    assert (np.asarray(un) != 0).sum() == pooled.size
    np.testing.assert_allclose(np.asarray(un).sum(), np.asarray(pooled).sum(), rtol=1e-5)
    # compare against torch max_unpool2d
    tp, tidx = F.max_pool2d(t, 2, 2, return_indices=True)
    tun = F.max_unpool2d(tp, tidx, 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(un), tun, atol=1e-6)


# --- occlusion nets --------------------------------------------------------


def test_simple_occlusion_net():
    out = run(models.SimpleOcclusionNet(), jnp.zeros((1, 32, 32, 6)))
    assert out.shape == (1, 32, 32, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_occlusion_net_s():
    out = run(models.OcclusionNetS(), jnp.zeros((1, 64, 64, 6)))
    assert out.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_occlusion_net_c():
    out = run(models.OcclusionNetC(), jnp.zeros((1, 64, 64, 6)))
    assert out.shape == (1, 64, 64, 1)


# --- joint flow-occ nets ---------------------------------------------------


def test_simple_flow_occ_net():
    flow, occ = run(models.SimpleFlowOccNet(), jnp.zeros((1, 32, 32, 6)))
    assert flow.shape == (1, 32, 32, 2)
    assert occ.shape == (1, 32, 32, 1)
    assert set(np.unique(np.asarray(occ))) <= {0.0, 1.0}  # STE hard mask


def test_flow_occ_net_s():
    flow, occ = run(models.FlowOccNetS(), jnp.zeros((1, 64, 64, 6)))
    assert flow.shape == (1, 64, 64, 2)
    assert occ.shape == (1, 64, 64, 1)


def test_flow_occ_net_cv():
    flow, occ = run(models.FlowOccNetCV(), jnp.zeros((1, 64, 64, 6)))
    assert flow.shape == (1, 64, 64, 2)
    assert occ.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_flow_occ_net_cv2():
    flow, occ = run(models.FlowOccNetCV2(), jnp.zeros((1, 64, 64, 6)))
    assert flow.shape == (1, 64, 64, 2)


def test_flow_occ_net_fpn():
    flow, occ = run(models.FlowOccNet(), jnp.zeros((1, 64, 64, 6)))
    assert flow.shape == (1, 64, 64, 2)
    assert occ.shape == (1, 64, 64, 1)


# --- FPN / ENet flow nets --------------------------------------------------


def test_flownet_fpn():
    out = run(models.FlowNet(), jnp.zeros((1, 64, 64, 6)))
    assert out.shape == (1, 64, 64, 2)


@pytest.mark.slow
def test_eflownet():
    out = run(models.EFlowNet(), jnp.zeros((1, 32, 32, 6)))
    assert out.shape == (1, 32, 32, 2)


def test_eflownet2_train_mode_dropout():
    out = run(models.EFlowNet2(), jnp.zeros((1, 32, 32, 6)), train=True)
    assert out.shape == (1, 32, 32, 2)


def test_pwcnet_variant():
    flow1, flow2 = run(models.PWCNet(), jnp.zeros((1, 64, 64, 6)))
    assert flow1.shape == (1, 64, 64, 2)
    assert flow2.shape == (1, 16, 16, 2)


# --- inpainting ------------------------------------------------------------


def test_inpainting_net():
    imgs = jnp.zeros((1, 64, 64, 3))
    masks = jnp.zeros((1, 64, 64, 1))
    out = run(models.InpaintingNet(), imgs, masks)
    assert out.shape == (1, 64, 64, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_inpaint_sanet():
    imgs = jnp.zeros((1, 64, 64, 3))
    masks = jnp.ones((1, 64, 64, 1))
    coarse, refined = run(models.InpaintSANet(), imgs, masks)
    assert coarse.shape == (1, 64, 64, 3)
    assert refined.shape == (1, 64, 64, 3)


def test_inpaint_sanet_org():
    imgs = jnp.zeros((1, 64, 64, 3))
    masks = jnp.ones((1, 64, 64, 1))
    coarse, refined = run(models.InpaintSANetOrg(), imgs, masks)
    assert float(jnp.abs(refined).max()) <= 1.0


@pytest.mark.slow
def test_discriminator_and_spectral_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
    net = models.InpaintSADiscriminator()
    variables = net.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables  # spectral-norm u/v state
    out = net.apply(variables, x)
    assert out.shape[0] == 2 and out.ndim == 2
    # train mode updates the power-iteration state
    out2, updates = net.apply(x=x, train=True, variables=variables, mutable=["batch_stats"])
    leaves0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves1 = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(leaves0, leaves1)
    )


def test_self_attention_shape(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    net = models.SelfAttention()
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == x.shape
    # gamma starts at 0 => output == input
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_registry_complete():
    avail = models.available()
    assert set(avail["flow"]) >= {
        "simple", "pwc", "pwcnet", "flownets", "flownetc", "flownet",
        "eflownet", "eflownet2",
    }
    assert set(avail["occ"]) >= {"simple", "occnets", "occnetc"}
    assert set(avail["flow_occ"]) >= {
        "simple", "flowoccnets", "flowoccnetc", "pwoc", "pwoc2", "flowoccnet",
    }
    assert set(avail["inpainting"]) >= {"simple", "gated", "gated_org"}
    assert set(avail["discriminator"]) >= {"gated", "gated_org"}
