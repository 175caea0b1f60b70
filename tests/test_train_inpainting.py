"""Inpainting / GAN / two-stage train-step tests on synthetic data."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import models
from ocflow_tpu.data.occlusion import static_random_occlusion
from ocflow_tpu.losses.perceptual import VGG16Features, init_vgg16, vgg_perceptual_loss
from ocflow_tpu.train import create_train_state
from ocflow_tpu.train.state import TrainState
from ocflow_tpu.train import steps_inpainting, steps_two_stage

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)


def inpaint_batch(rng, b=2, h=64, w=64):
    imgs = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    occs = np.stack(
        [static_random_occlusion(rng, h, w, 0.4) for _ in range(b)]
    )
    return {
        "image": jnp.asarray(imgs),
        "occ": jnp.asarray(occs),
        "occluded": jnp.asarray(imgs * (1 - occs)),
    }


def flow_batch(rng, b=2, h=32, w=32):
    imgs = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    return {
        "images": jnp.asarray(imgs),
        "flow": jnp.zeros((b, h, w, 2)),
        "occ": jnp.asarray(
            np.stack([static_random_occlusion(rng, h, w, 0.3) for _ in range(b)])
        ),
    }


def test_supervised_inpainting_step(rng):
    net = models.InpaintingNet()
    batch = flow_batch(rng, h=64, w=64)
    variables_in = (batch["images"][..., :3], batch["occ"])
    state = create_train_state(
        net, jax.random.PRNGKey(0), variables_in[0], optax.adam(1e-4),
        masks=variables_in[1],
    )
    train_step, eval_step = steps_inpainting.make_supervised_inpainting_step()
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_inpainting_stage_pixelwise(rng):
    net = models.InpaintingNet()
    batch = inpaint_batch(rng)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["image"], optax.adam(1e-3),
        masks=batch["occ"],
    )
    train_step, eval_step = steps_inpainting.make_inpainting_stage_step(
        {"loss_type": "pixel-wise"}
    )
    # compare train-mode losses (eval-mode BN running stats are still cold
    # after a handful of steps)
    hist = []
    for _ in range(8):
        state, metrics = train_step(state, batch)
        hist.append(float(metrics["loss"]))
    assert np.isfinite(hist[-1]) and hist[-1] < hist[0]


@pytest.mark.slow
def test_inpainting_stage_vgg(rng):
    net = models.InpaintingNet()
    batch = inpaint_batch(rng, h=64, w=64)
    vgg_net, vgg_vars = init_vgg16(jax.random.PRNGKey(1))
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["image"], optax.adam(1e-4),
        masks=batch["occ"],
    )
    train_step, eval_step = steps_inpainting.make_inpainting_stage_step(
        {"loss_type": "vgg", "reconst_weight": 1.0}, vgg=(vgg_net.apply, vgg_vars)
    )
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["vgg_loss"]))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_gan_inpainting_step(rng):
    gen = models.InpaintSANet()
    dis = models.InpaintSADiscriminator()
    batch = inpaint_batch(rng)
    gen_state = create_train_state(
        gen, jax.random.PRNGKey(0), batch["image"], optax.adam(1e-4),
        masks=batch["occ"],
    )
    dis_in = jnp.concatenate([batch["image"], batch["occ"]], axis=-1)
    dis_state = create_train_state(
        dis, jax.random.PRNGKey(1), dis_in, optax.adam(4e-4)
    )
    train_step = steps_inpainting.make_gan_inpainting_step(
        {"loss_type": "pixel-wise"}
    )
    g0 = [np.asarray(l) for l in jax.tree_util.tree_leaves(gen_state.params)]
    gen_state, dis_state, metrics = train_step(gen_state, dis_state, batch)
    for k in ("whole_loss", "d_loss", "g_loss", "content_loss"):
        assert np.isfinite(float(metrics[k])), k
    g1 = jax.tree_util.tree_leaves(gen_state.params)
    # most generator params update (SelfAttention convs have zero grad while
    # gamma == 0, so not all leaves move)
    changed = sum(
        int(not np.allclose(a, np.asarray(b))) for a, b in zip(g0, g1)
    )
    assert changed > len(g0) * 0.9, f"only {changed}/{len(g0)} leaves updated"


def test_gated_generator_remat_exact(rng):
    """InpaintSANet(remat=True) is bit-identical to remat=False in outputs
    and grads (jax.checkpoint changes memory, not math) — the flag is what
    lets full-res GAN training fit HBM (gated_conv.py GatedConv.remat)."""
    batch = inpaint_batch(rng, h=32, w=32)
    imgs, masks = batch["image"], batch["occ"]
    ref = models.InpaintSANet()
    rem = models.InpaintSANet(remat=True)
    v = ref.init(jax.random.PRNGKey(0), imgs, masks)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), v["params"],
        rem.init(jax.random.PRNGKey(0), imgs, masks)["params"]))

    def loss(m, p):
        c, r = m.apply({**v, "params": p}, imgs, masks, train=False)
        return jnp.mean(jnp.abs(r - imgs)) + jnp.mean(jnp.abs(c - imgs))

    la, ga = jax.value_and_grad(lambda p: loss(ref, p))(v["params"])
    lb, gb = jax.value_and_grad(lambda p: loss(rem, p))(v["params"])
    assert float(la) == float(lb)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ga, gb)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    gnorm = sum(float(jnp.sum(x ** 2))
                for x in jax.tree_util.tree_leaves(ga)) ** 0.5
    assert gnorm > 0.0


@pytest.mark.slow
def test_two_stage_step(rng):
    flow_net = models.SimpleFlowNet()
    occ_net = models.SimpleOcclusionNet()
    inp_net = models.InpaintingNet()
    batch = flow_batch(rng)
    imgs = batch["images"]
    flow_vars = flow_net.init(jax.random.PRNGKey(0), imgs)
    inp_vars = inp_net.init(
        jax.random.PRNGKey(1), imgs[..., :3], batch["occ"]
    )
    state = create_train_state(occ_net, jax.random.PRNGKey(2), imgs, optax.adam(1e-3))
    train_step, eval_step = steps_two_stage.make_two_stage_step(
        {"reconst_weight": 1.0, "smoothness_weight": 0.1},
        flow_apply=flow_net.apply,
        inpaint_apply=inp_net.apply,
    )
    frozen = {"flow": flow_vars, "inpaint": inp_vars}
    state, metrics = train_step(state, frozen, batch)
    for k in ("loss", "photometric", "reconst", "smoothness", "bce_loss"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.slow
def test_two_stage_gc_step_with_unfreeze(rng):
    occ_net = models.SimpleOcclusionNet()
    inp_net = models.InpaintingNet()
    batch = flow_batch(rng)
    imgs = batch["images"]
    occ_vars = occ_net.init(jax.random.PRNGKey(0), imgs)
    inp_vars = inp_net.init(jax.random.PRNGKey(1), imgs[..., :3], batch["occ"])

    params = {"occ": occ_vars["params"], "inpaint": inp_vars["params"]}
    batch_stats = {
        "occ": occ_vars.get("batch_stats", {}),
        "inpaint": inp_vars.get("batch_stats", {}),
    }
    tx = steps_two_stage.make_two_stage_gc_optimizer(1e-3, 1e-4, unfreeze_step=2)
    state = TrainState.create(
        apply_fn=None, params=params, tx=tx, batch_stats=batch_stats
    )
    train_step, eval_step = steps_two_stage.make_two_stage_gc_step(
        {"loss_type": "pixel-wise", "photo_weight": 1.0},
        occ_apply=occ_net.apply,
        inpaint_apply=inp_net.apply,
    )
    inp0 = jax.tree_util.tree_leaves(state.params["inpaint"])[0]
    state, m1 = train_step(state, batch)  # step 0 -> inpaint frozen
    inp1 = jax.tree_util.tree_leaves(state.params["inpaint"])[0]
    np.testing.assert_allclose(np.asarray(inp0), np.asarray(inp1))
    occ0 = jax.tree_util.tree_leaves(state.params["occ"])[0]

    state, _ = train_step(state, batch)  # step 1 -> still frozen
    state, _ = train_step(state, batch)  # step 2 -> unfrozen
    inp3 = jax.tree_util.tree_leaves(state.params["inpaint"])[0]
    assert not np.allclose(np.asarray(inp1), np.asarray(inp3))
    for k in ("loss", "photometric", "reconst", "pixelwise", "bce_loss"):
        assert np.isfinite(float(m1[k])), k


def test_vgg_perceptual_loss_basic(rng):
    net, variables = init_vgg16(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    same = float(vgg_perceptual_loss(net.apply, variables, a, a))
    diff = float(vgg_perceptual_loss(net.apply, variables, a, b))
    assert same < 1e-6
    assert diff > 0
