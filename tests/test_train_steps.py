"""Train-step integration tests: loss decreases on synthetic data, and the
full step runs sharded over an 8-device CPU mesh."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import models, parallel
from ocflow_tpu.train import create_train_state, steps


def synthetic_batch(rng, b=8, h=32, w=32, shift=2):
    """img2 shifted right by `shift` px => GT flow u=+shift."""
    base = rng.uniform(-1, 1, (b, h, w + shift, 3)).astype(np.float32)
    img1 = base[:, :, shift:]
    img2 = base[:, :, : w]
    images = np.concatenate([img1, img2], axis=-1)
    flow = np.zeros((b, h, w, 2), np.float32)
    flow[..., 0] = shift
    return {"images": jnp.asarray(images), "flow": jnp.asarray(flow)}


@pytest.mark.slow
def test_supervised_flow_loss_decreases(rng):
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-3)
    )
    train_step, eval_step = steps.make_supervised_flow_step()
    first = float(eval_step(state, batch)["loss"])
    for _ in range(15):
        state, metrics = train_step(state, batch)
    last = float(eval_step(state, batch)["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.9, (first, last)


@pytest.mark.slow
def test_supervised_flow_occ_loss_decreases(rng):
    """FlowOccModel regime (reference flow_occ_model.py:48-55): joint
    L1(flow) + BCE(occ) on a net that returns (flow, occ)."""
    net = models.SimpleFlowOccNet()
    batch = synthetic_batch(rng)
    occ = np.zeros(batch["flow"].shape[:3] + (1,), np.float32)
    occ[:, :, -2:] = 1.0  # right edge leaves the frame under u=+shift
    batch["occ"] = jnp.asarray(occ)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-3)
    )
    train_step, eval_step = steps.make_supervised_flow_occ_step()
    first = eval_step(state, batch)
    for _ in range(15):
        state, metrics = train_step(state, batch)
    last = eval_step(state, batch)
    for k in ("loss", "flow_loss", "occ_loss"):
        assert np.isfinite(float(first[k])) and np.isfinite(float(last[k])), k
    assert float(last["loss"]) < float(first["loss"]) * 0.9, (first, last)


def test_unsupervised_flow_step_runs(rng):
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, eval_step = steps.make_unsupervised_flow_step(
        {"photo_weight": 4.0, "smooth1_weight": 0.5, "smooth2_weight": 0.0}
    )
    state, metrics = train_step(state, batch)
    for k in ("loss", "photometric", "smooth1", "flow_error"):
        assert np.isfinite(float(metrics[k])), k


def test_unsupervised_occ_aware_step(rng):
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    batch["occ"] = jnp.zeros_like(batch["flow"][..., :1])
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "occ_aware": True}
    )
    state, metrics = train_step(state, batch)
    for k in ("loss", "photometric", "photometric_occ", "occ_error"):
        assert np.isfinite(float(metrics[k])), k


def test_unsupervised_occ_aware_fb_consistency(rng):
    """occ_method='fb_consistency' swaps the range-map splat for the
    forward-backward round-trip check; the step must run and stay finite."""
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    batch["occ"] = jnp.zeros_like(batch["flow"][..., :1])
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "occ_aware": True,
         "occ_method": "fb_consistency"}
    )
    state, metrics = train_step(state, batch)
    for k in ("loss", "photometric", "photometric_occ", "occ_error"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.slow
def test_data_parallel_step_8_devices(rng):
    """The full unsupervised occ-aware train step, batch sharded over all 8
    virtual devices — the multi-chip path the driver dry-runs."""
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = parallel.make_mesh()
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng, b=8)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "occ_aware": True}
    )
    # replicate state, shard batch; GSPMD inserts the gradient psum
    state = jax.device_put(state, parallel.replicated(mesh))
    batch = parallel.shard_batch(batch, mesh)
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_pwc_unsupervised_step(rng):
    net = models.FlowNetCV()
    batch = synthetic_batch(rng, b=2, h=64, w=64)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "smooth1_weight": 0.5, "model": "pwc"}
    )
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["smooth1"]))


def test_occ_warmup_disables_masking(rng):
    """occ_warmup_steps: while state.step < K the photometric loss sees no
    occlusion mask (loss == the occ-free variant); after K it diverges."""
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    hp = {"photo_weight": 1.0, "occ_aware": True,
          "occ_method": "fb_consistency"}
    _, eval_warm = steps.make_unsupervised_flow_step(
        {**hp, "occ_warmup_steps": 100})
    _, eval_noocc = steps.make_unsupervised_flow_step({"photo_weight": 1.0})
    _, eval_mask = steps.make_unsupervised_flow_step(hp)
    m_warm = eval_warm(state, batch)
    m_noocc = eval_noocc(state, batch)
    m_mask = eval_mask(state, batch)
    np.testing.assert_allclose(
        float(m_warm["photometric"]), float(m_noocc["photometric"]),
        rtol=1e-5)
    assert float(m_mask["photometric"]) != float(m_noocc["photometric"])


@pytest.mark.slow
def test_pwc_occ_aware_quarter_resolution(rng):
    """occ_resolution='quarter' computes occlusion from the 1/4-res flows
    and nearest-upsamples; the step runs finitely for both occ methods."""
    net = models.FlowNetCV()
    batch = synthetic_batch(rng, b=2, h=64, w=64)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    for method in ("range_map", "fb_consistency"):
        train_step, _ = steps.make_unsupervised_flow_step(
            {"photo_weight": 1.0, "occ_aware": True, "model": "pwc",
             "occ_method": method, "occ_resolution": "quarter"}
        )
        _, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"])), method


def test_unsupervised_photo_resolution_half(rng):
    """photo_resolution='half'/'quarter' computes the photometric term on
    area-downsampled images with rescaled flow (extension; default 'full'
    is reference parity). Each resolution must run finitely with nonzero
    grads, and the losses must stay the same order of magnitude (the
    absolute level shrinks with resolution on noise-like images because
    area downsampling reduces contrast)."""
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    outs = {}
    for res in ("full", "half", "quarter"):
        train_step, _ = steps.make_unsupervised_flow_step(
            {"photo_weight": 1.0, "occ_aware": True,
             "occ_method": "fb_consistency", "photo_resolution": res}
        )
        new_state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"])), res
        assert np.isfinite(float(metrics["photometric_occ"])), res
        g = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: np.abs(np.asarray(a - b)).sum(),
                new_state.params, state.params))
        assert sum(float(v) for v in g) > 0, res
        outs[res] = float(metrics["photometric"])
    # the losses are computed on different grids but measure the same
    # misalignment; same order of magnitude, monotone in resolution on
    # noise images
    assert 0.1 * outs["full"] < outs["half"] < 4.0 * outs["full"]
    assert 0.05 * outs["full"] < outs["quarter"] < 4.0 * outs["full"]


@pytest.mark.slow
def test_fused_both_train_step_mesh_equality(rng):
    """VERDICT r4 #6: the full fast_forward='both' occ-aware train step
    under a >1-device mesh == the single-device step (grads + metrics +
    Adam update), on the REAL kernel path (interpret mode via the
    INTERPRET_ON_CPU hook). The batch holds IDENTICAL examples so the
    per-shard normalize_features moments (documented deviation,
    pwc_fast.py fast_apply_sharded) coincide with the full-batch moments
    and exact equality is the correct expectation — what's under test is
    the shard_map replicated-params gradient psum and the metric means."""
    from ocflow_tpu.models import pwc_fast
    from ocflow_tpu.parallel.mesh import make_mesh

    B, H, W = 2, 64, 512
    net = models.FlowNetCV()
    one = rng.uniform(-1, 1, (1, H, W, 6)).astype(np.float32)
    images = jnp.asarray(np.repeat(one, B, axis=0))
    batch = {"images": images,
             "occ": jnp.zeros((B, H, W, 1), jnp.float32)}
    state = create_train_state(
        net, jax.random.PRNGKey(0), images[:1], optax.adam(1e-4))
    hp = {"photo_weight": 1.0, "smooth1_weight": 0.1, "occ_aware": True,
          "occ_method": "fb_consistency", "model": "pwc",
          "fast_forward": "both"}

    mesh = make_mesh((B,), ("data",), jax.devices()[:B])
    single = make_mesh((1,), ("data",), jax.devices()[:1])

    pwc_fast.INTERPRET_ON_CPU = True
    try:
        step_m, _ = steps.make_unsupervised_flow_step({**hp, "_fast_mesh": mesh})
        step_s, _ = steps.make_unsupervised_flow_step({**hp, "_fast_mesh": single})
        st_m, metrics_m = step_m(state, batch)
        st_s, metrics_s = step_s(state, batch)
    finally:
        pwc_fast.INTERPRET_ON_CPU = False

    for k in metrics_s:
        np.testing.assert_allclose(
            float(metrics_m[k]), float(metrics_s[k]), rtol=2e-4, atol=1e-6,
            err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(st_m.params),
                    jax.tree_util.tree_leaves(st_s.params)):
        # atol covers Adam's amplification of f32 reduction-order noise on
        # near-zero grads (observed: 1 elem / 650k at 1.3e-4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-4)


def test_unsupervised_occ_half_resolution(rng):
    """occ_resolution='half': occlusion splat on the 2x area-downsampled
    full-res flow, nearest-upsampled; the step runs and stays finite."""
    net = models.SimpleFlowNet()
    batch = synthetic_batch(rng)
    batch["occ"] = jnp.zeros_like(batch["flow"][..., :1])
    state = create_train_state(
        net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4)
    )
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "occ_aware": True, "occ_resolution": "half"}
    )
    state, metrics = train_step(state, batch)
    for k in ("loss", "photometric", "photometric_occ", "occ_error"):
        assert np.isfinite(float(metrics[k])), k
