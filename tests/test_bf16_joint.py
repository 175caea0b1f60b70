"""Mixed precision: the bf16 policy across the zoo + the joint
flow+occ+inpainting step (driver config #5: KITTI-2015, bf16).

Verifies the models.precision policy runs every model family's body in bf16
with fp32 master params, and that the joint step trains (finite, decreasing
loss) with sparse-valid KITTI-style ground truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ocflow_tpu import models
from ocflow_tpu.models.precision import apply_mixed, cast_floating
from ocflow_tpu.train import TrainState, steps_joint

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (run in CI/round-end)


def _batch(rng, b=2, h=64, w=64):
    imgs = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    flow = rng.uniform(-5, 5, (b, h, w, 2)).astype(np.float32)
    valid = (rng.uniform(size=(b, h, w, 1)) > 0.3).astype(np.float32)
    return {
        "images": jnp.asarray(imgs),
        "flow": jnp.asarray(flow * valid),
        "valid": jnp.asarray(valid),
    }


@pytest.mark.parametrize(
    "build, args",
    [
        (lambda: models.FlowNetS(), ("images",)),
        (lambda: models.SimpleFlowNet(), ("images",)),
        (lambda: models.SimpleOcclusionNet(), ("images",)),
        (lambda: models.FlowOccNetCV(), ("images",)),
        (lambda: models.InpaintingNet(), ("image3", "mask")),
    ],
)
def test_bf16_policy_runs_all_families(build, args):
    rng = np.random.default_rng(0)
    net = build()
    b = _batch(rng)
    call_args = []
    for a in args:
        if a == "images":
            call_args.append(b["images"])
        elif a == "image3":
            call_args.append(b["images"][..., :3])
        else:
            call_args.append(b["valid"])
    variables = net.init(jax.random.PRNGKey(0), *call_args)
    out = apply_mixed(net.apply, variables, *call_args, dtype=jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        assert leaf.dtype == jnp.float32  # policy returns fp32
        assert np.isfinite(np.asarray(leaf)).all()
    # and the body really ran in bf16: fp32 vs bf16 outputs must differ
    out32 = net.apply(variables, *call_args)
    diff = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(out32), leaves)
    )
    assert diff > 0.0


def test_cast_floating_preserves_non_float():
    tree = {"a": jnp.ones(3), "b": jnp.arange(3), "c": jnp.array([True])}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == tree["b"].dtype
    assert out["c"].dtype == jnp.bool_


def test_joint_step_bf16_trains():
    rng = np.random.default_rng(1)
    batch = _batch(rng)

    flow_occ = models.FlowOccNetCV()
    inpaint = models.InpaintingNet()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fo_vars = flow_occ.init(k1, batch["images"])
    inp_vars = inpaint.init(
        k2, batch["images"][..., :3], jnp.zeros_like(batch["valid"])
    )
    params = {"flow_occ": fo_vars["params"], "inpaint": inp_vars["params"]}
    stats = {
        "flow_occ": fo_vars.get("batch_stats", {}),
        "inpaint": inp_vars.get("batch_stats", {}),
    }
    state = TrainState.create(
        apply_fn=None, params=params, tx=optax.adam(1e-4), batch_stats=stats
    )
    train_step, eval_step = steps_joint.make_joint_step(
        {"dtype": "bfloat16"}, flow_occ.apply, inpaint.apply
    )

    state, m0 = train_step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(5):
        state, m = train_step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # master params stay fp32 under the bf16 policy
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    em = eval_step(state, batch)
    assert np.isfinite(float(em["epe"]))


def test_joint_step_fp32_matches_structure():
    """dtype=None path is a transparent pass-through (same metrics keys)."""
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    flow_occ = models.FlowOccNetCV()
    inpaint = models.InpaintingNet()
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    fo_vars = flow_occ.init(k1, batch["images"])
    inp_vars = inpaint.init(
        k2, batch["images"][..., :3], jnp.zeros_like(batch["valid"])
    )
    state = TrainState.create(
        apply_fn=None,
        params={"flow_occ": fo_vars["params"], "inpaint": inp_vars["params"]},
        tx=optax.adam(1e-4),
        batch_stats={
            "flow_occ": fo_vars.get("batch_stats", {}),
            "inpaint": inp_vars.get("batch_stats", {}),
        },
    )
    train_step, _ = steps_joint.make_joint_step(
        {}, flow_occ.apply, inpaint.apply
    )
    state, m = train_step(state, batch)
    assert set(m) == {"loss", "flow_l1", "occ_bce", "photometric", "reconst", "epe"}
    assert np.isfinite(float(m["loss"]))
