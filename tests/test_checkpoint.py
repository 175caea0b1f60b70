"""Orbax checkpoint round trips + staged-training subtree splicing."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import models
from ocflow_tpu.train import create_train_state
from ocflow_tpu.utils import checkpoint as ckpt


def test_save_load_pytree(tmp_path, rng):
    tree = {
        "params": {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))},
        "step": jnp.asarray(3),
    }
    path = str(tmp_path / "ck")
    ckpt.save_pytree(path, tree)
    back = ckpt.load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]), np.asarray(tree["params"]["w"]))
    assert int(back["step"]) == 3


@pytest.mark.slow
def test_load_subtree_for_staged_training(tmp_path, rng):
    """Stage-2 splices stage-1's flow params (reference model.py:948-952)."""
    net = models.SimpleFlowNet()
    x = jnp.zeros((1, 32, 32, 6))
    state = create_train_state(net, jax.random.PRNGKey(0), x, optax.adam(1e-3))
    path = str(tmp_path / "stage1")
    ckpt.save_pytree(path, state)
    params = ckpt.load_subtree(
        path, "params", template={"params": state.params, "batch_stats": state.batch_stats,
                                  "step": state.step, "opt_state": state.opt_state}
    )
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_checkpoint_manager_best(tmp_path, rng):
    net = models.SimpleFlowNet()
    x = jnp.zeros((1, 32, 32, 6))
    state = create_train_state(net, jax.random.PRNGKey(0), x, optax.adam(1e-3))
    mgr = ckpt.CheckpointManager(str(tmp_path / "mgr"), max_to_keep=1)
    mgr.save(0, state, monitored_loss=1.0)
    mgr.save(1, state.replace(step=state.step + 1), monitored_loss=0.5)
    mgr.save(2, state.replace(step=state.step + 2), monitored_loss=0.9)
    assert mgr.best_step == 1
    restored = mgr.restore(template=state)
    assert int(restored["step"]) == 1


def test_load_subtree_from_larger_checkpoint(tmp_path, rng):
    """A checkpoint larger than the template (full TrainState export, e.g.
    the GAN generator checkpoint) must still yield its params subtree:
    load_subtree falls back to a raw restore on structure mismatch."""
    w = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    full = {
        "step": jnp.asarray(7),
        "params": {"Conv_0": {"kernel": w}},
        "batch_stats": {},
        "opt_state": {"m": jnp.zeros((4,), jnp.float32)},
    }
    path = str(tmp_path / "gan_gen")
    ckpt.save_pytree(path, full)
    params = ckpt.load_subtree(
        path, "params",
        template={"params": {"Conv_0": {"kernel": jnp.zeros_like(w)}}})
    np.testing.assert_array_equal(np.asarray(params["Conv_0"]["kernel"]),
                                  np.asarray(w))
