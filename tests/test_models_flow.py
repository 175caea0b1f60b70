"""Shape / jit / gradient tests for the flow model zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import models


def init_and_apply(net, x, train=False):
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    if train and "batch_stats" in variables:
        out, _ = net.apply(x=x, train=True, variables=variables, mutable=["batch_stats"])
        return out
    return net.apply(variables, x, train=train)


@pytest.mark.slow
def test_simple_flow_net_shapes():
    net = models.SimpleFlowNet()
    x = jnp.zeros((2, 64, 128, 6))
    out = init_and_apply(net, x)
    assert out.shape == (2, 64, 128, 2)


def test_simple_flow_net_train_mode_batch_stats():
    net = models.SimpleFlowNet()
    x = jnp.ones((1, 32, 32, 6))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out, updates = net.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 2)
    assert "batch_stats" in updates


@pytest.mark.slow
def test_pwc_shapes_and_scaling():
    net = models.FlowNetCV()
    x = jnp.zeros((1, 64, 128, 6))
    flow1, flow2 = init_and_apply(net, x)
    assert flow1.shape == (1, 64, 128, 2)
    assert flow2.shape == (1, 16, 32, 2)


@pytest.mark.slow
def test_pwc_jit_and_grad():
    net = models.FlowNetCV()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(params, x):
        f1, f2 = net.apply({"params": params}, x)
        return jnp.mean(f1**2) + jnp.mean(f2**2)

    g = jax.grad(loss_fn)(variables["params"], x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


@pytest.mark.parametrize("key", ["flownets", "flownetc"])
def test_flownet_s_c_shapes(key):
    net = models.build("flow", key)
    x = jnp.zeros((1, 64, 64, 6))
    out = init_and_apply(net, x)
    assert out.shape == (1, 64, 64, 2)


def test_registry_dispatch():
    assert "pwc" in models.available("flow")
    with pytest.raises(ValueError, match="Unsupported model"):
        models.build("flow", "nope")
