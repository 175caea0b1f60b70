"""Repair-semantics tests for the reference's broken networks.

The zoo shape tests prove constructibility; these prove the *documented
repair intent* (VERDICT r1 weak #8):

- FlowOccNetCV/CV2's occlusion gating multiplies warped features BEFORE the
  correlation (reference cost_volume_flow_occ_net.py:205,222,239,256);
- FlowNetC's repaired correlation is max_disp=10 -> 441 channels, matching
  the reference's conv3_1 expecting 473 = 441 + 32 inputs (flow_net_c.py:25);
- FlowOccNetCV2's towers are genuinely separate: the last level's occ tower
  cannot influence the flow output (the reference's forward never ran —
  cost_volume_flow_occ_net.py:308 vs 474).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ocflow_tpu.models.flow_occ_nets import (
    FlowOccNetCV2,
    occlusion_gated_cost_volume,
)
from ocflow_tpu.models.flow_net_s import FlowNetC
from ocflow_tpu.ops.cost_volume import cost_volume
import pytest

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)


def test_occ_gating_multiplies_before_correlation():
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    warped = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    occ = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 1)), jnp.float32)

    got = occlusion_gated_cost_volume(f1, warped, occ, 2)
    want = jax.nn.leaky_relu(
        cost_volume(f1, warped * occ, 2), negative_slope=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # gate of zero kills the correlation entirely (leaky_relu(0) = 0)
    zero = occlusion_gated_cost_volume(f1, warped, jnp.zeros_like(occ), 2)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-7)

    # the gate acts on the WARPED features, not f1: scaling occ by c scales
    # the pre-activation correlation by c
    double = occlusion_gated_cost_volume(f1, warped, 2.0 * occ, 2)
    pre = cost_volume(f1, warped * occ, 2)
    np.testing.assert_allclose(
        np.asarray(double),
        np.asarray(jax.nn.leaky_relu(2.0 * pre, negative_slope=0.1)),
        atol=1e-5)


def test_flownetc_correlation_is_441ch():
    net = FlowNetC(use_bn=False)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
    p = variables["params"]
    # the conv after [redir(32) | corr] must see 473 input channels
    shapes = [a.shape for a in jax.tree_util.tree_leaves(p)]
    found = [s for s in shapes if len(s) == 4 and s[2] == 473]
    assert found, f"no conv with 473 input channels: {shapes}"


def test_flowoccnetcv2_towers_are_separate():
    net = FlowOccNetCV2()
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 64, 128, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    flow0, occ0 = net.apply(variables, x)

    # perturb the LAST level's occ tower (ConvBlock_5..9 + PredictOcc of the
    # final _SeparateFlowOccDecoder): the flow output must be unchanged, the
    # occ output must change. (With the reference's aliased towers this
    # cannot hold.)
    p = jax.tree_util.tree_map(lambda a: a, variables)  # shallow copy
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    dec_names = sorted({k[0] for k in flat if k[0].startswith("_SeparateFlowOccDecoder")},
                       key=lambda s: int(s.split("_")[-1]))
    last = dec_names[-1]
    occ_tower = [f"ConvBlock_{i}" for i in range(5, 10)] + ["PredictOcc_0"]
    bumped = {
        k: (v + 0.5 if k[0] == last and k[1] in occ_tower else v)
        for k, v in flat.items()
    }
    assert any(k[0] == last and k[1] in occ_tower for k in flat)
    p = {"params": flax.traverse_util.unflatten_dict(bumped)}
    flow1, occ1 = net.apply(p, x)

    np.testing.assert_allclose(np.asarray(flow0), np.asarray(flow1), atol=1e-6)
    assert float(jnp.abs(occ0 - occ1).max()) > 1e-4
