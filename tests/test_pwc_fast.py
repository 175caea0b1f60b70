"""Fast (fused-kernel) FlowNetCV inference path == flax forward.

Runs the Pallas conv-group kernel in interpreter mode on the CPU test mesh;
the compiled path is exercised on real TPU by bench.py and the verify drive
scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocflow_tpu.models import FlowNetCV
from ocflow_tpu.models.pwc_fast import fast_apply
from ocflow_tpu.ops.pallas.conv_chain_kernel import (
    ConvSpec, conv_group, flat_to_nhwc, nhwc_to_flat)


def _conv_ref(x, w, b, d=1, act=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return jnp.where(y >= 0, y, 0.1 * y) if act else y


def test_conv_group_dense_chain_and_dilated():
    rng = np.random.default_rng(0)
    B, H, W = 2, 16, 128
    c0 = 20  # padded to 32 internally
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    w2a = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 24, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    c1 = _conv_ref(x, w1, b1)
    c2 = _conv_ref(jnp.concatenate([x, c1], -1),
                   jnp.concatenate([w2a, w2b], 2), b2)

    outs = conv_group(
        [nhwc_to_flat(x)], [[w1], [w2a, w2b]], [b1, b2],
        [ConvSpec(reads=(0,), cout=24, emit=True),
         ConvSpec(reads=(0, 1), cout=16, emit=True)],
        H, W, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[0], H, W, 24)), np.asarray(c1),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[1], H, W, 16)), np.asarray(c2),
        atol=1e-4)

    # dilated conv (context-network style)
    wd = jnp.asarray(rng.normal(size=(3, 3, 24, 32)) * 0.1, jnp.float32)
    bd = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    yd = _conv_ref(c1, wd, bd, d=4)
    (out,) = conv_group(
        [outs[0]], [[wd]], [bd],
        [ConvSpec(reads=(0,), cout=32, dilation=4, emit=True)],
        H, W, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(out, H, W, 32)), np.asarray(yd), atol=1e-4)


@pytest.mark.slow
def test_fast_apply_matches_flax():
    rng = np.random.default_rng(1)
    # smallest size meeting the fused-path constraints: W/4 >= 128,
    # H/4 divisible by th
    B, H, W = 1, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    ref_full, ref_quarter = net.apply(variables, x)
    fast_full, fast_quarter = fast_apply(variables, x, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast_quarter), np.asarray(ref_quarter), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(fast_full), np.asarray(ref_full), atol=2e-3)
