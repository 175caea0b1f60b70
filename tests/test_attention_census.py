"""Blockwise attention exactness + census loss behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from ocflow_tpu.losses.photometric import census_loss, census_transform
from ocflow_tpu.ops.attention import blockwise_attention, dense_attention


def test_blockwise_attention_exact(rng):
    b, n, d, c = 2, 512, 16, 32
    q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    want = np.asarray(dense_attention(q, k, v))
    got = np.asarray(blockwise_attention(q, k, v, block_size=128))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_blockwise_attention_grad(rng):
    b, n, d, c = 1, 256, 8, 8
    q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))

    # the flash custom VJP must match dense autodiff for ALL of q, k, v
    gd = jax.grad(
        lambda a: jnp.sum(dense_attention(*a) ** 2))((q, k, v))
    gb = jax.grad(
        lambda a: jnp.sum(blockwise_attention(*a, 64) ** 2))((q, k, v))
    for got, want, name in zip(gb, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}")


def test_census_transform_shapes(rng):
    img = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    t = census_transform(img, 7)
    assert t.shape == (2, 16, 16, 49)
    assert float(jnp.max(jnp.abs(t))) <= 1.0


def test_census_loss_discriminates(rng):
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    same = float(census_loss(img1, img1))
    # census is invariant to global brightness shifts
    bright = float(census_loss(img1, jnp.clip(img1 + 0.2, -1, 1)))
    other = float(
        census_loss(img1, jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)))
    )
    assert same < 0.01
    assert bright < other * 0.8
    assert other > same


def test_census_loss_occlusion_masked(rng):
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    occ_all = jnp.ones((1, 32, 32, 1))
    assert float(census_loss(img1, img2, occ_all)) < 1e-12
