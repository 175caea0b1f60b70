"""warp() parity vs torch.nn.functional.grid_sample (the reference's kernel)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ocflow_tpu.ops import warp, flow_to_warp


def torch_warp(img_nchw, flow_nchw, align_corners):
    """Reference semantics: mesh grid + flow, normalized by (W-1, H-1)."""
    B, C, H, W = img_nchw.shape
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flow_nchw
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    return F.grid_sample(img_nchw, vgrid, align_corners=align_corners)


@pytest.mark.parametrize("align_corners", [True, False])
# C=3 exercises the 4C-packed gather, C=16 the windowed [2,2,C] gather
# (ops/warp.py:_gather_2x2 switches at _PACK_C_MAX=8)
@pytest.mark.parametrize("C", [3, 16])
def test_warp_matches_grid_sample(rng, align_corners, C):
    B, H, W = 2, 13, 17
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * 3.0).astype(np.float32)

    ours = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow), align_corners=align_corners))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    golden = torch_warp(timg, tflow, align_corners).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-5)


def test_warp_identity_flow(rng):
    img = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = np.asarray(warp(jnp.asarray(img), jnp.zeros((1, 8, 8, 2), np.float32)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_integer_shift(rng):
    img = rng.standard_normal((1, 8, 10, 1)).astype(np.float32)
    flow = np.zeros((1, 8, 10, 2), np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    out = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-2, 0], img[0, :, 2:, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, -2:, 0], 0.0, atol=1e-6)  # zero pad


def test_warp_with_mask(rng):
    img = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 1] = 100.0  # everything out of bounds
    out, mask = warp(jnp.asarray(img), jnp.asarray(flow), with_mask=True)
    assert float(jnp.sum(mask)) == 0.0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flow_to_warp_grid():
    f = jnp.zeros((1, 3, 4, 2))
    coords = np.asarray(flow_to_warp(f))
    assert coords[0, 1, 2, 0] == 2.0  # x
    assert coords[0, 1, 2, 1] == 1.0  # y


def test_warp_gradients_flow():
    import jax

    img = jnp.ones((1, 6, 6, 1))
    flow = jnp.zeros((1, 6, 6, 2)) + 0.3

    def loss(fl):
        return jnp.sum(warp(img, fl) ** 2)

    g = jax.grad(loss)(flow)
    assert np.all(np.isfinite(np.asarray(g)))


def test_warp_gather_formulations_equal(rng):
    """The packed [1,1,4C] and windowed [2,2,C] gathers pick identical
    elements: warping a C=12 map must equal four C=3 warps of its
    channel slices (different _gather_2x2 branches, same math)."""
    img = jnp.asarray(rng.standard_normal((2, 12, 16, 12)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((2, 12, 16, 2)) * 2).astype(np.float32))
    whole = warp(img, flow)
    parts = jnp.concatenate(
        [warp(img[..., i : i + 3], flow) for i in range(0, 12, 3)], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(whole), np.asarray(parts), atol=1e-6, rtol=0
    )


def test_warp_grad_img_false_same_dflow(rng):
    """grad_img=False skips the dimg splat but must leave dL/dflow intact."""
    img = jnp.asarray(rng.standard_normal((2, 12, 16, 3)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((2, 12, 16, 2)) * 2).astype(np.float32))

    def loss(f, gi):
        return jnp.sum(warp(img, f, grad_img=gi) ** 2)

    g_ref = jax.grad(lambda f: loss(f, True))(flow)
    g_fast = jax.grad(lambda f: loss(f, False))(flow)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
    # and dimg really is zeroed (not merely discarded)
    dimg = jax.grad(
        lambda i: jnp.sum(warp(i, flow, grad_img=False) ** 2))(img)
    np.testing.assert_allclose(np.asarray(dimg), 0.0, atol=0)


def test_warp_planar_tuple_flow_matches_stacked(rng):
    """The planar (u, v) flow form (ADVICE r4: previously unexercised) is
    semantically identical to the stacked [B,H,W,2] form, values and
    flow gradients, under both align_corners modes."""
    img = jnp.asarray(rng.standard_normal((2, 12, 16, 3)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((2, 12, 16, 2)) * 2).astype(np.float32))
    u, v = flow[..., 0], flow[..., 1]
    for ac in (True, False):
        np.testing.assert_array_equal(
            np.asarray(warp(img, (u, v), align_corners=ac)),
            np.asarray(warp(img, flow, align_corners=ac)))

    def loss_tuple(uu, vv):
        return jnp.sum(warp(img, (uu, vv)) ** 2)

    def loss_stacked(f):
        return jnp.sum(warp(img, f) ** 2)

    gu, gv = jax.grad(loss_tuple, argnums=(0, 1))(u, v)
    g = jax.grad(loss_stacked)(flow)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(g[..., 0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(g[..., 1]),
                               atol=1e-6, rtol=1e-6)
