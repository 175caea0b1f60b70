"""Loss library parity vs torch golden implementations of the reference math."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ocflow_tpu import losses
from ocflow_tpu.ops import hard_threshold_ste


def nchw(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def test_robust_l1():
    x = np.array([0.0, 1.0, -2.0], np.float32)
    got = np.asarray(losses.robust_l1(jnp.asarray(x)))
    want = np.sqrt(x**2 + 0.001**2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_photometric_error_unmasked(rng):
    a = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    b = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    got = float(losses.photometric_error(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch.mean(torch.sqrt((nchw(a) - nchw(b)) ** 2 + 0.001**2)))
    assert abs(got - want) < 1e-6


def test_photometric_error_masked(rng):
    a = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    b = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    occ = (rng.uniform(size=(2, 6, 6, 1)) > 0.5).astype(np.float32)
    got = float(losses.photometric_error(jnp.asarray(a), jnp.asarray(b), jnp.asarray(occ)))
    err = torch.sqrt((nchw(a) - nchw(b)) ** 2 + 0.001**2)
    tocc = nchw(occ)
    want = float(torch.sum(err * (1 - tocc)) / (torch.sum(1 - tocc) * 3 + 1e-16))
    assert abs(got - want) < 1e-6


def torch_first_order(img, flow, alpha=100.0):
    igx = img[:, :, :, 1:] - img[:, :, :, :-1]
    igy = img[:, :, 1:, :] - img[:, :, :-1, :]
    wx = torch.exp(-torch.mean((alpha * igx) ** 2, dim=1, keepdim=True))
    wy = torch.exp(-torch.mean((alpha * igy) ** 2, dim=1, keepdim=True))
    fgx = flow[:, :, :, 1:] - flow[:, :, :, :-1]
    fgy = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    r = lambda x: torch.sqrt(x**2 + 1e-6)
    return 0.5 * (torch.mean(wx * r(fgx)) + torch.mean(wy * r(fgy)))


def test_first_order_smoothness(rng):
    img = rng.standard_normal((2, 8, 9, 3)).astype(np.float32) * 0.01
    flow = rng.standard_normal((2, 8, 9, 2)).astype(np.float32)
    got = float(losses.first_order_smoothness_loss(jnp.asarray(img), jnp.asarray(flow)))
    want = float(torch_first_order(nchw(img), nchw(flow)))
    assert abs(got - want) < 1e-5


def test_second_order_smoothness_finite(rng):
    img = rng.standard_normal((2, 8, 9, 3)).astype(np.float32) * 0.01
    flow = rng.standard_normal((2, 8, 9, 2)).astype(np.float32)
    got = float(losses.second_order_smoothness_loss(jnp.asarray(img), jnp.asarray(flow)))
    assert np.isfinite(got) and got > 0


def test_edge_aware_smoothness_finite(rng):
    img = rng.standard_normal((1, 8, 8, 3)).astype(np.float32) * 0.01
    flow = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = float(losses.edge_aware_smoothness_loss(jnp.asarray(img), jnp.asarray(flow)))
    assert np.isfinite(got) and got > 0


def test_focal_bce_matches_torch(rng):
    pred = rng.uniform(0.01, 0.99, (2, 6, 6, 1)).astype(np.float32)
    target = (rng.uniform(size=(2, 6, 6, 1)) > 0.5).astype(np.float32)
    got = float(losses.focal_bce_loss(jnp.asarray(pred), jnp.asarray(target)))
    bce = F.binary_cross_entropy(nchw(pred), nchw(target), reduction="none")
    pt = torch.exp(-bce)
    want = float(((1 - pt) ** 2 * bce).mean())
    assert abs(got - want) < 1e-5


def test_recon_loss_matches_torch(rng):
    imgs = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    recon = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    masks = (rng.uniform(size=(2, 8, 8, 1)) > 0.7).astype(np.float32)
    total, rhole, runhole = losses.recon_loss(
        jnp.asarray(imgs), jnp.asarray(recon), jnp.asarray(masks)
    )
    ti, tr, tm = nchw(imgs), nchw(recon), nchw(masks)
    mv = tm.reshape(2, -1).mean(1).view(-1, 1, 1, 1)
    want_rhole = torch.mean(torch.abs(ti - tr) * tm / mv)
    want_runhole = torch.mean(torch.abs(ti - tr) * (1 - tm) / (1 - mv))
    assert abs(float(rhole) - float(want_rhole)) < 1e-5
    assert abs(float(runhole) - float(want_runhole)) < 1e-5
    assert abs(float(total) - float(want_rhole + want_runhole)) < 1e-5


def test_masked_l1(rng):
    a = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    b = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    occ = np.ones((1, 4, 4, 1), np.float32)
    got = float(losses.masked_l1_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(occ)))
    want = float(np.abs(a - b).sum() / (3 * occ.sum() + 1e-16))
    assert abs(got - want) < 1e-6


def test_gan_losses():
    pos = jnp.asarray([0.5, 2.0])
    neg = jnp.asarray([-0.5, -2.0])
    d = float(losses.sn_dis_loss(pos, neg))
    want = np.mean([0.5, 0.0]) + np.mean([0.5, 0.0])
    assert abs(d - want) < 1e-6
    g = float(losses.sn_gen_loss(neg))
    assert abs(g - 1.25) < 1e-6


def test_ste_forward_and_grad():
    x = jnp.asarray([0.2, 0.7])
    y = hard_threshold_ste(x)
    np.testing.assert_allclose(np.asarray(y), [0.0, 1.0])
    g = jax.grad(lambda v: jnp.sum(hard_threshold_ste(v) * jnp.asarray([2.0, 3.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, 3.0])
