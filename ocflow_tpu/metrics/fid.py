"""Fréchet Inception Distance + Inception Score
(reference inpainting_metrics/fid/fid.py, inception_score/inception_score.py).

Feature extraction runs on device in batches; mean/cov and the matrix
square root run on host numpy/scipy (exactly like the reference's
``scipy.linalg.sqrtm`` path, fid.py:123-174).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def activation_statistics(features: np.ndarray):
    """(mu, sigma) of [N, D] activations (reference fid.py:197-207)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (reference fid.py:123-174)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component in matrix sqrt")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def get_activations(extract_fn: Callable, imgs: np.ndarray, batch_size: int = 64):
    """Run the feature extractor over [N, H, W, 3] images in batches
    (reference fid.py:45-120). ``extract_fn(batch) -> [B, D]``."""
    outs = []
    for i in range(0, len(imgs), batch_size):
        outs.append(np.asarray(extract_fn(imgs[i : i + batch_size])))
    return np.concatenate(outs, axis=0)


def calculate_fid_given_imgs(
    imgs1: np.ndarray,
    imgs2: np.ndarray,
    extract_fn: Callable,
    batch_size: int = 64,
) -> float:
    """FID between two image sets [N, H, W, 3] in [-1, 1]
    (reference fid.py:219-240)."""
    a1 = get_activations(extract_fn, imgs1, batch_size)
    a2 = get_activations(extract_fn, imgs2, batch_size)
    m1, s1 = activation_statistics(a1)
    m2, s2 = activation_statistics(a2)
    return frechet_distance(m1, s1, m2, s2)


def inception_score(
    imgs: np.ndarray,
    logits_fn: Callable,
    batch_size: int = 32,
    splits: int = 10,
):
    """IS = exp(E[KL(p(y|x) || p(y))]) over split chunks
    (reference inception_score.py:12-68). ``logits_fn(batch) -> [B, C]``."""
    import scipy.special

    preds = []
    for i in range(0, len(imgs), batch_size):
        logits = np.asarray(logits_fn(imgs[i : i + batch_size]))
        preds.append(scipy.special.softmax(logits, axis=-1))
    preds = np.concatenate(preds, axis=0)
    n = len(preds)
    scores = []
    for k in range(splits):
        part = preds[k * (n // splits) : (k + 1) * (n // splits)]
        if len(part) == 0:
            continue
        py = np.mean(part, axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))
