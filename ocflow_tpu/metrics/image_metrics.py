"""Image quality metrics: PSNR + windowed SSIM
(reference inpainting_metrics/psnr/psnr.py, inpainting_metrics/ssim/ssim.py).

On-device jnp. Inputs are [-1, 1] images (the framework's native range);
both metrics denormalize to the 255 scale exactly like the reference drivers
(inpainting_metrics/__init__.py:58-81).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1, img2, pixel_max: float = 255.0):
    """PSNR on [-1,1] images, compared at 255 scale
    (reference psnr.py:4-11, __init__.py:77)."""
    a = (img1 + 1.0) * 127.5
    b = (img2 + 1.0) * 127.5
    mse = jnp.mean((a - b) ** 2)
    return jnp.where(
        mse == 0, jnp.inf, 20.0 * jnp.log10(pixel_max / jnp.sqrt(mse))
    )


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def ssim(img1, img2, window_size: int = 4, sigma: float = 1.5):
    """Windowed SSIM with a Gaussian kernel applied per channel
    (reference ssim.py:7-75; the driver uses window_size=4,
    __init__.py:23). Inputs [B, H, W, C] in [-1, 1] — compared in [0, 1]
    like the reference driver (denormalized /255)."""
    img1 = (img1 + 1.0) / 2.0
    img2 = (img2 + 1.0) / 2.0
    w = jnp.asarray(_gaussian_window(window_size, sigma))[..., None, None]
    c = img1.shape[-1]
    kernel = jnp.tile(w, (1, 1, 1, c))  # depthwise: HWIO with I=1, O=C

    def conv(x):
        # precision=HIGHEST is load-bearing on TPU: the default bf16
        # multiplies make sigma = E[x^2] - mu^2 cancel catastrophically
        # (negative variances ~1e-2), which flips SSIM denominators and
        # produced impossible scores > 1 on real 448x1024 evals (round-5
        # bug, caught by the absolute inpainting-quality run; CPU was
        # always fp32-exact, matching the torch reference to 1e-4)
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    sigma1 = conv(img1 * img1) - mu1_sq
    sigma2 = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )
    return jnp.mean(ssim_map)
