"""Photometric losses (reference models/model.py:27-51)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def robust_l1(x: jax.Array, alpha: float = 0.001) -> jax.Array:
    """Charbonnier penalty ``sqrt(x^2 + alpha^2)`` (models/model.py:27-35)."""
    return jnp.sqrt(x**2 + alpha**2)


def photometric_error(img_pred: jax.Array, img: jax.Array, occ: jax.Array | None = None) -> jax.Array:
    """Occlusion-normalized charbonnier photometric error.

    Args:
        img_pred, img: [B, H, W, 3] images.
        occ: optional [B, H, W, 1] occlusion mask; 1 = occluded (excluded).

    Returns:
        scalar. With a mask: ``sum(err * (1-occ)) / (sum(1-occ)*3 + 1e-16)``
        (models/model.py:37-46 — the *3 accounts for the RGB channels since
        the mask broadcasts over them).
    """
    error = robust_l1(img_pred - img)
    if occ is None:
        return jnp.mean(error)
    vis = 1.0 - occ
    return jnp.sum(error * vis) / (jnp.sum(vis) * 3.0 + 1e-16)
