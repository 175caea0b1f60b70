"""Binary classification losses for occlusion masks."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Elementwise-mean BCE over probabilities, clamped like
    ``F.binary_cross_entropy`` (log outputs clamped at -100 in torch; the
    epsilon clip here gives the same protection)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return jnp.mean(-(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)))


def focal_bce_loss(pred: jax.Array, target: jax.Array, gamma: float = 2.0, eps: float = 1e-7) -> jax.Array:
    """Focal BCE ``(1 - exp(-bce))^gamma * bce`` averaged
    (reference models/occlusion_model.py:55-62)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    pt = jnp.exp(-bce)
    return jnp.mean((1.0 - pt) ** gamma * bce)
