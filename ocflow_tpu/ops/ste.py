"""Straight-through estimators (reference models/model.py:1214, 1292;
models/networks/simple_flow_occ_net.py:137-139)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_threshold_ste(soft: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Binarize in the forward pass, identity gradient in the backward pass.

    ``(where(p > t, 1, 0) - p).detach() + p`` in the reference becomes
    ``stop_gradient(hard - soft) + soft``.
    """
    hard = jnp.where(soft > threshold, 1.0, 0.0).astype(soft.dtype)
    return jax.lax.stop_gradient(hard - soft) + soft
