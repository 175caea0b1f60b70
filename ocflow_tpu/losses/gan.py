"""SN-PatchGAN hinge losses (reference gated_conv_inpainting_net.py:539-561)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sn_dis_loss(pos: jax.Array, neg: jax.Array, weight: float = 1.0) -> jax.Array:
    """Hinge discriminator loss ``mean(relu(1-pos)) + mean(relu(1+neg))``."""
    return weight * (
        jnp.mean(jax.nn.relu(1.0 - pos)) + jnp.mean(jax.nn.relu(1.0 + neg))
    )


def sn_gen_loss(neg: jax.Array, weight: float = 1.0) -> jax.Array:
    """Hinge generator loss ``-mean(neg)``."""
    return -weight * jnp.mean(neg)
