"""Inpainting reconstruction losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_l1_loss(img_completed: jax.Array, img: jax.Array, occ: jax.Array) -> jax.Array:
    """Supervised inpainting loss: L1 over the occluded region, normalized by
    hole area × channels (reference models/inpainting_model.py:72):
    ``sum(|Ic - I1| * occ) / (3 * sum(occ) + 1e-16)``."""
    return jnp.sum(jnp.abs(img_completed - img) * occ) / (3.0 * jnp.sum(occ) + 1e-16)


def recon_loss(
    imgs: jax.Array,
    recon_imgs: jax.Array,
    masks: jax.Array,
    coarse_imgs: jax.Array | None = None,
    rhole_alpha: float = 1.0,
    runhole_alpha: float = 1.0,
    chole_alpha: float = 1.0,
    cunhole_alpha: float = 1.0,
):
    """DeepFill-style per-image-mask-normalized L1
    (reference gated_conv_inpainting_net.py:563-589).

    Args:
        imgs: [B, H, W, C] ground truth.
        recon_imgs: refined output.
        masks: [B, H, W, 1], 1 = hole.
        coarse_imgs: optional coarse-stage output.

    Returns:
        (total, rhole, runhole) — hole/un-hole L1 each divided by the
        per-image mean mask value.
    """
    b = masks.shape[0]
    mask_mean = jnp.mean(masks.reshape(b, -1), axis=1).reshape(b, 1, 1, 1)
    rhole = jnp.mean(jnp.abs(imgs - recon_imgs) * masks / mask_mean)
    runhole = jnp.mean(jnp.abs(imgs - recon_imgs) * (1.0 - masks) / (1.0 - mask_mean))
    total = rhole_alpha * rhole + runhole_alpha * runhole
    if coarse_imgs is not None:
        chole = jnp.mean(jnp.abs(imgs - coarse_imgs) * masks / mask_mean)
        cunhole = jnp.mean(jnp.abs(imgs - coarse_imgs) * (1.0 - masks) / (1.0 - mask_mean))
        total = total + chole_alpha * chole + cunhole_alpha * cunhole
    return total, rhole, runhole
