"""Photometric losses (reference models/model.py:27-51)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def robust_l1(x: jax.Array, alpha: float = 0.001) -> jax.Array:
    """Charbonnier penalty ``sqrt(x^2 + alpha^2)`` (models/model.py:27-35)."""
    return jnp.sqrt(x**2 + alpha**2)


def census_transform(img: jax.Array, patch_size: int = 7) -> jax.Array:
    """Soft census transform: per-pixel patch of normalized differences to
    the center intensity (UFlow/DDFlow recipe — an extension beyond the
    reference, which only ships charbonnier photometric; the driver-set
    north star lists photometric+census, BASELINE.json).

    Args:
        img: [B, H, W, 3] in [-1, 1].
    Returns:
        [B, H, W, patch_size^2] census features.
    """
    # grayscale in [0, 255] like the original census implementations
    gray = jnp.mean((img + 1.0) * 127.5, axis=-1, keepdims=True)
    p = patch_size
    # extract p*p neighborhoods via depthwise "identity" patches
    patches = jax.lax.conv_general_dilated_patches(
        gray,
        filter_shape=(p, p),
        window_strides=(1, 1),
        padding=[(p // 2, p // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H, W, p*p]
    diff = patches - gray
    return diff / jnp.sqrt(0.81 + diff**2)


def census_loss(
    img1: jax.Array,
    img2_warped: jax.Array,
    occ: jax.Array | None = None,
    patch_size: int = 7,
) -> jax.Array:
    """Soft-hamming census distance, occlusion-masked and border-weighted."""
    t1 = census_transform(img1, patch_size)
    t2 = census_transform(img2_warped, patch_size)
    sq = (t1 - t2) ** 2
    ham = jnp.sum(sq / (0.1 + sq), axis=-1, keepdims=True)
    # zero weight in the patch border where the transform is invalid
    b, h, w, _ = img1.shape
    pad = patch_size // 2
    mask = jnp.zeros((1, h, w, 1), img1.dtype)
    mask = mask.at[:, pad : h - pad, pad : w - pad].set(1.0)
    if occ is not None:
        mask = mask * (1.0 - occ)
    # float32 accumulation (see photometric_error)
    num = jnp.sum((robust_l1(ham) * mask).astype(jnp.float32))
    return num / (jnp.sum(mask.astype(jnp.float32)) + 1e-16)


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
    # elementwise error in the input dtype (bf16-cheap under mixed
    # precision), accumulation in float32 — a bf16 sum over ~10M pixels
    # loses the loss signal entirely (8-bit mantissa)
    error = robust_l1(img_pred - img).astype(jnp.float32)
    if occ is None:
        return jnp.mean(error)
    vis = (1.0 - occ).astype(jnp.float32)
    return jnp.sum(error * vis) / (jnp.sum(vis) * 3.0 + 1e-16)
