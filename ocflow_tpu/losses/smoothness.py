"""Edge-aware smoothness losses (reference models/model.py:53-114).

NHWC layout: the channel reductions in the reference (``dim=1`` in NCHW)
become ``axis=-1`` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocflow_tpu.losses.photometric import robust_l1


def image_gradient(img: jax.Array, stride: int = 1):
    """Forward differences along W then H (models/model.py:53-66).

    Args:
        img: [B, H, W, C].
    Returns:
        (dx [B, H, W-s, C], dy [B, H-s, W, C]).
    """
    dx = img[:, :, stride:, :] - img[:, :, :-stride, :]
    dy = img[:, stride:, :, :] - img[:, :-stride, :, :]
    return dx, dy


def edge_aware_smoothness_loss(img: jax.Array, flow: jax.Array, alpha: float = 100.0) -> jax.Array:
    """Norm-weighted variant (models/model.py:68-91)."""
    img_dx, img_dy = image_gradient(img)
    flow_dx, flow_dy = image_gradient(flow)
    img_dx_n = jnp.linalg.norm(img_dx, axis=-1)
    img_dy_n = jnp.linalg.norm(img_dy, axis=-1)
    flow_dx_n = jnp.linalg.norm(flow_dx, axis=-1)
    flow_dy_n = jnp.linalg.norm(flow_dy, axis=-1)
    loss_dx = flow_dx_n * jnp.exp(-alpha * img_dx_n)
    loss_dy = flow_dy_n * jnp.exp(-alpha * img_dy_n)
    # float32 accumulation (bf16 means over ~1M pixels lose the signal)
    return 0.5 * (
        jnp.mean(robust_l1(loss_dx).astype(jnp.float32))
        + jnp.mean(robust_l1(loss_dy).astype(jnp.float32))
    )


def first_order_smoothness_loss(img: jax.Array, flow: jax.Array, alpha: float = 100.0) -> jax.Array:
    """exp(-mean((alpha*dI)^2))-weighted charbonnier of flow gradients
    (models/model.py:93-101)."""
    img_gx, img_gy = image_gradient(img)
    weights_x = jnp.exp(-jnp.mean((alpha * img_gx) ** 2, axis=-1, keepdims=True))
    weights_y = jnp.exp(-jnp.mean((alpha * img_gy) ** 2, axis=-1, keepdims=True))
    flow_gx, flow_gy = image_gradient(flow)
    # float32 accumulation (see edge_aware_smoothness_loss)
    return 0.5 * (
        jnp.mean((weights_x * robust_l1(flow_gx)).astype(jnp.float32))
        + jnp.mean((weights_y * robust_l1(flow_gy)).astype(jnp.float32))
    )


def second_order_smoothness_loss(img: jax.Array, flow: jax.Array, alpha: float = 100.0) -> jax.Array:
    """Second-order variant: image gradients at stride 2, flow second
    differences (models/model.py:103-114)."""
    img_gx, img_gy = image_gradient(img, stride=2)
    weights_xx = jnp.exp(-jnp.mean((alpha * img_gx) ** 2, axis=-1, keepdims=True))
    weights_yy = jnp.exp(-jnp.mean((alpha * img_gy) ** 2, axis=-1, keepdims=True))
    flow_gx, flow_gy = image_gradient(flow)
    flow_gxx, _ = image_gradient(flow_gx)
    _, flow_gyy = image_gradient(flow_gy)
    # float32 accumulation (see edge_aware_smoothness_loss)
    return 0.5 * (
        jnp.mean((weights_xx * robust_l1(flow_gxx)).astype(jnp.float32))
        + jnp.mean((weights_yy * robust_l1(flow_gyy)).astype(jnp.float32))
    )
