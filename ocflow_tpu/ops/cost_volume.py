"""Cost volume (local cross-correlation) and UFlow-style feature normalization.

Semantics match the reference exactly (models/networks/correlation_layer.py):
- ``cost_volume``: displace f2 by every (di, dj) in [-d, d]^2 and take the
  per-pixel **mean over channels** of ``f1 * shifted(f2)`` — mean, not sum
  (correlation_layer.py:37, the ÷C matters for parity). Output channel order
  is row-major over (dy, dx) with dy varying slowest, matching the reference's
  ``for i: for j:`` loop where ``i`` indexes the height pad.
- ``normalize_features``: center/scale both feature maps by moments computed
  across channels and averaged across both images (correlation_layer.py:42-82).

Layout is NHWC. The XLA path unrolls the (2d+1)^2 shifts statically — XLA
fuses the pad/slice/multiply/reduce chain; a fused Pallas kernel lives in
``ocflow_tpu.ops.pallas.cost_volume_kernel`` for the TPU hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_displacement",))
def cost_volume(f1: jax.Array, f2: jax.Array, max_displacement: int = 4) -> jax.Array:
    """Correlation cost volume.

    Args:
        f1: [B, H, W, C] features of frame 1 (kept fixed).
        f2: [B, H, W, C] features of frame 2 (displaced).
        max_displacement: max shift d; output has (2d+1)^2 channels.

    Returns:
        [B, H, W, (2d+1)^2] cost volume; channel k = dy_idx*(2d+1)+dx_idx
        where dy_idx, dx_idx run over the shift window.
    """
    b, h, w, c = f1.shape
    d = max_displacement
    n = 2 * d + 1
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    costs = []
    for i in range(n):
        for j in range(n):
            shifted = jax.lax.dynamic_slice(f2p, (0, i, j, 0), (b, h, w, c))
            costs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(costs, axis=-1)


def normalize_features(
    feature_list,
    normalize: bool = True,
    center: bool = True,
    moments_across_channels: bool = True,
    moments_across_images: bool = True,
    eps: float = 1e-16,
):
    """Normalize feature tensors before correlation (UFlow recipe).

    Args:
        feature_list: list of [B, H, W, C] arrays.

    Returns:
        list of normalized arrays. Per-image biased variance/mean are computed
        over (H, W[, C]) per batch element, then (optionally) averaged across
        the whole list into a single scalar pair — exactly the reference's
        ``torch.mean(torch.stack(...))`` collapse (correlation_layer.py:66-68).
    """
    axes = (1, 2, 3) if moments_across_channels else (1, 2)
    means = []
    variances = []
    for f in feature_list:
        mean = jnp.mean(f, axis=axes, keepdims=True)
        var = jnp.mean((f - mean) ** 2, axis=axes, keepdims=True)
        means.append(mean)
        variances.append(var)

    if moments_across_images:
        mean_all = jnp.mean(jnp.stack([jnp.mean(m) for m in means]))
        var_all = jnp.mean(jnp.stack([jnp.mean(v) for v in variances]))
        means = [mean_all] * len(feature_list)
        variances = [var_all] * len(feature_list)

    stds = [jnp.sqrt(v + eps) for v in variances]
    if center:
        feature_list = [f - m for f, m in zip(feature_list, means)]
    if normalize:
        feature_list = [f / s for f, s in zip(feature_list, stds)]
    return feature_list
