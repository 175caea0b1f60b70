"""Bilinear resize with exact ``F.interpolate`` semantics, as dense matmuls.

Instead of gather-based sampling, resize is expressed as two small dense
interpolation matrices applied along H and W (``out = Wy @ img @ Wx^T``).
On TPU this rides the MXU and is exactly reproducible for both
``align_corners`` conventions used by the reference (True at
models/model.py:333, models/networks/cost_volume_flow_net.py:245;
False in gated-conv upsampling, gated_conv_inpainting_net.py resize calls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (edge-clamped)."""
    if n_out == n_in:
        return np.eye(n_out, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners and n_out > 1:
        src = i * (n_in - 1) / (n_out - 1)
    else:
        src = (i + 0.5) * n_in / n_out - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    t = src - lo
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), lo] += 1.0 - t
    m[np.arange(n_out), hi] += t
    return m.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "align_corners"))
def resize_bilinear(
    img: jax.Array, height: int, width: int, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of [B, H, W, C] (or [H, W, C]) to (height, width)."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    _, h, w, _ = img.shape
    my = jnp.asarray(_interp_matrix(h, height, align_corners), dtype=img.dtype)
    mx = jnp.asarray(_interp_matrix(w, width, align_corners), dtype=img.dtype)
    # HIGHEST precision: resize is a parity-critical op (fp32 on MXU via
    # 3-pass bf16 is still fast; default bf16 rounding breaks golden tests).
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,bhwc->bowc", my, img, precision=hp)
    out = jnp.einsum("pw,bowc->bopc", mx, out, precision=hp)
    if squeeze:
        out = out[0]
    return out


def upsample2x(img: jax.Array, align_corners: bool = False) -> jax.Array:
    """2x bilinear upsample."""
    _, h, w, _ = img.shape if img.ndim == 4 else (None, *img.shape)
    return resize_bilinear(img, h * 2, w * 2, align_corners)


def resize_flow(flow: jax.Array, height: int, width: int, align_corners: bool = True) -> jax.Array:
    """Resize a flow field and rescale its u/v components to the new pixel
    units (reference models/data/utils/flow_utils.py:120-138)."""
    _, h, w, _ = flow.shape if flow.ndim == 4 else (None, *flow.shape)
    out = resize_bilinear(flow, height, width, align_corners)
    scale = jnp.asarray([width / w, height / h], dtype=flow.dtype)
    return out * scale
