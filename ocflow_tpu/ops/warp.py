"""Bilinear backward warping (the TPU-native analog of ``F.grid_sample``).

The reference calls ``F.grid_sample`` with a mesh-grid + flow, normalized to
[-1, 1] by (W-1, H-1) (reference models/model.py:191-221). Different call
sites disagree on ``align_corners`` (True at models/model.py:219,
models/flow_model.py:77; False at models/networks/cost_volume_flow_net.py:149,
models/inpainting_model.py:50) so both variants are provided behind one flag.

Everything here is pure jnp — static shapes, gather-based sampling — and jits
cleanly on TPU. Layout is NHWC: ``img [B,H,W,C]``, ``flow [B,H,W,2]`` with
flow[..., 0] = u (x / width displacement), flow[..., 1] = v (y / height).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def mesh_grid(height: int, width: int, dtype=jnp.float32):
    """Pixel-coordinate mesh grid, returned as ``(xx, yy)`` each [H, W]."""
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=dtype),
        jnp.arange(width, dtype=dtype),
        indexing="ij",
    )
    return xx, yy


def flow_to_warp(flow: jax.Array) -> jax.Array:
    """Endpoint coordinates of a flow field.

    Args:
        flow: [B, H, W, 2] flow; channel 0 = x displacement, 1 = y.

    Returns:
        [B, H, W, 2] sampling coordinates ``grid + flow`` in pixel units
        (reference models/flow_model.py:81-99).
    """
    _, h, w, _ = flow.shape
    xx, yy = mesh_grid(h, w, dtype=flow.dtype)
    grid = jnp.stack([xx, yy], axis=-1)
    return grid[None] + flow


def _gather_2d(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """Gather img[iy, ix] for one image. img [H,W,C]; ix/iy [H,W] int32."""
    h, w, _ = img.shape
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*ix.shape, -1)


def _sample_bilinear_zero_pad(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample one image at float pixel coords with zero padding.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros')``: each of
    the four neighboring taps contributes zero when it falls outside the
    image, so partially-outside samples are partially attenuated.
    """
    h, w, _ = img.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = (x - x0f).astype(img.dtype)[..., None]
    ty = (y - y0f).astype(img.dtype)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = _gather_2d(img, jnp.clip(xi, 0, w - 1), jnp.clip(yi, 0, h - 1))
        return v * valid[..., None].astype(img.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    return top * (1.0 - ty) + bot * ty


@functools.partial(jax.jit, static_argnames=("align_corners", "with_mask"))
def warp(
    img: jax.Array,
    flow: jax.Array,
    align_corners: bool = True,
    with_mask: bool = False,
):
    """Backward-warp ``img`` (frame 2) to frame 1 by ``flow``.

    Args:
        img: [B, H, W, C] image / feature map.
        flow: [B, H, W, 2] flow in pixels (u, v).
        align_corners: replicates the grid_sample normalization round trip.
            True  → sample at ``grid + flow`` exactly.
            False → coordinates additionally rescaled by ``W/(W-1)`` then
            shifted by -0.5 (the grid_sample align_corners=False mapping of
            normalized coords built with (W-1, H-1), as the reference does at
            models/networks/cost_volume_flow_net.py:121-151).
        with_mask: also return the in-bounds validity mask [B, H, W, 1]
            (reference utils.py:49-57 thresholds it at 0.9999).

    Returns:
        warped image [B, H, W, C] (and optionally the validity mask).
    """
    _, h, w, _ = img.shape
    coords = flow_to_warp(flow)
    x = coords[..., 0]
    y = coords[..., 1]
    if not align_corners:
        # x_norm = 2 x / (W-1) - 1; x_pix = ((x_norm + 1) * W - 1) / 2
        x = x * (w / max(w - 1, 1)) - 0.5
        y = y * (h / max(h - 1, 1)) - 0.5

    out = jax.vmap(_sample_bilinear_zero_pad)(img, x, y)
    if not with_mask:
        return out
    ones = jnp.ones_like(img[..., :1])
    mask = jax.vmap(_sample_bilinear_zero_pad)(ones, x, y)
    mask = (mask >= 0.9999).astype(img.dtype)
    return out * mask, mask
