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


def _sample_bilinear_zero_pad(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample one image at float pixel coords with zero padding.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros')``: each of
    the four neighboring taps contributes zero when it falls outside the
    image, so partially-outside samples are partially attenuated.

    TPU-tuned formulation: ONE ``lax.gather`` of a [2, 2, C] slice per pixel
    (4x fewer gather descriptors than four per-tap row gathers — 2.5x faster
    on v5e). Slice starts are clipped to the image; per-tap zero-padding
    weights fall out of evaluating the bilinear hat function at the
    *gathered* (clipped) positions: any tap farther than 1px from the sample
    point — including every out-of-bounds tap — gets weight 0.
    """
    h, w, c = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)

    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)  # [N, 2]
    gathered = jax.lax.gather(
        img,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [N, 2, 2, C]

    two = jnp.arange(2, dtype=img.dtype)[None]
    fx = x.reshape(-1)[:, None]
    fy = y.reshape(-1)[:, None]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - (x0.reshape(-1)[:, None].astype(img.dtype) + two)))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - (y0.reshape(-1)[:, None].astype(img.dtype) + two)))
    out = jnp.einsum("nyxc,ny,nx->nc", gathered, wy, wx)
    return out.reshape(*x.shape, c)


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
