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


# Channel threshold between the two gather formulations below. Measured on
# v5e (PERF.md "warp gather"): at C=3 (photometric/data warps) the packed
# gather is 2.6x faster (74.7 -> 28.6 ms at 448x1024 B=8 bf16); at C=32
# (the lvl-1 PWC feature warp, coherent starts) packing wins ~8% in
# isolation and a full 0.9 ms in situ (bench 361 -> 374 pairs/s; the
# round-2 "packed-everywhere regresses" result predated the flat-layout
# decode and no longer reproduces). C=64 measured neutral-to-slightly-
# positive; the C=96/128 coarse-level warps are descriptor-count-tiny and
# keep the windowed form to skip the 4x packed copy.
_PACK_C_MAX = 64


def _gather_2x2(img: jax.Array, x0: jax.Array, y0: jax.Array) -> jax.Array:
    """The four bilinear taps of each pixel, as [N, 2, 2, C].

    Two formulations, chosen by channel count (identical elements either
    way — starts are pre-clipped to (h-2, w-2) by the caller, so CLIP mode
    never engages and out-of-bounds semantics still come from the hat
    weights):

    - C <= _PACK_C_MAX — ONE fully-contiguous gather per pixel: the taps
      are pre-packed channel-wise, ``S[y, x] = concat(img[y, x],
      img[y, x+1], img[y+1, x], img[y+1, x+1])`` (a pad + 4-slice concat,
      one fused XLA layout pass), so each descriptor reads a single
      contiguous [1, 1, 4C] run. TPU gather cost is per-descriptor and
      sensitive to minor-dim contiguity: 2.6x faster at the full-res
      photometric shape (PERF.md "warp gather").
    - larger C — one strided [2, 2, C] window per pixel: with C >= 32 the
      minor-dim runs are already long, and skipping the 4x packed copy of
      the feature map wins.
    """
    h, w, c = img.shape
    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)  # [N, 2]
    if c > _PACK_C_MAX:
        return jax.lax.gather(
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
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    s = jnp.concatenate(
        [p[:h, :w], p[:h, 1 : w + 1], p[1 : h + 1, :w], p[1 : h + 1, 1 : w + 1]],
        axis=-1,
    )  # [H, W, 4C]
    g = jax.lax.gather(
        s,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, 1, 4 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [N, 4C]
    return g.reshape(-1, 2, 2, c)


def _hat_weights(x, x0, y, y0):
    """Bilinear hat weights at the (clipped) 2x2 tap positions. Taps farther
    than 1px — including every out-of-bounds tap — get weight 0, which is
    exactly grid_sample's zero padding. Always computed in float32: with
    bf16 coordinates the 8-bit mantissa quantizes tap positions (spacing
    1.0 px for x in [256, 512), 4.0 px past 1024) — coordinate math must
    not inherit the flow dtype."""
    dtype = jnp.float32
    two = jnp.arange(2, dtype=dtype)[None]
    fx = x.reshape(-1)[:, None].astype(dtype)
    fy = y.reshape(-1)[:, None].astype(dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - (x0.reshape(-1)[:, None].astype(dtype) + two)))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - (y0.reshape(-1)[:, None].astype(dtype) + two)))
    return wx, wy


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_bilinear_zero_pad(img: jax.Array, x: jax.Array, y: jax.Array, _meta=None) -> jax.Array:
    """Bilinear sample one image at float pixel coords with zero padding.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros')``. TPU-tuned
    formulation: ONE ``lax.gather`` descriptor per pixel (see
    ``_gather_2x2`` for the channel-dependent slice shape), with
    hat-function weights supplying the per-tap zero padding.

    Custom VJP: XLA's adjoint of the windowed gather is a windowed
    scatter-add that runs ~400x slower than the forward on v5e (1.8 s for one
    PWC level-2 warp) and can crash the TPU worker at scale. The backward
    here splats dL/dimg with four flat-index ``.at[].add`` scatters and
    computes dL/d(x,y) analytically from the gathered taps.
    """
    h, w, c = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    gathered = _gather_2x2(img, x0, y0)
    wx, wy = _hat_weights(x, x0, y, y0)
    out = jnp.einsum(
        "nyxc,ny,nx->nc", gathered, wy.astype(img.dtype), wx.astype(img.dtype))
    return out.reshape(*x.shape, c)


def _sample_fwd(img, x, y, _meta):
    h, w, c = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    gathered = _gather_2x2(img, x0, y0)
    wx, wy = _hat_weights(x, x0, y, y0)
    out = jnp.einsum(
        "nyxc,ny,nx->nc", gathered, wy.astype(img.dtype), wx.astype(img.dtype))
    # tap-relative offsets (needed for the hat-derivative signs in bwd)
    fdt = jnp.float32
    tx = x.reshape(-1).astype(fdt) - x0.reshape(-1).astype(fdt)
    ty = y.reshape(-1).astype(fdt) - y0.reshape(-1).astype(fdt)
    return out.reshape(*x.shape, c), (x0, y0, gathered, wx, wy, tx, ty)


def _sample_bwd(meta, res, g):
    h, w, c, dtype, spatial, *rest = meta
    grad_img = rest[0] if rest else True
    x0, y0, gathered, wx, wy, tx, ty = res
    gf = g.reshape(-1, c).astype(jnp.float32)
    wxf = wx.astype(jnp.float32)
    wyf = wy.astype(jnp.float32)

    if grad_img:
        # dL/dimg: splat w_y*w_x*g onto the 4 (in-bounds, clipped) taps
        # with FLAT index scatters — fast and stable on TPU
        x0f = x0.reshape(-1)
        y0f = y0.reshape(-1)
        dimg = jnp.zeros((h * w, c), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (wyf[:, dy] * wxf[:, dx])[:, None]
                idx = (y0f + dy) * w + (x0f + dx)
                dimg = dimg.at[idx].add(wgt * gf)
        dimg = dimg.reshape(h, w, c).astype(dtype)
    else:
        # warping input DATA (e.g. frame 2 in the photometric loss): its
        # cotangent is never consumed, but XLA does not reliably DCE the
        # splat chain — measured 135 ms of the 322 ms occ-aware train step
        # at 448x1024 batch 8. grad_img=False makes the skip explicit.
        dimg = jnp.zeros((h, w, c), dtype)

    # dL/dx, dL/dy: analytic hat derivative. For tap k: w_k = max(0, 1-|t_k|)
    # with t_k = x - (x0+k); dw_k/dx = -sign(t_k) inside the support, else 0.
    gv = gathered.astype(jnp.float32)  # [N, 2, 2, C]
    gsum = jnp.einsum("nyxc,nc->nyx", gv, gf)  # [N, 2, 2]
    txf = tx.astype(jnp.float32)
    tyf = ty.astype(jnp.float32)

    def dhat(t, wq):
        return jnp.where(wq > 0, -jnp.sign(t), 0.0)

    dwx = jnp.stack([dhat(txf, wxf[:, 0]), dhat(txf - 1.0, wxf[:, 1])], axis=-1)
    dwy = jnp.stack([dhat(tyf, wyf[:, 0]), dhat(tyf - 1.0, wyf[:, 1])], axis=-1)
    dx_grad = jnp.einsum("nyx,ny,nx->n", gsum, wyf, dwx)
    dy_grad = jnp.einsum("nyx,ny,nx->n", gsum, dwy, wxf)
    # coordinates are always float32 primals (see warp()), so their
    # cotangents are too
    return (
        dimg,
        dx_grad.reshape(spatial),
        dy_grad.reshape(spatial),
    )


_sample_bilinear_zero_pad.defvjp(_sample_fwd, _sample_bwd)


@functools.partial(
    jax.jit, static_argnames=("align_corners", "with_mask", "grad_img"))
def warp(
    img: jax.Array,
    flow: jax.Array,
    align_corners: bool = True,
    with_mask: bool = False,
    grad_img: bool = True,
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
        grad_img: False skips the dL/dimg splat in the custom backward
            (4 full-res scatter-adds, measured 135 ms at 448x1024 batch 8
            — XLA does not reliably DCE it). Use False when warping input
            DATA whose cotangent is never consumed (e.g. frame 2 in the
            photometric loss); keep True when warping activations
            (e.g. PWC feature warps).

    Returns:
        warped image [B, H, W, C] (and optionally the validity mask).

    ``flow`` may also be a tuple ``(u, v)`` of [B, H, W] planes — the form
    the fused PWC decode produces for free from its flat channel-major
    ``[B, 2, H*W]`` up-flow (the minor dim is already row-major H·W, so the
    planes are reshape-slices, no transpose). Semantically identical to
    stacking them into [B, H, W, 2].
    """
    _, h, w, _ = img.shape
    # Coordinate math in float32 ALWAYS: bf16 flows would quantize sampling
    # positions to the bf16 grid (1 px spacing past x=256, 4 px past 1024).
    # The gather + interpolation stay in img.dtype (the gather is ~2x
    # faster on bf16 data); only the coordinates/weights are exact.
    if isinstance(flow, (tuple, list)):
        u, v = flow
        xx, yy = mesh_grid(h, w, dtype=jnp.float32)
        x = u.astype(jnp.float32) + xx[None]
        y = v.astype(jnp.float32) + yy[None]
    else:
        coords = flow_to_warp(flow.astype(jnp.float32))
        x = coords[..., 0]
        y = coords[..., 1]
    if not align_corners:
        # x_norm = 2 x / (W-1) - 1; x_pix = ((x_norm + 1) * W - 1) / 2
        x = x * (w / max(w - 1, 1)) - 0.5
        y = y * (h / max(h - 1, 1)) - 0.5

    meta = (h, w, img.shape[-1], img.dtype.name, (h, w), grad_img)
    sample = lambda i, xx, yy: _sample_bilinear_zero_pad(i, xx, yy, meta)
    out = jax.vmap(sample)(img, x, y)
    if not with_mask:
        return out
    ones = jnp.ones_like(img[..., :1])
    meta1 = (h, w, 1, img.dtype.name, (h, w))
    mask = jax.vmap(lambda i, xx, yy: _sample_bilinear_zero_pad(i, xx, yy, meta1))(ones, x, y)
    mask = (mask >= 0.9999).astype(img.dtype)
    return out * mask, mask
