"""Forward-splat range map (how often each target pixel is referenced).

TPU-native re-derivation of the reference's ``compute_range_map``
(models/flow_model.py:101-163): decompose flow endpoints into integer floor +
fractional offset, splat a bilinear unit of mass onto the 4 neighboring
pixels with ``scatter_add``, and read the accumulated counts.

The reference filters invalid indices with ``torch.nonzero`` (dynamic shape —
un-jittable). Here invalid taps keep a static shape and get their *weights*
zeroed instead, which is numerically identical and jit/pjit friendly. The
validity test matches the reference exactly: coordinate x (channel 0) is
checked against width, y (channel 1) against height (flow_model.py:138-141).

Occlusion from a backward-flow range map: ``occ = 1 - clip(range, 0, 1)``
(models/model.py:388-391) — pixels never referenced by the backward flow are
occluded in frame 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocflow_tpu.ops.warp import flow_to_warp, mesh_grid


@jax.jit
def compute_range_map(flow: jax.Array) -> jax.Array:
    """Bilinear forward-splat occupancy counts.

    Args:
        flow: [B, H, W, 2] flow field (u = x displacement, v = y).

    Returns:
        [B, H, W, 1] range map: sum of bilinear weights landing on each pixel.
    """
    b, h, w, _ = flow.shape
    # float32 throughout: bf16 coordinates quantize the splat TARGETS
    # (1 px spacing past x=256), and a bf16 scatter-add both loses counts
    # (8-bit mantissa accumulation) and is the prime suspect for the
    # 'both'+range_map TPU worker faults observed at 448x1024 batch 8
    coords = flow_to_warp(flow.astype(jnp.float32))  # [B, H, W, 2]
    floor = jnp.floor(coords)
    offset = (coords - floor).reshape(b, h * w, 2)
    floor = floor.astype(jnp.int32).reshape(b, h * w, 2)

    # ONE flat-index scatter-add per image with all 4 taps concatenated
    # (measured faster than 4 sequential scatters; windowed scatters crash
    # the TPU worker at scale — flat indices only)
    idxs, wts = [], []
    for di in (0, 1):
        for dj in (0, 1):
            ix = floor[..., 0] + di  # x → width
            iy = floor[..., 1] + dj  # y → height
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            wx = (1.0 - di) - ((-1.0) ** di) * offset[..., 0]
            wy = (1.0 - dj) - ((-1.0) ** dj) * offset[..., 1]
            wts.append(wx * wy * valid.astype(jnp.float32))
            idxs.append(jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1))
    idx = jnp.concatenate(idxs, axis=1)  # [B, 4HW]
    wt = jnp.concatenate(wts, axis=1)

    def splat_one(idx_i, wt_i):
        return jnp.zeros((h * w,), dtype=jnp.float32).at[idx_i].add(wt_i)

    counts = jax.vmap(splat_one)(idx, wt)
    return counts.reshape(b, h, w, 1)


@jax.jit
def occlusion_from_back_flow(back_flow: jax.Array) -> jax.Array:
    """Occlusion mask for frame 1 from the backward flow (2→1).

    Returns [B, H, W, 1]; 1 = occluded, 0 = visible
    (reference models/model.py:388-391).
    """
    range_map = compute_range_map(back_flow)
    return 1.0 - jnp.clip(range_map, 0.0, 1.0)


def _warp_nograd(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Zero-padded bilinear warp WITHOUT the custom VJP.

    ``ops.warp`` is a custom_vjp function, so under ``jax.grad`` its forward
    rule saves the gathered [N, 2, 2, C] window as a residual for the
    backward pass; residuals cannot fuse into their consumer, and for a C=2
    flow field XLA lane-pads that buffer 64x — a measured 7 GB HBM OOM at
    448x1024 batch 8. This plain formulation (same math, no vjp) is for
    gradient-free uses only: inputs must be stop_gradient'ed, letting XLA
    fuse gather + weighting exactly like the inference path (~2 ms).
    """
    from ocflow_tpu.ops.warp import _gather_2x2, _hat_weights

    b, h, w, c = img.shape

    def one(im, xx, yy):
        x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 2)
        g = _gather_2x2(im, x0, y0)
        wx, wy = _hat_weights(xx, x0, yy, y0)
        return jnp.einsum(
            "nyxc,ny,nx->nc", g, wy.astype(im.dtype), wx.astype(im.dtype)
        ).reshape(h, w, c)

    return jax.vmap(one)(img, x, y)


def occlusion_fb_consistency(
    flow_fwd: jax.Array,
    flow_bwd: jax.Array,
    alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jax.Array:
    """Forward-backward-consistency occlusion (Meister et al., UnFlow).

    TPU-fast alternative to the reference's range-map occlusion: the splat
    is floored at ~97 ms/step by TPU scatter-add throughput (PERF.md),
    while this is a bilinear *gather* (~1 ms). A pixel is occluded when
    the round trip p -> p+F_fwd(p) -> back does not return near p:

        |F_fwd(p) + F_bwd(p + F_fwd(p))|^2
            > alpha1 * (|F_fwd(p)|^2 + |F_bwd(p+F_fwd(p))|^2) + alpha2

    or when the forward endpoint p + F_fwd(p) leaves the frame (nothing to
    compare against — the range-map method also marks such pixels occluded,
    since they are never splatted onto).

    Deliberate deviation from the reference (which only implements the
    range-map method, models/model.py:388-391); selected via the
    ``occ_method='fb_consistency'`` hparam, default stays ``'range_map'``.

    Returns [B, H, W, 1]; 1 = occluded, 0 = visible.
    """
    # coordinate math in float32 (bf16 flows would quantize the round-trip
    # test past x=256 — see ops/warp.py); the mask itself is exact
    flow_fwd = jax.lax.stop_gradient(flow_fwd).astype(jnp.float32)
    flow_bwd = jax.lax.stop_gradient(flow_bwd).astype(jnp.float32)
    _, h, w, _ = flow_fwd.shape
    xx, yy = mesh_grid(h, w, jnp.float32)
    x = xx[None] + flow_fwd[..., 0]
    y = yy[None] + flow_fwd[..., 1]
    bwd_at = _warp_nograd(flow_bwd, x, y)
    sq_diff = jnp.sum((flow_fwd + bwd_at) ** 2, axis=-1)
    sq_mag = jnp.sum(flow_fwd**2 + bwd_at**2, axis=-1)
    inconsistent = sq_diff > alpha1 * sq_mag + alpha2
    out_of_frame = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    return (inconsistent | out_of_frame)[..., None].astype(jnp.float32)
