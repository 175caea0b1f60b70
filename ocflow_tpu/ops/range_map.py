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

from ocflow_tpu.ops.warp import flow_to_warp


@jax.jit
def compute_range_map(flow: jax.Array) -> jax.Array:
    """Bilinear forward-splat occupancy counts.

    Args:
        flow: [B, H, W, 2] flow field (u = x displacement, v = y).

    Returns:
        [B, H, W, 1] range map: sum of bilinear weights landing on each pixel.
    """
    b, h, w, _ = flow.shape
    coords = flow_to_warp(flow)  # [B, H, W, 2]
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
            wts.append(wx * wy * valid.astype(flow.dtype))
            idxs.append(jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1))
    idx = jnp.concatenate(idxs, axis=1)  # [B, 4HW]
    wt = jnp.concatenate(wts, axis=1)

    def splat_one(idx_i, wt_i):
        return jnp.zeros((h * w,), dtype=flow.dtype).at[idx_i].add(wt_i)

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
