"""Spatial (height-axis) sharding with halo exchange — the TPU analog of
sequence/context parallelism for this vision workload (SURVEY.md §2.9/§5:
the reference has no sequence axis; its "long context" burden is full-res
Sintel frames).

Images are sharded over H across a mesh axis. Ops with spatial receptive
fields (convs, the cost volume's ±d window) need ``halo`` rows from the
neighboring shards; ``halo_exchange`` moves them over ICI with
``jax.lax.ppermute`` inside ``shard_map``. ``spatial_cost_volume`` shows the
composition: each device correlates its H-shard of f1 against the haloed
f2 shard — bitwise equal to the single-device op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad an H-sharded block with ``halo`` rows from both neighbors.

    Must run inside shard_map over ``axis_name``. x: [B, H_shard, W, C] →
    [B, H_shard + 2*halo, W, C]; boundary shards get zero padding (matching
    the zero-pad convention of the single-device ops).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top = x[:, :halo]  # rows my bottom neighbor needs
    bot = x[:, -halo:]  # rows my top neighbor needs

    # send my bottom rows downward (to idx+1), my top rows upward (to idx-1)
    from_above = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_below = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(top)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def spatial_cost_volume(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Cost volume with H sharded over ``axis_name``: halo-exchange f2's ±d
    rows, correlate locally. Equal to the single-device op."""
    d = max_displacement

    def local(f1_blk, f2_blk):
        f2h = halo_exchange(f2_blk, d, axis_name)
        # correlate: pad only W (H halo already present), slide the window
        b, h, w, c = f1_blk.shape
        n = 2 * d + 1
        f2p = jnp.pad(f2h, ((0, 0), (0, 0), (d, d), (0, 0)))
        outs = []
        for i in range(n):
            for j in range(n):
                shifted = jax.lax.dynamic_slice(f2p, (0, i, j, 0), (b, h, w, c))
                outs.append(jnp.mean(f1_blk * shifted, axis=-1))
        return jnp.stack(outs, axis=-1)

    spec = P(None, axis_name, None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )(f1, f2)


def spatial_warp(
    img: jax.Array,
    flow: jax.Array,
    max_flow: int,
    mesh: Mesh,
    axis_name: str = "data",
    align_corners: bool = True,
):
    """Backward warp with H sharded over ``axis_name``; correct while
    |v| <= max_flow (the halo size). Each device warps its own rows against
    a haloed image block with row coordinates rebased to the block."""
    from ocflow_tpu.ops.warp import _sample_bilinear_zero_pad, mesh_grid

    halo = max_flow + 1

    def local(img_blk, flow_blk):
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        imgh = halo_exchange(img_blk, halo, axis_name)
        b, hs, w, _ = flow_blk.shape
        # coords always float32 (the sampler contract — ops/warp.py)
        flow_blk = flow_blk.astype(jnp.float32)
        xx, yy = mesh_grid(hs, w, dtype=jnp.float32)
        x = xx[None] + flow_blk[..., 0]
        # y in GLOBAL coords minus block start, plus the halo offset
        y = yy[None] + flow_blk[..., 1] + halo
        if not align_corners:
            h_g = hs * n
            gx = x * (w / max(w - 1, 1)) - 0.5
            gy = (yy[None] + idx * hs + flow_blk[..., 1]) * (
                h_g / max(h_g - 1, 1)
            ) - 0.5
            x = gx
            y = gy - idx * hs + halo
        hh, wb, cb = imgh.shape[1], imgh.shape[2], imgh.shape[3]
        meta = (hh, wb, cb, imgh.dtype.name, (hs, w))
        out = jax.vmap(
            lambda i, xx2, yy2: _sample_bilinear_zero_pad(i, xx2, yy2, meta)
        )(imgh, x, y)
        # zero-pad semantics at global image borders: taps that resolve into
        # the zero halo already contribute 0, matching the reference
        return out

    spec = P(None, axis_name, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)(
        img, flow
    )
