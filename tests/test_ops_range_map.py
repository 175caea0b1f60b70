"""Range map / forward splat parity vs a torch scatter_add golden."""

import numpy as np
import torch

import jax.numpy as jnp

from ocflow_tpu.ops import compute_range_map, occlusion_from_back_flow


def torch_range_map(flow_nchw):
    """Golden transliteration of reference models/flow_model.py:101-163."""
    flow = flow_nchw.permute(0, 2, 3, 1)
    b, h, w, _ = flow.shape
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1)
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w)
    grid = torch.stack((xx, yy), dim=-1).float()[None]
    coords = grid + flow
    floor = torch.floor(coords)
    offset = coords - floor
    floor = floor.to(torch.int32)
    batch_offset = (torch.arange(b).view(b, 1, 1) * h * w).repeat(1, h, w).reshape(-1)
    floor = floor.reshape(-1, 2)
    offset = offset.reshape(-1, 2)
    idxs_all, weights_all = [], []
    for di in range(2):
        for dj in range(2):
            ix = floor[:, 0] + di
            iy = floor[:, 1] + dj
            idxs = batch_offset + iy * w + ix
            mask = torch.nonzero(
                (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h), as_tuple=True
            )
            wi = (1.0 - di) - (-1) ** di * offset[mask][:, 0]
            wj = (1.0 - dj) - (-1) ** dj * offset[mask][:, 1]
            idxs_all.append(idxs[mask])
            weights_all.append(wi * wj)
    idxs = torch.cat(idxs_all)
    weights = torch.cat(weights_all)
    counts = torch.zeros(b * h * w, dtype=weights.dtype)
    counts.scatter_add_(0, idxs.long(), weights)
    return counts.reshape(b, 1, h, w)


def test_range_map_matches_torch(rng):
    b, h, w = 2, 12, 15
    flow = (rng.standard_normal((b, h, w, 2)) * 4.0).astype(np.float32)
    ours = np.asarray(compute_range_map(jnp.asarray(flow)))[..., 0]
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    golden = torch_range_map(tflow)[:, 0].numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_range_map_zero_flow_is_ones():
    flow = jnp.zeros((1, 8, 8, 2))
    rm = np.asarray(compute_range_map(flow))
    np.testing.assert_allclose(rm, 1.0, atol=1e-6)


def test_range_map_mass_conservation(rng):
    """In-bounds flow conserves total splat mass = H*W per image."""
    h, w = 16, 16
    flow = (rng.uniform(-1, 1, (1, h, w, 2)) * 2.0).astype(np.float32)
    # keep endpoints strictly inside [1, size-2] so no mass leaks off-image
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    fx = np.clip(xx + flow[0, ..., 0], 1, w - 2) - xx
    fy = np.clip(yy + flow[0, ..., 1], 1, h - 2) - yy
    flow = np.stack([fx, fy], axis=-1)[None].astype(np.float32)
    rm = np.asarray(compute_range_map(jnp.asarray(flow)))
    np.testing.assert_allclose(rm.sum(), h * w, rtol=1e-5)


def test_occlusion_from_back_flow():
    """A uniform shift leaves a strip unreferenced → occluded."""
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 3.0  # all endpoints move right by 3
    occ = np.asarray(occlusion_from_back_flow(jnp.asarray(flow)))[0, ..., 0]
    np.testing.assert_allclose(occ[:, :3], 1.0, atol=1e-6)  # left strip never hit
    np.testing.assert_allclose(occ[:, 3:], 0.0, atol=1e-6)


def test_occlusion_fb_consistency():
    """Consistent fwd/bwd flows -> visible; a region whose backward flow
    contradicts the forward flow -> occluded."""
    from ocflow_tpu.ops import occlusion_fb_consistency

    h, w = 16, 16
    fwd = np.zeros((1, h, w, 2), np.float32)
    fwd[..., 0] = 2.0
    bwd = np.zeros((1, h, w, 2), np.float32)
    bwd[..., 0] = -2.0  # exact inverse: round trip returns to p
    occ = np.asarray(
        occlusion_fb_consistency(jnp.asarray(fwd), jnp.asarray(bwd)))
    np.testing.assert_allclose(occ[0, :, : w - 2, 0], 0.0, atol=1e-6)

    # break the backward flow in the right half: round trip misses by 6 px
    bwd_bad = bwd.copy()
    bwd_bad[:, :, w // 2:, 0] = 4.0
    occ = np.asarray(
        occlusion_fb_consistency(jnp.asarray(fwd), jnp.asarray(bwd_bad)))
    # forward endpoints x+2 >= w//2+2 read the broken half
    np.testing.assert_allclose(occ[0, :, w // 2 :, 0][:, : w // 2 - 3], 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(occ[0, :, : w // 2 - 2, 0], 0.0, atol=1e-6)

    # forward endpoints leaving the frame are occluded (the range-map method
    # also never splats onto them)
    occ = np.asarray(
        occlusion_fb_consistency(jnp.asarray(fwd), jnp.asarray(bwd)))
    np.testing.assert_allclose(occ[0, :, w - 2 :, 0], 1.0, atol=1e-6)


def test_fb_consistency_nograd_sampler_matches_warp():
    """_warp_nograd == ops.warp (zero-padded bilinear) on a random field;
    fb_consistency uses it because the custom-VJP warp saves a [N,2,2,2]
    residual under grad that lane-pads 64x (7 GB OOM at scale)."""
    from ocflow_tpu.ops.range_map import _warp_nograd
    from ocflow_tpu.ops.warp import warp

    rng = np.random.default_rng(3)
    b, h, w = 2, 24, 40
    img = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32)
    ref = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    x = jnp.asarray(xx[None] + flow[..., 0])
    y = jnp.asarray(yy[None] + flow[..., 1])
    got = np.asarray(_warp_nograd(jnp.asarray(img), x, y))
    np.testing.assert_allclose(got, ref, atol=1e-5)
