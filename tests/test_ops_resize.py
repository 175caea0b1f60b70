"""resize_bilinear parity vs torch F.interpolate (both align_corners modes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ocflow_tpu.ops import resize_bilinear, resize_flow


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape_out", [(8, 12), (24, 40), (13, 7)])
def test_resize_matches_torch(rng, align_corners, shape_out):
    img = rng.standard_normal((2, 12, 20, 3)).astype(np.float32)
    ours = np.asarray(
        resize_bilinear(jnp.asarray(img), *shape_out, align_corners=align_corners)
    )
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    golden = (
        F.interpolate(t, size=shape_out, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-5)


def test_resize_flow_rescales_uv(rng):
    flow = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = np.asarray(resize_flow(jnp.asarray(flow), 16, 32))
    assert out.shape == (1, 16, 32, 2)
    # constant flow: u scaled by 4, v by 2
    const = np.ones((1, 8, 8, 2), np.float32)
    out = np.asarray(resize_flow(jnp.asarray(const), 16, 32))
    np.testing.assert_allclose(out[..., 0], 4.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 2.0, atol=1e-5)
