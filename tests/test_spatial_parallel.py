"""Spatially-sharded ops over the 8-device mesh equal the single-device ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocflow_tpu import parallel
from ocflow_tpu.ops import cost_volume, warp
from ocflow_tpu.parallel.spatial import spatial_cost_volume, spatial_warp

pytestmark = pytest.mark.slow  # heavy CPU-compile suite (CI/round-end)


@pytest.mark.slow
def test_spatial_cost_volume_matches(rng):
    mesh = parallel.make_mesh()
    b, h, w, c = 2, 32, 16, 8  # H=32 over 8 devices -> 4 rows/shard
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    want = np.asarray(cost_volume(f1, f2, 2))
    got = np.asarray(spatial_cost_volume(f1, f2, 2, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_spatial_warp_matches(rng):
    mesh = parallel.make_mesh()
    b, h, w, c = 1, 32, 16, 3
    img = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = jnp.asarray((rng.uniform(-2, 2, (b, h, w, 2))).astype(np.float32))
    want = np.asarray(warp(img, flow, align_corners=True))
    got = np.asarray(spatial_warp(img, flow, max_flow=2, mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
