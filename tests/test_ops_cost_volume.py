"""Cost volume + feature normalization parity (reference correlation_layer.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ocflow_tpu.ops import cost_volume, normalize_features


def naive_cost_volume(f1, f2, d):
    """Straight numpy transliteration of the reference loop (mean over C)."""
    b, h, w, c = f1.shape
    n = 2 * d + 1
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    out = np.zeros((b, h, w, n * n), dtype=f1.dtype)
    k = 0
    for i in range(n):
        for j in range(n):
            out[..., k] = np.mean(f1 * f2p[:, i : h + i, j : w + j, :], axis=-1)
            k += 1
    return out


@pytest.mark.parametrize("d", [1, 4])
def test_cost_volume_matches_naive(rng, d):
    f1 = rng.standard_normal((2, 9, 11, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 9, 11, 8)).astype(np.float32)
    ours = np.asarray(cost_volume(jnp.asarray(f1), jnp.asarray(f2), d))
    golden = naive_cost_volume(f1, f2, d)
    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-5)


def test_cost_volume_identity_peak(rng):
    """Auto-correlation must peak at the zero-shift channel."""
    f = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    cv = np.asarray(cost_volume(jnp.asarray(f), jnp.asarray(f), 4))
    center = (2 * 4 + 1) ** 2 // 2
    inner = cv[:, 4:-4, 4:-4, :]  # away from zero padding
    assert np.mean(inner.argmax(axis=-1) == center) > 0.99


def test_normalize_features_moments(rng):
    f1 = rng.standard_normal((2, 6, 7, 5)).astype(np.float32) * 3 + 1
    f2 = rng.standard_normal((2, 6, 7, 5)).astype(np.float32) * 0.5 - 2
    n1, n2 = normalize_features([jnp.asarray(f1), jnp.asarray(f2)])
    # Moments are per-batch-element (over H, W, C) then averaged across both
    # images AND the batch (the reference's torch.mean(torch.stack(...))).
    m1 = f1.mean(axis=(1, 2, 3))
    m2 = f2.mean(axis=(1, 2, 3))
    v1 = f1.var(axis=(1, 2, 3))
    v2 = f2.var(axis=(1, 2, 3))
    mean_all = 0.5 * (m1.mean() + m2.mean())
    var_all = 0.5 * (v1.mean() + v2.mean())
    std = np.sqrt(var_all + 1e-16)
    np.testing.assert_allclose(np.asarray(n1), (f1 - mean_all) / std, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(n2), (f2 - mean_all) / std, atol=1e-4, rtol=1e-4)


def test_normalize_features_per_image(rng):
    f1 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32) * 2 + 3
    (n1,) = normalize_features([jnp.asarray(f1)], moments_across_images=False)
    n1 = np.asarray(n1)
    assert abs(n1.mean()) < 1e-5
    assert abs(n1.std() - 1.0) < 1e-4


def test_fused_backward_matches_autodiff(rng):
    """The fused CV's custom-VJP backward (XLA mirror) == autodiff of the
    plain XLA cost volume."""
    import jax

    from ocflow_tpu.ops.pallas import cost_volume_kernel as cvk

    f1 = jnp.asarray(rng.standard_normal((2, 8, 128, 16)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 8, 128, 16)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 8, 128, 81)), jnp.float32)

    def loss(a, b):
        return jnp.sum(cost_volume(a, b, 4) * g)

    want1, want2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    got1, got2 = cvk._bwd(4, (f1, f2), g)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-3)


def test_cost_volume_flat_matches_nhwc(rng):
    """cost_volume_fused_flat == channel-major reshape of the NHWC cost
    volume (the inference decode assembles decoder inputs from this flat
    layout — pwc_fast._fast_decode). Off-TPU this exercises the XLA
    fallback + transpose; the kernel's transpose_out=False path is
    value-checked on the TPU (PERF.md)."""
    from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused_flat

    f1 = jnp.asarray(rng.standard_normal((2, 8, 16, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 8, 16, 4)), jnp.float32)
    flat = np.asarray(cost_volume_fused_flat(f1, f2, 2))
    nhwc = np.asarray(cost_volume(f1, f2, 2))
    want = np.transpose(nhwc, (0, 3, 1, 2)).reshape(2, 25, 8 * 16)
    np.testing.assert_allclose(flat, want, atol=1e-5)
