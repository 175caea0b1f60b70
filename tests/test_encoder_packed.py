"""W-packed encoder-level kernel == plain XLA convs (interpret mode).

The packed kernel (ops/pallas/encoder_kernel.py) runs encoder levels with
cout in {16, 32, 64} as full-MXU-row GEMMs over an H-pair/W-pack layout;
these goldens pin the layout algebra (phase/parity/edge taps, halos,
image-boundary masking) against the reference conv chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocflow_tpu.ops.pallas.encoder_kernel import (
    enc_level_packed, pack_image_hpair, unpack_hpair)


def _conv_ref(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return jnp.where(y >= 0, y, 0.1 * y)


def _level_ref(x, params):
    (w0, b0), (w1, b1), (w2, b2) = params
    y = _conv_ref(x, w0, b0, stride=2)
    y = _conv_ref(y, w1, b1)
    return _conv_ref(y, w2, b2)


def _rand_level(rng, c_in, c):
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
    return [(mk(3, 3, c_in, c), mk(c)), (mk(3, 3, c, c), mk(c)),
            (mk(3, 3, c, c), mk(c))]


@pytest.mark.parametrize("c_in,c,w_in", [(3, 16, 1024), (16, 32, 512),
                                         (32, 64, 256)])
def test_enc_level_packed_matches_xla(c_in, c, w_in):
    rng = np.random.default_rng(c)
    B, h_in = 2, 16
    x = jnp.asarray(rng.normal(size=(B, h_in, w_in, c_in)), jnp.float32)
    params = _rand_level(rng, c_in, c)
    ref = _level_ref(x, params)

    p_in = 2 * (128 // c)
    xp = pack_image_hpair(x, p_in, (c_in + 3) // 4 * 4)
    (w0, b0), (w1, b1), (w2, b2) = params
    out = enc_level_packed(xp, w0, b0, w1, b1, w2, b2, h=h_in // 2,
                           c_in=c_in, c=c, interpret=True)
    got = unpack_hpair(out, h_in // 2, w_in // 2, c, 128 // c)
    # atol 5e-4: fp32 GEMM accumulation-order noise on ~30-magnitude values
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_enc_level_packed_multitile():
    """h > th: halo windows + first/last-tile zeroing across tiles."""
    rng = np.random.default_rng(7)
    B, h_in, w_in, c_in, c = 2, 32, 1024, 3, 16
    x = jnp.asarray(rng.normal(size=(B, h_in, w_in, c_in)), jnp.float32)
    params = _rand_level(rng, c_in, c)
    ref = _level_ref(x, params)
    xp = pack_image_hpair(x, 16, 4)
    (w0, b0), (w1, b1), (w2, b2) = params
    out = enc_level_packed(xp, w0, b0, w1, b1, w2, b2, h=16, c_in=3, c=16,
                           th=8, interpret=True)
    got = unpack_hpair(out, 16, 512, 16, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_encoder_fused_packed_chain_matches_plain():
    """_encoder_fused with the packed fine levels == plain XLA encoder
    (covers the packed level-0..2 chain + handoff to the generic path)."""
    from ocflow_tpu.models import FlowNetCV
    from ocflow_tpu.models.pwc_fast import _encoder, _encoder_fused

    rng = np.random.default_rng(1)
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 1024, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
    p = variables["params"]["SiameseEncoder_0"]
    cat = jnp.concatenate([x[..., :3], x[..., 3:]], axis=0)
    ref = _encoder(p, cat)
    got = _encoder_fused(p, cat, interpret=True)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4,
            err_msg=f"level {i}")
