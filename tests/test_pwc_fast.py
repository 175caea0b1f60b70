"""Fast (fused-kernel) FlowNetCV inference path == flax forward.

Runs the Pallas conv-group kernel in interpreter mode on the CPU test mesh;
the compiled path is exercised on real TPU by bench.py and the verify drive
scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocflow_tpu.models import FlowNetCV
from ocflow_tpu.models.pwc_fast import fast_apply
from ocflow_tpu.ops.pallas.conv_chain_kernel import (
    ConvSpec, conv_group, flat_to_nhwc, nhwc_to_flat)


def _conv_ref(x, w, b, d=1, act=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return jnp.where(y >= 0, y, 0.1 * y) if act else y


def test_conv_group_dense_chain_and_dilated():
    rng = np.random.default_rng(0)
    B, H, W = 2, 16, 128
    c0 = 20  # padded to 32 internally
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    w2a = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 24, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    c1 = _conv_ref(x, w1, b1)
    c2 = _conv_ref(jnp.concatenate([x, c1], -1),
                   jnp.concatenate([w2a, w2b], 2), b2)

    outs = conv_group(
        [nhwc_to_flat(x)], [[w1], [w2a, w2b]], [b1, b2],
        [ConvSpec(reads=(0,), cout=24, emit=True),
         ConvSpec(reads=(0, 1), cout=16, emit=True)],
        H, W, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[0], H, W, 24)), np.asarray(c1),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[1], H, W, 16)), np.asarray(c2),
        atol=1e-4)

    # dilated conv (context-network style)
    wd = jnp.asarray(rng.normal(size=(3, 3, 24, 32)) * 0.1, jnp.float32)
    bd = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    yd = _conv_ref(c1, wd, bd, d=4)
    (out,) = conv_group(
        [outs[0]], [[wd]], [bd],
        [ConvSpec(reads=(0,), cout=32, dilation=4, emit=True)],
        H, W, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(out, H, W, 32)), np.asarray(yd), atol=1e-4)


@pytest.mark.slow
def test_fast_apply_matches_flax():
    rng = np.random.default_rng(1)
    # smallest size meeting the fused-path constraints: W/4 >= 128,
    # H/4 divisible by th; B=2 so the level-3 (W=64) decoder exercises
    # the lane-packed fused path
    B, H, W = 2, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    ref_full, ref_quarter = net.apply(variables, x)
    fast_full, fast_quarter = fast_apply(variables, x, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast_quarter), np.asarray(ref_quarter), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(fast_full), np.asarray(ref_full), atol=2e-3)


def test_conv_group_lane_packed():
    """Packed-lane mode (several images side by side on lanes) == per-image
    convs, including zero-padding at each image's left/right boundary."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import pack_lanes, unpack_lanes

    rng = np.random.default_rng(2)
    B, H, W, pack = 4, 8, 64, 2
    c0 = 16
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    ref = _conv_ref(_conv_ref(x, w1, b1), w2, b2)

    xf = pack_lanes(nhwc_to_flat(x), H, W, pack)
    (out,) = conv_group(
        [xf], [[w1], [w2]], [b1, b2],
        [ConvSpec(reads=(0,), cout=16),
         ConvSpec(reads=(1,), cout=16, emit=True)],
        H, pack * W, th=4, w_img=W, interpret=True)
    got = flat_to_nhwc(unpack_lanes(out, H, W, pack), H, W, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv_group_im2col_mode():
    """im2col single-GEMM mode == p3 mode == XLA, incl. dilation and packed
    lanes (image-boundary masking on the input side)."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import pack_lanes, unpack_lanes

    rng = np.random.default_rng(3)
    B, H, W = 2, 8, 128
    c0 = 16
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 24)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    ref = _conv_ref(_conv_ref(x, w1, b1), w2, b2)

    (out,) = conv_group(
        [nhwc_to_flat(x)], [[w1], [w2]], [b1, b2],
        [ConvSpec(reads=(0,), cout=16, im2col=True),
         ConvSpec(reads=(1,), cout=24, im2col=True, emit=True)],
        H, W, th=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(out, H, W, 24)), np.asarray(ref), atol=1e-4)

    # dilated im2col
    wd = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    yd = _conv_ref(x, wd, b1, d=2)
    (od,) = conv_group(
        [nhwc_to_flat(x)], [[wd]], [b1],
        [ConvSpec(reads=(0,), cout=16, dilation=2, im2col=True, emit=True)],
        H, W, th=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(od, H, W, 16)), np.asarray(yd), atol=1e-4)

    # packed lanes: two 64-wide images per lane row
    xw = x[:, :, :64, :]
    refp = _conv_ref(xw, w1, b1)
    xf = pack_lanes(nhwc_to_flat(xw), H, 64, 2)
    (op,) = conv_group(
        [xf], [[w1]], [b1],
        [ConvSpec(reads=(0,), cout=16, im2col=True, emit=True)],
        H, 128, th=4, w_img=64, interpret=True)
    got = flat_to_nhwc(unpack_lanes(op, H, 64, 2), H, 64, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(refp), atol=1e-4)


def _conv_s2_ref(x, w, b, act=True):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return jnp.where(y >= 0, y, 0.1 * y) if act else y


def test_conv_group_stride2_mode():
    """Stride-2 im2col mode (W-pair packed input, even-row write-back) ==
    XLA stride-2 conv, standalone and chained into stride-1 convs, incl.
    multi-tile grids and packed lanes."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import pack_lanes, unpack_lanes

    rng = np.random.default_rng(7)
    B, H2, W2, c0 = 2, 32, 256, 3  # image is H2 x W2; outputs H2/2 x W2/2
    H, W = H2 // 2, W2 // 2
    x = jnp.asarray(rng.normal(size=(B, H2, W2, c0)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    y0 = _conv_s2_ref(x, w0, b0)
    ref = _conv_ref(_conv_ref(y0, w1, b1), w2, b2)

    xf = nhwc_to_flat(x.reshape(B, H2, W, 2 * c0))  # free W-pair packing
    outs = conv_group(
        [xf], [[w0], [w1], [w2]], [b0, b1, b2],
        [ConvSpec(reads=(0,), cout=16, im2col=True, stride=2, emit=True),
         ConvSpec(reads=(1,), cout=16, im2col=True),
         ConvSpec(reads=(2,), cout=16, im2col=True, emit=True)],
        H, W, th=4, in_strides=(2,), interpret=True)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[0], H, W, 16)), np.asarray(y0),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(flat_to_nhwc(outs[1], H, W, 16)), np.asarray(ref),
        atol=1e-4)

    # packed lanes: two 64-wide (packed) images per lane row
    B4 = 4
    x4 = jnp.asarray(rng.normal(size=(B4, 16, 128, 4)), jnp.float32)
    w4 = jnp.asarray(rng.normal(size=(3, 3, 4, 16)) * 0.1, jnp.float32)
    yp = _conv_s2_ref(x4, w4, b0)
    xp = pack_lanes(nhwc_to_flat(x4.reshape(B4, 16, 64, 8)), 16, 64, 2)
    (op,) = conv_group(
        [xp], [[w4]], [b0],
        [ConvSpec(reads=(0,), cout=16, im2col=True, stride=2, emit=True)],
        8, 128, th=4, w_img=64, in_strides=(2,), interpret=True)
    got = flat_to_nhwc(unpack_lanes(op, 8, 64, 2), 8, 64, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(yp), atol=1e-4)


def test_encoder_fused_matches_xla():
    """_encoder_fused (one stride-2+pair kernel per level) == plain XLA
    encoder at every pyramid level."""
    from ocflow_tpu.models.pwc_fast import _encoder, _encoder_fused

    rng = np.random.default_rng(8)
    B, H, W = 2, 64, 512
    net = FlowNetCV()
    x6 = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x6)
    p = variables["params"]["SiameseEncoder_0"]
    x = jnp.concatenate([x6[..., :3], x6[..., 3:]], axis=0)
    ref = _encoder(p, x)
    got = _encoder_fused(p, x, interpret=True)
    assert len(ref) == len(got) == 6
    # level 0 is the W-packed flat sentinel [2B, 2c, h*(w/2)] (channel
    # group p = output col 2w'+p) — unpack it for the comparison, which
    # also goldens the packed layout itself
    b2, h0, w0, c0 = ref[0].shape
    g0 = flat_to_nhwc(got[0], h0, w0 // 2, 2 * c0)
    g0 = g0.reshape(b2, h0, w0 // 2, 2, c0).reshape(b2, h0, w0, c0)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(ref[0]), atol=2e-4)
    for r, g in zip(ref[1:], got[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_conv_group_diff_grads_match_autodiff():
    """conv_group_diff (Pallas fwd + manual XLA bwd from saved activations)
    == jax.grad of an equivalent XLA conv chain: dinputs, dweights, dbiases."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import conv_group_diff

    rng = np.random.default_rng(4)
    B, H, W = 2, 8, 128
    c0 = 16
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    w2a = jnp.asarray(rng.normal(size=(3, 3, c0, 16)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 24, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    gseed = jnp.asarray(rng.normal(size=(B, H, W, 16)), jnp.float32)
    g1seed = jnp.asarray(rng.normal(size=(B, H, W, 24)), jnp.float32)
    specs = (ConvSpec(reads=(0,), cout=24, emit=True),
             ConvSpec(reads=(0, 1), cout=16, dilation=2, emit=True))

    def ref_loss(xx, ws, bs):
        c1 = _conv_ref(xx, ws[0][0], bs[0])
        c2 = _conv_ref(jnp.concatenate([xx, c1], -1),
                       jnp.concatenate([ws[1][0], ws[1][1]], 2), bs[1], d=2)
        return jnp.sum(c2 * gseed) + jnp.sum(c1 * g1seed)

    def fast_loss(xx, ws, bs):
        c1, c2 = conv_group_diff(
            [xx], ws, bs, specs, H, W, 4, None, True)
        return jnp.sum(c2 * gseed) + jnp.sum(c1 * g1seed)

    ws = [[w1], [w2a, w2b]]
    bs = [b1, b2]
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(x, ws, bs)
    got = jax.grad(fast_loss, argnums=(0, 1, 2))(x, ws, bs)
    for wleaf, gleaf in zip(jax.tree_util.tree_leaves(want),
                            jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(
            np.asarray(gleaf), np.asarray(wleaf), atol=5e-3, rtol=1e-4)


def test_conv_group_diff_grads_lane_packed():
    """Adjoint-kernel grads on a lane-PACKED chain (w_img < w, the coarse
    decoder levels) == autodiff of the XLA chain: the dx-tap masks must not
    leak gradient across the packed image boundary."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import conv_group_diff

    rng = np.random.default_rng(9)
    B, H, W_IMG = 4, 8, 64  # pack=2 -> w_lanes 128
    c0 = 16
    x = jnp.asarray(rng.normal(size=(B, H, W_IMG, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    w2a = jnp.asarray(rng.normal(size=(3, 3, c0, 8)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 24, 8)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    gseed = jnp.asarray(rng.normal(size=(B, H, W_IMG, 8)), jnp.float32)
    g1seed = jnp.asarray(rng.normal(size=(B, H, W_IMG, 24)), jnp.float32)
    specs = (ConvSpec(reads=(0,), cout=24, emit=True),
             ConvSpec(reads=(0, 1), cout=8, act=False, emit=True))

    def ref_loss(xx, ws, bs):
        c1 = _conv_ref(xx, ws[0][0], bs[0])
        c2 = _conv_ref(jnp.concatenate([xx, c1], -1),
                       jnp.concatenate([ws[1][0], ws[1][1]], 2), bs[1],
                       act=False)
        return jnp.sum(c2 * gseed) + jnp.sum(c1 * g1seed)

    def fast_loss(xx, ws, bs):
        c1, c2 = conv_group_diff(
            [xx], ws, bs, specs, H, 2 * W_IMG, 4, W_IMG, True)
        return jnp.sum(c2 * gseed) + jnp.sum(c1 * g1seed)

    ws = [[w1], [w2a, w2b]]
    bs = [b1, b2]
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(x, ws, bs)
    got = jax.grad(fast_loss, argnums=(0, 1, 2))(x, ws, bs)
    for wleaf, gleaf in zip(jax.tree_util.tree_leaves(want),
                            jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(
            np.asarray(gleaf), np.asarray(wleaf), atol=5e-3, rtol=1e-4)


@pytest.mark.slow
def test_fast_apply_sharded_matches_per_shard():
    """shard_map'd fused path on a 2-device mesh == per-shard fast_apply
    (VERDICT r2 #3: the kernels are per-example, multi-chip is spec plumbing).

    The comparison is against per-SHARD (not full-batch) applies because
    normalize_features collapses feature moments across the whole local
    batch (reference correlation_layer.py:66-68) — batch-split sharding
    computes per-shard moments, exactly like the torch reference under DDP
    where each replica normalizes over its local batch."""
    from ocflow_tpu.models.pwc_fast import fast_apply_sharded
    from ocflow_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(6)
    B, H, W = 2, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    mesh = make_mesh((2,), ("data",), jax.devices()[:2])

    want = [fast_apply(variables, x[i:i + 1], th=8, interpret=True)
            for i in range(B)]
    want_full = jnp.concatenate([w[0] for w in want], axis=0)
    want_quarter = jnp.concatenate([w[1] for w in want], axis=0)
    got_full, got_quarter = fast_apply_sharded(
        variables, x, mesh, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_quarter), np.asarray(want_quarter), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_full), np.asarray(want_full), atol=1e-5)


def test_conv_group_diff_grads_under_shard_map():
    """Grads through shard_map(conv_group_diff) with replicated weights and a
    batch-sharded input == single-device grads (the replicated-params
    transpose must psum weight grads across the mesh axis)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ocflow_tpu.ops.pallas.conv_chain_kernel import conv_group_diff
    from ocflow_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    B, H, W = 4, 8, 128
    c0 = 16
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    gseed = jnp.asarray(rng.normal(size=(B, H, W, 24)), jnp.float32)
    specs = (ConvSpec(reads=(0,), cout=24, emit=True),)
    mesh = make_mesh((4,), ("data",), jax.devices()[:4])

    def local_psum(xx, gg, ws, bs):
        (c1,) = conv_group_diff([xx], ws, bs, specs, H, W, 4, None, True)
        # per-shard partial sums -> a replicated scalar via psum
        return jax.lax.psum(jnp.sum(c1 * gg), "data")

    def loss_sharded(xx, ws, bs):
        return shard_map(
            local_psum, mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P()),
            out_specs=P(), check_vma=False,
        )(xx, gseed, ws, bs)

    def loss_single(xx, ws, bs):
        (c1,) = conv_group_diff([xx], ws, bs, specs, H, W, 4, None, True)
        return jnp.sum(c1 * gseed)

    want = jax.grad(loss_single, argnums=(0, 1, 2))(x, [[w1]], [b1])
    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, [[w1]], [b1])
    for wleaf, gleaf in zip(jax.tree_util.tree_leaves(want),
                            jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(
            np.asarray(gleaf), np.asarray(wleaf), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fast_apply_diff_grads_match_flax():
    """The differentiable fused path (diff=True): loss grads wrt params match
    jax.grad through the flax module."""
    import flax

    rng = np.random.default_rng(5)
    B, H, W = 1, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    tgt = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 2)), jnp.float32)

    def loss_flax(params):
        f1, f2 = net.apply({"params": params}, x)
        return jnp.mean((f1 - tgt) ** 2) + jnp.mean(f2**2)

    def loss_fast(params):
        f1, f2 = fast_apply(
            {"params": params}, x, th=8, interpret=True, diff=True)
        return jnp.mean((f1 - tgt) ** 2) + jnp.mean(f2**2)

    l0, gw = jax.value_and_grad(loss_flax)(variables["params"])
    l1, gf = jax.value_and_grad(loss_fast)(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    flat_w = flax.traverse_util.flatten_dict(gw)
    flat_f = flax.traverse_util.flatten_dict(gf)
    assert set(flat_w) == set(flat_f)
    for k in flat_w:
        a, b = np.asarray(flat_w[k]), np.asarray(flat_f[k])
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-3,
            err_msg=f"grad mismatch at {'/'.join(k)}")


@pytest.mark.slow
def test_fast_apply_pair_matches_two_applies():
    """fast_apply_pair == (fast_apply(x), fast_apply(swap(x))) with ONE
    encoder, and the backward pair carries ZERO gradient (it replaces the
    reference's no_grad backward-flow pass, model.py:381-386)."""
    from ocflow_tpu.models.pwc_fast import fast_apply_pair

    rng = np.random.default_rng(8)
    B, H, W = 1, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    xs = jnp.concatenate([x[..., 3:], x[..., :3]], axis=-1)
    variables = net.init(jax.random.PRNGKey(0), x)

    (fwd_full, fwd_l2), (bwd_full, bwd_l2) = fast_apply_pair(
        variables, x, th=8, interpret=True, diff=True)
    want_f = fast_apply(variables, x, th=8, interpret=True)
    want_b = fast_apply(variables, xs, th=8, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd_l2), np.asarray(want_f[1]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fwd_full), np.asarray(want_f[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(bwd_l2), np.asarray(want_b[1]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(bwd_full), np.asarray(want_b[0]), atol=2e-3)

    # gradient only flows through the forward pair
    def loss_pair(params):
        (f1, _), (b1, _) = fast_apply_pair(
            {"params": params}, x, th=8, interpret=True, diff=True)
        return jnp.mean(f1**2) + 3.0 * jnp.mean(b1**2)

    def loss_fwd_only(params):
        f1, _ = fast_apply(
            {"params": params}, x, th=8, interpret=True, diff=True)
        return jnp.mean(f1**2)

    gp = jax.grad(loss_pair)(variables["params"])
    gf = jax.grad(loss_fwd_only)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_conv_group_q8_exact_vs_emulation():
    """W8A8 kernel (interpret) == pure-JAX integer emulation: same fold,
    same quantize, same int32 accumulation, same epilogue — bit-near
    (bf16 store rounding only)."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import (
        conv_group_q8, fold_quant_weights, quantize_q8, _ceil32)

    rng = np.random.default_rng(3)
    B, H, W = 2, 16, 128
    c0 = 32
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 32)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    w2a = jnp.asarray(rng.normal(size=(3, 3, c0, 24)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 32, 24)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(24,)), jnp.float32)

    s_in = jnp.float32(np.abs(np.asarray(x)).max() / 127.0)
    s1 = jnp.float32(0.05)

    specs = [ConvSpec(reads=(0,), cout=32, q8=True),
             ConvSpec(reads=(0, 1), cout=24, emit=True)]
    xq = quantize_q8(nhwc_to_flat(x), s_in)
    (out,) = conv_group_q8(
        xq, s_in, [[w1], [w2a, w2b]], [b1, b2], specs, [s1, None],
        H, W, th=8, interpret=True)
    got = np.asarray(flat_to_nhwc(out, H, W, 24)).astype(np.float32)

    # emulation: int32 convs on the codes, identical fold/quant/epilogue
    def iconv(codes, wq, d=1):
        return jax.lax.conv_general_dilated(
            codes.astype(jnp.int32), wq.astype(jnp.int32), (1, 1),
            ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    codes0 = quantize_q8(x, s_in)  # NHWC int8 codes
    wq1, ws1 = fold_quant_weights([w1], [s_in], _ceil32(32), [c0])
    acc1 = iconv(codes0, wq1).astype(jnp.float32) * (ws1 / s1) + b1_pad(b1, s1)
    acc1 = jnp.where(acc1 >= 0, acc1, acc1 * 0.1)
    codes1 = jnp.clip(jnp.round(acc1), -127, 127).astype(jnp.int8)

    wq2, ws2 = fold_quant_weights(
        [w2a, w2b], [s_in, s1], _ceil32(24), [c0, 32])
    acc2 = iconv(jnp.concatenate([codes0, codes1], -1), wq2)
    ref = acc2.astype(jnp.float32) * ws2 + jnp.pad(b2, (0, _ceil32(24) - 24))
    ref = jnp.where(ref >= 0, ref, ref * 0.1)
    ref = np.asarray(ref[..., :24])

    np.testing.assert_allclose(got, ref, atol=np.abs(ref).max() * 8e-3)


def b1_pad(b, s):
    from ocflow_tpu.ops.pallas.conv_chain_kernel import _ceil32
    return jnp.pad(b, (0, _ceil32(b.shape[0]) - b.shape[0])) / s


@pytest.mark.slow
def test_fast_apply_q8_close_to_bf16():
    """calibrate_q8 + fast_apply(q8=...) stays close to the exact path:
    quantization noise only (the L2 dense block is the only int8 part)."""
    from ocflow_tpu.models.pwc_fast import calibrate_q8

    rng = np.random.default_rng(4)
    B, H, W = 2, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    scales = calibrate_q8(variables, x)
    exact_full, exact_q = fast_apply(variables, x, th=8, interpret=True)
    q8_full, q8_q = fast_apply(variables, x, th=8, interpret=True, q8=scales)
    # flow error from W8A8 on the L2 block: small relative to flow scale
    scale = np.abs(np.asarray(exact_q)).max() + 1e-6
    err = np.abs(np.asarray(q8_q) - np.asarray(exact_q)).max()
    assert err / scale < 0.05, (err, scale)


def test_conv_group_q8_s2_im2col_exact_vs_emulation():
    """q8 stride-2 + im2col chain (the W8A8 encoder level) in interpret
    mode == pure-JAX integer emulation: identical fold/quantize/epilogue,
    int8 codes chained level-internally."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import (
        conv_group_q8, fold_quant_weights, quantize_q8, _ceil32)

    rng = np.random.default_rng(5)
    B, H2, W2 = 2, 16, 256  # input 16x256 -> output 8x128
    H, W = H2 // 2, W2 // 2
    cin, c = 6, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H2, W2, cin)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(3, 3, cin, c)) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    s_in = jnp.float32(1.0 / 127.0)
    s0 = jnp.float32(0.02)
    s1 = jnp.float32(0.02)

    specs = [ConvSpec(reads=(0,), cout=c, im2col=True, stride=2, q8=True),
             ConvSpec(reads=(1,), cout=c, im2col=True, q8=True, emit=True)]
    codes = quantize_q8(x, s_in)
    xp = nhwc_to_flat(codes.reshape(B, H2, W, 2 * cin),
                      c_pad=_ceil32(2 * cin))
    (out,) = conv_group_q8(
        xp, s_in, [[w0], [w1]], [b0, b1], specs, [s0, s1],
        H, W, th=4, in_stride=2, interpret=True)
    assert out.dtype == jnp.int8
    got = np.asarray(flat_to_nhwc(out, H, W, c)).astype(np.float32) * s1

    # emulation: stride-2 then stride-1 int32 convs on the codes
    def iconv(codes_nhwc, wq, stride=1):
        return jax.lax.conv_general_dilated(
            codes_nhwc.astype(jnp.int32), wq.astype(jnp.int32),
            (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def requant(acc_i, wscale, bias, s_out):
        a = acc_i.astype(jnp.float32) * (wscale / s_out) + jnp.pad(
            bias, (0, wscale.shape[0] - bias.shape[0])) / s_out
        a = jnp.where(a >= 0, a, a * 0.1)
        return jnp.clip(jnp.round(a), -127, 127).astype(jnp.int8)

    wq0, ws0 = fold_quant_weights([w0], [s_in], _ceil32(c), [cin])
    c1 = requant(iconv(codes, wq0, stride=2), ws0, b0, s0)  # ceil32-wide
    wq1, ws1 = fold_quant_weights([w1], [s0], _ceil32(c), [_ceil32(c)])
    c2 = requant(iconv(c1, wq1), ws1, b1, s1)
    ref = np.asarray(c2[..., :c]).astype(np.float32) * s1

    # codes may differ by 1 where round() sits on a .5 boundary realized
    # differently through the two f32 epilogues (measured 1/32768 elements)
    diff_codes = np.abs(got - ref) / float(s1)
    assert diff_codes.max() <= 1.0 + 1e-5, diff_codes.max()
    assert (diff_codes > 0.5).mean() < 1e-3


def test_conv_group_q8_dilated_chain_exact_vs_emulation():
    """q8 p3 chain with dilations (the W8A8 context chain) in interpret
    mode == integer emulation."""
    from ocflow_tpu.ops.pallas.conv_chain_kernel import (
        conv_group_q8, fold_quant_weights, quantize_q8, _ceil32)

    rng = np.random.default_rng(6)
    B, H, W = 2, 16, 128
    c0 = 32
    x = jnp.asarray(rng.normal(size=(B, H, W, c0)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c0, 32)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 32, 8)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    s_in = jnp.float32(np.abs(np.asarray(x)).max() / 127.0)
    s1 = jnp.float32(0.05)

    specs = [ConvSpec(reads=(0,), cout=32, dilation=2, q8=True),
             ConvSpec(reads=(1,), cout=8, dilation=4, act=False, emit=True)]
    xq = quantize_q8(nhwc_to_flat(x), s_in)
    (out,) = conv_group_q8(
        xq, s_in, [[w1], [w2]], [b1, b2], specs, [s1, None],
        H, W, th=16, interpret=True)
    got = np.asarray(flat_to_nhwc(out, H, W, 8)).astype(np.float32)

    def iconv(codes, wq, d):
        return jax.lax.conv_general_dilated(
            codes.astype(jnp.int32), wq.astype(jnp.int32), (1, 1),
            ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    codes0 = quantize_q8(x, s_in)
    wq1, ws1 = fold_quant_weights([w1], [s_in], _ceil32(32), [c0])
    acc1 = iconv(codes0, wq1, 2).astype(jnp.float32) * (ws1 / s1) + b1_pad(
        b1, s1)
    acc1 = jnp.where(acc1 >= 0, acc1, acc1 * 0.1)
    codes1 = jnp.clip(jnp.round(acc1), -127, 127).astype(jnp.int8)

    wq2, ws2 = fold_quant_weights([w2], [s1], _ceil32(8), [_ceil32(32)])
    acc2 = iconv(codes1, wq2, 4)
    ref = acc2.astype(jnp.float32) * ws2 + jnp.pad(b2, (0, _ceil32(8) - 8))
    ref = np.asarray(ref[..., :8])

    np.testing.assert_allclose(got, ref, atol=np.abs(ref).max() * 8e-3)


@pytest.mark.slow
def test_fast_apply_q8_enc_ctx_close_to_bf16():
    """Opt-in W8A8 encoder + context chain (perf dead ends on v5e, kept as
    tested kernel modes): quantization noise stays bounded even with the
    whole forward int8 on a random-init net (trained nets measure far
    tighter — PERF.md W8A8 accuracy)."""
    from ocflow_tpu.models.pwc_fast import calibrate_q8

    rng = np.random.default_rng(4)
    B, H, W = 2, 64, 512
    net = FlowNetCV()
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    scales = calibrate_q8(variables, x, encoder=True, ctx=True)
    assert "enc" in scales and "ctx" in scales
    exact_full, exact_q = fast_apply(variables, x, th=8, interpret=True)
    q8_full, q8_q = fast_apply(variables, x, th=8, interpret=True, q8=scales)
    scale = np.abs(np.asarray(exact_q)).max() + 1e-6
    err = np.abs(np.asarray(q8_q) - np.asarray(exact_q)).max()
    assert err / scale < 0.1, (err, scale)
