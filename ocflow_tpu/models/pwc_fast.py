"""Fused-kernel inference path for FlowNetCV (the flagship PWC model).

Numerically equivalent to ``FlowNetCV.apply`` (same param tree, same math,
reference models/networks/cost_volume_flow_net.py:154-246) but executes the
hot blocks through the Pallas conv-group kernel
(ops/pallas/conv_chain_kernel.py):

- the level-2 (and optionally level-3) DenseNet decoder + flow head + first
  context conv run as ONE fused kernel — the concat growth lives in VMEM
  and never materializes in HBM;
- the remaining dilated context convs run as single fused convs.

Everything else (encoder, warps, cost volumes, deconvs, coarse levels) is
functional XLA on the same weights. Training uses the flax module (autodiff
through ``FlowNetCV.apply``); this path is for serving/benchmarks, validated
against the flax forward in tests/test_pwc_fast.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ocflow_tpu.ops.cost_volume import normalize_features
from ocflow_tpu.ops.pallas.conv_chain_kernel import (
    ConvSpec,
    conv_group,
    conv_group_diff,
    conv_group_q8,
    flat_to_nhwc,
    nhwc_to_flat,
    pack_lanes,
    quantize_q8,
    unpack_lanes,
)
from ocflow_tpu.ops.pallas.cost_volume_kernel import (
    cost_volume_fused as cost_volume,
    cost_volume_fused_flat as cost_volume_flat,
)
from ocflow_tpu.ops.resize import resize_bilinear
from ocflow_tpu.ops.warp import warp

_GROWTH = (128, 128, 96, 64, 32)
_CTX = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))

# Test hook: lets the fused path (and maybe_* gates) run on the CPU mesh in
# Pallas interpret mode, so the sharded train-step equality tests exercise
# the REAL kernel path without TPU hardware. Never set in production.
INTERPRET_ON_CPU = False


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _conv(x, kernel, bias, stride=1, dilation=1, act=True):
    p = dilation  # 3x3 convs: torch-style padding (k-1)//2 * dilation
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), ((p, p), (p, p)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias.astype(x.dtype)
    return _leaky(y) if act else y


def _deconv(x, params):
    k = params["ConvTranspose_0"]["kernel"].astype(x.dtype)
    b = params["ConvTranspose_0"]["bias"].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _deconv_split(parts, params):
    """Deconv over a channel-concat, K-split by part: deconv(concat(parts))
    == sum of per-part deconvs. Skips materializing the DenseNet feature
    concat in HBM just to feed a 2-channel up-feat deconv."""
    k = params["ConvTranspose_0"]["kernel"]
    b = params["ConvTranspose_0"]["bias"]
    off, y = 0, None
    for part in parts:
        cb = part.shape[-1]
        ks = k[:, :, off:off + cb, :].astype(part.dtype)
        t = jax.lax.conv_transpose(
            part, ks, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = t if y is None else y + t
        off += cb
    assert off == k.shape[2], (off, k.shape)
    return y + b.astype(y.dtype)


def _encoder(params, x):
    """SiameseEncoder: 6 levels x (stride-2 conv + 2 convs)."""
    feats = []
    for lvl in range(6):
        for j in range(3):
            cb = params[f"ConvBlock_{lvl * 3 + j}"]["Conv_0"]
            x = _conv(x, cb["kernel"], cb["bias"], stride=2 if j == 0 else 1)
        feats.append(x)
    return feats


def _enc_tile(h: int, w_lanes: int, k_s2: int, k_pair: int) -> int:
    """Largest tile whose im2col rhs stays under ~40 MB (VMEM is 128 MB;
    big tiles measured 3-5x faster for the small-C encoder pairs). The
    stride-2 conv's rhs spans 2*(th + 2*halo) rows."""
    budget = 40 * 1024 * 1024
    for th in (h, 112, 56, 28, 16, 14, 8, 7, 4):
        if th <= h and h % th == 0:
            rhs = max(k_s2 * 2 * (th + 5), k_pair * (th + 4)) * w_lanes * 2
            if rhs <= budget:
                return th
    return pick_tile(h)


def _encoder_fused(params, x, th=None, interpret=False):
    """SiameseEncoder with each LEVEL (stride-2 conv + conv pair) fused into
    one conv-group kernel call (lane-packed at the narrow coarse levels).

    The stride-2 conv runs in-kernel via the stride-2 im2col mode: W-stride
    2 vanishes into the W-pair channel packing (folded into the one
    nhwc_to_flat transpose the level pays anyway) and H-stride 2 into the
    kernel's even-row write-back. This replaced the XLA stride-2 convs that
    were the encoder's ~5 ms "floor" — the earlier phase-split and
    space-to-depth formulations lost to XLA-side layout copies (PERF.md
    dead ends); this one adds NO layout work.

    Level 0 additionally runs W-PACKED (pack=2): its three convs compute
    two image columns per lane (ConvSpec.pack), doubling the MXU row fill
    of the chain's worst GEMMs (cout=16 → 32 rows) and halving their
    streaming dim M. The packed output is EXACTLY the W-pair channel-packed
    flat input level 1's stride-2 conv consumes, and level 0's output is
    the one pyramid level no decoder/warp/CV ever reads (``_fast_decode``
    uses f[1..5] only) — so the packing is consumed natively with ZERO
    unpack transposes, side-stepping the exit-relayout poison that killed
    the round-3 whole-encoder W-pack (PERF.md). ``feats[0]`` is then the
    packed flat [B, 2c, H*(W/2)] sentinel, not NHWC."""
    feats = []
    chain_flat = None  # level-0's packed flat output, consumed by level 1
    for lvl in range(6):
        cb0 = params[f"ConvBlock_{lvl * 3}"]["Conv_0"]
        cb1 = params[f"ConvBlock_{lvl * 3 + 1}"]["Conv_0"]
        cb2 = params[f"ConvBlock_{lvl * 3 + 2}"]["Conv_0"]
        b, h_in, w_in, c_in = x.shape  # lvl 1 after packed-L0: ShapeDtypeStruct
        h, w = h_in // 2, w_in // 2
        c = cb0["kernel"].shape[3]
        pack = _decoder_pack(b, w)
        if lvl == 0 and w_in % 4 == 0 and (w_in // 4) % 128 == 0:
            ws = [[cb0["kernel"]], [cb1["kernel"]], [cb2["kernel"]]]
            bs = [jnp.concatenate([cb["bias"]] * 2)
                  for cb in (cb0, cb1, cb2)]
            specs = [
                ConvSpec(reads=(0,), cout=2 * c, im2col=True, stride=2,
                         pack=2),
                ConvSpec(reads=(1,), cout=2 * c, im2col=True, pack=2),
                ConvSpec(reads=(2,), cout=2 * c, im2col=True, pack=2,
                         emit=True),
            ]
            wl = w // 2  # packed lanes: W_out/2 == W_in/4
            tt = th if (th and h % th == 0) else _enc_tile(
                h, wl, 6 * _ceil16(4 * c_in), 9 * _ceil16(2 * c))
            xp = nhwc_to_flat(x.reshape(b, h_in, w_in // 4, 4 * c_in))
            (out,) = conv_group(
                [xp], ws, bs, specs, h, wl,
                th=tt, w_img=wl, in_strides=(2,), interpret=interpret)
            chain_flat = out  # [B, 2c, h*wl] — level 1's s2 input as-is
            feats.append(out)
            # NHWC handle for shape bookkeeping of the next iteration
            x = jax.ShapeDtypeStruct((b, h, w, c), out.dtype)
            continue
        if pack is not None:
            ws = [[cb0["kernel"]], [cb1["kernel"]], [cb2["kernel"]]]
            bs = [cb0["bias"], cb1["bias"], cb2["bias"]]
            specs = [
                ConvSpec(reads=(0,), cout=c, im2col=True, stride=2),
                ConvSpec(reads=(1,), cout=c, im2col=True),
                ConvSpec(reads=(2,), cout=c, im2col=True, emit=True),
            ]
            tt = th if (th and h % th == 0) else _enc_tile(
                h, w * pack, 6 * _ceil16(2 * c_in), 9 * _ceil16(c))
            if lvl == 1 and chain_flat is not None:
                xp = chain_flat  # already W-pair packed flat
                chain_flat = None
            else:
                xp = nhwc_to_flat(x.reshape(b, h_in, w, 2 * c_in))
            if pack > 1:
                xp = pack_lanes(xp, h_in, w, pack)
            (out,) = conv_group(
                [xp], ws, bs, specs, h, w * pack,
                th=tt, w_img=w, in_strides=(2,), interpret=interpret)
            if pack > 1:
                out = unpack_lanes(out, h, w, pack)
            x = flat_to_nhwc(out, h, w, c)
        else:
            x = _conv(x, cb0["kernel"], cb0["bias"], stride=2)
            x = _conv(x, cb1["kernel"], cb1["bias"])
            x = _conv(x, cb2["kernel"], cb2["bias"])
        feats.append(x)
    return feats


def _ceil16(c: int) -> int:
    return (c + 15) // 16 * 16


def _ceil32(c: int) -> int:
    return (c + 31) // 32 * 32


def _encoder_fused_q8(params, x, q8e, th=None, interpret=False):
    """W8A8 SiameseEncoder: each level (stride-2 conv + pair) is one
    ``conv_group_q8`` call in stride-2/im2col int8 mode.

    The win is on the MXU contraction dim: int8 feeds 2x the K per pass, so
    the K=192..864 level GEMMs drop 1.5-2x in passes (the cout<=128 rows
    stay underfilled either way — that part int8 cannot fix, PERF.md). The
    input images quantize near-losslessly (8-bit sources on [-1, 1]); each
    level's output codes ship int8 to the NEXT level (no bf16 round trip)
    and dequantize once for the XLA-side consumers (warps, cost volumes,
    rest concat).

    ``q8e``: {'in': s_img, 'levels': [[s_s2, s_c1, s_c2] x 6]} from
    :func:`calibrate_q8`. Returns bf16 feature pyramids like ``_encoder``.
    """
    feats = []
    cur_scale = q8e["in"]
    codes = quantize_q8(x, cur_scale)  # NHWC int8
    for lvl in range(6):
        cb0 = params[f"ConvBlock_{lvl * 3}"]["Conv_0"]
        cb1 = params[f"ConvBlock_{lvl * 3 + 1}"]["Conv_0"]
        cb2 = params[f"ConvBlock_{lvl * 3 + 2}"]["Conv_0"]
        b, h_in, w_in, c_in = codes.shape
        h, w = h_in // 2, w_in // 2
        c = cb0["kernel"].shape[3]
        pack = _decoder_pack(b, w)
        lw = q8e["levels"][lvl]
        if pack is not None:
            ws = [[cb0["kernel"]], [cb1["kernel"]], [cb2["kernel"]]]
            bs = [cb0["bias"], cb1["bias"], cb2["bias"]]
            specs = [
                ConvSpec(reads=(0,), cout=c, im2col=True, stride=2, q8=True),
                ConvSpec(reads=(1,), cout=c, im2col=True, q8=True),
                ConvSpec(reads=(2,), cout=c, im2col=True, q8=True,
                         emit=True),
            ]
            tt = th if (th and h % th == 0) else _enc_tile(
                h, w * pack, 6 * _ceil32(2 * c_in), 9 * _ceil32(c))
            xp = nhwc_to_flat(codes.reshape(b, h_in, w, 2 * c_in),
                              c_pad=_ceil32(2 * c_in))
            if pack > 1:
                xp = pack_lanes(xp, h_in, w, pack)
            (out,) = conv_group_q8(
                xp, cur_scale, ws, bs, specs, list(lw), h, w * pack,
                th=tt, w_img=w if pack > 1 else None, in_stride=2,
                interpret=interpret)
            if pack > 1:
                out = unpack_lanes(out, h, w, pack)
            cur_scale = lw[2]
            codes = flat_to_nhwc(out, h, w, c)  # int8 NHWC
            feats.append(codes.astype(jnp.bfloat16) * cur_scale)
        else:
            # narrow coarse level unusable by the kernel: bf16 XLA convs on
            # the dequantized features, re-quantized for any later level
            xb = codes.astype(jnp.bfloat16) * cur_scale
            xb = _conv(xb, cb0["kernel"], cb0["bias"], stride=2)
            xb = _conv(xb, cb1["kernel"], cb1["bias"])
            xb = _conv(xb, cb2["kernel"], cb2["bias"])
            feats.append(xb)
            cur_scale = lw[2]
            codes = quantize_q8(xb, cur_scale)
    return feats


def _dense_decoder_xla(params, x):
    """DenseDecoder via plain XLA convs on the concatenated features."""
    for j in range(5):
        cb = params[f"ConvBlock_{j}"]["Conv_0"]
        x = jnp.concatenate([_conv(x, cb["kernel"], cb["bias"]), x], axis=-1)
    pf = params["PredictFlow_0"]["Conv_0"]
    flow = _conv(x, pf["kernel"], pf["bias"], act=False)
    return flow, x


def _split_newest_first(kernel, block_ch):
    """Split a [3,3,Cin,Cout] kernel whose input is the decoder concat
    (NEWEST first: [c_j,...,c1,xcat]) into per-block weights ordered
    [xcat, c1, ..., c_j] (conv_group block order)."""
    n = len(block_ch)
    splits, off = [], 0
    for i in range(n - 1, 0, -1):  # newest block = c_{n-1} first
        splits.append((i, kernel[:, :, off:off + block_ch[i], :]))
        off += block_ch[i]
    splits.append((0, kernel[:, :, off:off + block_ch[0], :]))
    assert off + block_ch[0] == kernel.shape[2]
    return [w for _, w in sorted(splits, key=lambda t: t[0])]


def _phase_conv_weights(deconv_params):
    """A stride-2 SAME ConvTranspose ([4,4,Cin,2]) as ONE plain 3x3 conv
    with 8 phase-structured output channels, runnable inside the conv-group
    kernel.

    Identity (delta-probe of ``lax.conv_transpose``):
        y[2h+dr, 2w+dc] += x[h, w] * k[2-dr, 2-dc]   for dr, dc in {-1..2}
    so output phase (a, b) at coarse (h', w') sums exactly two taps per
    axis — offsets {-1, 0} for phase 0 (k rows 0/2) and {0, +1} for phase 1
    (k rows 1/3) — i.e. a 3x3 conv whose weight
        k3[di, dj, :, (a,b,c)] = k[R(a,di), R(b,dj), :, c]
    is zero outside those taps. The fused decoder emits [.., 8] at coarse
    res; ``_unpack_phases`` interleaves it to [.., 2H, 2W, 2] with a cheap
    reshape/transpose. This replaces the XLA deconvs whose cout=2 GEMMs
    fill 2/128 MXU rows (up-feat: measured 1.14 ms at the 56x128 level vs
    ~0.1 in-kernel)."""
    k = deconv_params["ConvTranspose_0"]["kernel"]
    bias = deconv_params["ConvTranspose_0"]["bias"]
    cin = k.shape[2]
    k3 = jnp.zeros((3, 3, cin, 2, 2, 2), k.dtype)
    taps = ((0, 0, 0), (0, 1, 2), (1, 1, 1), (1, 2, 3))  # (phase, dy+1, k row)
    for a, di, kr in taps:
        for b_, dj, kc in taps:
            k3 = k3.at[di, dj, :, a, b_, :].set(k[kr, kc])
    return k3.reshape(3, 3, cin, 8), jnp.tile(bias, 4)


def _upfeat_phase_weights(deconv_params, block_ch):
    """Up-feat phase-conv weights split over the decoder's block stripes
    (the deconv input is the DenseNet concat, newest first)."""
    k3, bias8 = _phase_conv_weights(deconv_params)
    return _split_newest_first(k3, block_ch), bias8


def _unpack_phases(y8):
    """[B, H, W, 8] phase-packed (a, b, c) -> [B, 2H, 2W, 2]."""
    b, h, w, _ = y8.shape
    y = y8.reshape(b, h, w, 2, 2, 2)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, 2)


def _tile_for(h: int, th) -> int:
    """Honor an explicit tile override only when it divides this level's H."""
    return th if th and h % th == 0 else pick_tile(h)


def pick_tile(h: int) -> int:
    """Largest measured-good row tile dividing H (112 -> 56: 175 TFLOP/s on
    v5e vs 75 at th=8; halo recompute shrinks with th)."""
    for th in (56, 32, 28, 16, 14, 8, 4):
        if h % th == 0:
            return th
    return h


def _decoder_pack(b: int, w: int) -> int | None:
    """Lane-packing factor for a fused dense decoder at width ``w``; None
    when the fused path is unusable (width not tileable / batch unsplittable)."""
    if w >= 128:
        return 1 if w % 128 == 0 else None
    if 128 % w == 0 and b % (128 // w) == 0:
        return 128 // w
    return None


def _fused_dense_decoder_q8(dec_params, xf, xf_shape, q8, upfeat, upflow,
                            th, interpret=False):
    """W8A8 variant of the fuse_flow fused decoder (L6..L3 levels): growth
    convs int8, flow head in the bf16 side stripe (full precision — its
    value feeds the next level's warp), phase convs emitting bf16.
    Returns (up_flow8_flat, up_feat8_flat) like the bf16 kernel."""
    b, h, w, c0 = xf_shape
    block_ch = [c0] + list(_GROWTH)
    weights, biases, specs, scales = [], [], [], []
    for j, g in enumerate(_GROWTH):
        cb = dec_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append(_split_newest_first(cb["kernel"], block_ch[: j + 1]))
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=tuple(range(j + 1)), cout=g, q8=True))
        scales.append(q8["growth"][j])
    pf = dec_params["PredictFlow_0"]["Conv_0"]
    weights.append(_split_newest_first(pf["kernel"], block_ch))
    biases.append(pf["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=2, act=False))
    scales.append(None)
    fw, fb = _phase_conv_weights(upflow)
    weights.append([fw])
    biases.append(fb)
    specs.append(ConvSpec(reads=(6,), cout=8, act=False, emit=True))
    scales.append(None)
    uw, ub = _upfeat_phase_weights(upfeat, block_ch)
    weights.append(uw)
    biases.append(ub)
    specs.append(ConvSpec(reads=tuple(range(6)), cout=8, act=False,
                          emit=True))
    scales.append(None)

    pack = _decoder_pack(b, w)
    xq = quantize_q8(xf, q8["in"])
    if pack > 1:
        xq = pack_lanes(xq, h, w, pack)
    outs = conv_group_q8(
        xq, q8["in"], weights, biases, specs, scales, h, w * pack,
        th=th, w_img=w if pack > 1 else None, interpret=interpret)
    if pack > 1:
        outs = [unpack_lanes(o, h, w, pack) for o in outs]
    up_flow = _unpack_phases(flat_to_nhwc(outs[0], h, w, 8))
    up_feat = _unpack_phases(flat_to_nhwc(outs[1], h, w, 8))
    return up_flow, up_feat


def _fused_dense_decoder(dec_params, xcat, th, interpret=False, diff=False,
                         upfeat=None, upflow=None, xf=None, xf_shape=None):
    """DenseDecoder as one fused kernel, emitting (flow, feat) like the flax
    module. Levels narrower than 128 lanes run lane-PACKED: ``128/W`` batch
    images side by side per lane row (w_img masking keeps taps in-image).

    With ``upfeat`` (the level's up-feat Deconv params) the 4x4-stride-2
    transpose conv runs IN-KERNEL as the phase conv of
    ``_upfeat_phase_weights``; the decoder then emits only (flow, up_feat8)
    — no block activations reach HBM — and returns ``parts=None``. With
    ``upflow`` additionally, the up-FLOW deconv runs in-kernel too (a
    cin=2 phase conv reading the flow head's stripe — every spec output
    lives in the shared VMEM scratch, so later specs can read it) and the
    flow itself never reaches HBM: the decoder's only HBM outputs are the
    two phase-packed upsampled tensors the next level consumes.
    Returns ``(flow, parts, up_flow, up_feat)`` — ``flow``/``parts`` None
    when superseded by fused outputs, ``up_flow``/``up_feat`` None when
    not fused.

    ``xf``/``xf_shape``: pre-FLAT input ``[B, ceil16(c0), H*W]`` with
    ``xf_shape = (b, h, w, c0)`` — the inference path assembles the
    decoder input by an axis-1 concat of flat blocks (the 81 corr
    channels come channel-major from the cost-volume kernel, so only the
    ~36 feature/up channels ever pay an NHWC transpose). Mutually
    exclusive with ``xcat``; not supported with ``diff``.
    """
    if xf is not None:
        assert xcat is None and not diff
        b, h, w, c0 = xf_shape
    else:
        b, h, w, c0 = xcat.shape
    pack = _decoder_pack(b, w)
    block_ch = [c0] + list(_GROWTH)
    fuse_up = upfeat is not None and not diff
    fuse_flow = upflow is not None and fuse_up
    weights, biases, specs = [], [], []
    for j, g in enumerate(_GROWTH):
        cb = dec_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append(_split_newest_first(cb["kernel"], block_ch[: j + 1]))
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=tuple(range(j + 1)), cout=g,
                              emit=not fuse_up))
    pf = dec_params["PredictFlow_0"]["Conv_0"]
    weights.append(_split_newest_first(pf["kernel"], block_ch))
    biases.append(pf["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=2, act=False,
                          emit=not fuse_flow))
    if fuse_flow:
        fw, fb = _phase_conv_weights(upflow)
        weights.append([fw])
        biases.append(fb)
        # block 6 = the flow head's stripe (block ids: 0 = xcat, 1-5 =
        # growth convs, 6 = flow)
        specs.append(ConvSpec(reads=(6,), cout=8, act=False, emit=True))
    if fuse_up:
        uw, ub = _upfeat_phase_weights(upfeat, block_ch)
        weights.append(uw)
        biases.append(ub)
        specs.append(ConvSpec(reads=tuple(range(6)), cout=8, act=False,
                              emit=True))

    if diff:
        outs = conv_group_diff(
            [xcat], weights, biases, tuple(specs), h, w * pack, th,
            w if pack > 1 else None, interpret)
        cs, flow = outs[:5], outs[5]
    else:
        if xf is None:
            xf = nhwc_to_flat(xcat)
        if pack > 1:
            xf = pack_lanes(xf, h, w, pack)
        outs = conv_group(
            [xf], weights, biases, specs, h, w * pack, th=th, w_img=w,
            interpret=interpret)
        if pack > 1:
            outs = [unpack_lanes(o, h, w, pack) for o in outs]
        if fuse_flow:
            up_flow = _unpack_phases(flat_to_nhwc(outs[0], h, w, 8))
            up_feat = _unpack_phases(flat_to_nhwc(outs[1], h, w, 8))
            return None, None, up_flow, up_feat
        if fuse_up:
            flow = flat_to_nhwc(outs[0], h, w, 2)
            up_feat = _unpack_phases(flat_to_nhwc(outs[1], h, w, 8))
            return flow, None, None, up_feat
        cs = [flat_to_nhwc(o, h, w, g) for o, g in zip(outs[:5], _GROWTH)]
        flow = flat_to_nhwc(outs[5], h, w, 2)
    parts = list(cs)[::-1] + [xcat]  # newest first; concat never built
    return flow, parts, None, None


def _fused_level2_q8(dec_params, ctx_params, xf, xf_shape, q8,
                     th=56, interpret=False):
    """W8A8 variant of the L2 fused block: the 5 growth convs run int8
    through ``conv_group_q8`` (v5e int8 MXU ≈ 2x bf16, PERF.md round-4
    spike); the flow head + context conv 1 run the same int8 GEMMs but
    emit bf16. The dilated context chain + tail stay on the bf16 path.

    ``q8``: scales from :func:`calibrate_q8` — {'in': s, 'growth': [s]*5}.
    """
    b, h, w, c0 = xf_shape
    block_ch = [c0] + list(_GROWTH)
    weights, biases, specs, scales = [], [], [], []
    for j, g in enumerate(_GROWTH):
        cb = dec_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append(_split_newest_first(cb["kernel"], block_ch[: j + 1]))
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=tuple(range(j + 1)), cout=g, q8=True))
        scales.append(q8["growth"][j])
    pf = dec_params["PredictFlow_0"]["Conv_0"]
    weights.append(_split_newest_first(pf["kernel"], block_ch))
    biases.append(pf["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=2, act=False, emit=True))
    scales.append(None)
    c1p = ctx_params["ConvBlock_0"]["Conv_0"]
    weights.append(_split_newest_first(c1p["kernel"], block_ch))
    biases.append(c1p["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=128, emit=True))
    scales.append(None)

    xq = quantize_q8(xf, q8["in"])
    flow_f, y = conv_group_q8(
        xq, q8["in"], weights, biases, specs, scales, h, w,
        th=_tile_for(h, th), interpret=interpret)
    return flow_f, y


def _ctx_q8_chain(ctx_params, y_f, q8c, h, w, th, interpret=False):
    """Dilated context chain (convs 2..5 + tail + residual flow head,
    reference cost_volume_flow_net.py:138-152) as ONE W8A8 p3 conv group on
    the FLAT layout.

    The bf16 path runs these in XLA NHWC (74-213 TFLOP/s, ~2 ms at B=8 —
    PERF.md round-3 per-conv profile); int8 moves the d=2/4 128-ch convs to
    the int8 MXU (~2x) AND skips the flat->NHWC->flat round trip of ``y``
    entirely. The halo recompute that killed the round-3 bf16 fused-chain
    attempt (R/th up to 2.9x) is priced differently here: the chain's 32-row
    halo costs ~1.9x FLOPs at th=56, but at 2x int8 rate + zero layout ops
    the measured trade flips (numbers in PERF.md round-5).

    ``y_f``: flat [B, 128, H*W] bf16 (context conv 1's output from the L2
    kernel). Returns the residual-flow flat block [B, 16, H*W] bf16
    (channels 2..15 zero) to add to the fused flow head's output."""
    # im2col, not p3: the chain's single-block reads give per-dy K=128
    # GEMMs in p3 mode, and int8 buys NOTHING at K <= 128 (one MXU
    # contraction pass either way — measured neutral, PERF.md round-5);
    # im2col restores K = 9*128 = 1152 where int8 halves the passes.
    weights, biases, specs, scales = [], [], [], []
    for j, (g, dd) in enumerate(_CTX[1:], start=1):
        cb = ctx_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append([cb["kernel"]])
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=(j - 1,), cout=g, dilation=dd, q8=True,
                              im2col=True))
        scales.append(q8c["chain"][j - 1])
    pfc = ctx_params["PredictFlow_0"]["Conv_0"]
    weights.append([pfc["kernel"]])
    biases.append(pfc["bias"])
    specs.append(ConvSpec(reads=(len(_CTX) - 1,), cout=2, act=False,
                          emit=True, im2col=True))
    scales.append(None)
    yq = quantize_q8(y_f[:, :128], q8c["in"])
    (res_f,) = conv_group_q8(
        yq, q8c["in"], weights, biases, specs, scales, h, w, th=th,
        interpret=interpret)
    return res_f


def calibrate_q8(
    variables: Any,
    x: jax.Array,
    displacement: int = 4,
    warp_scales=(0.625, 1.25, 2.5, 5.0),
    normalize: bool = True,
    warp_align_corners: bool = False,
    encoder: bool = False,
    ctx: bool = False,
):
    """Static W8A8 calibration for the fused decoder blocks.

    Replays the decode in plain XLA on ``x`` (a representative batch) and
    records max-abs of each decoder input and growth conv output.
    Returns the scales pytree ``fast_apply(..., q8=...)`` consumes — wrap
    in jit; run once per weight set.

    ``encoder``/``ctx`` additionally emit scales for the W8A8 encoder and
    context chain. Both are OFF by default: measured perf dead ends on v5e
    (PERF.md round-5 — the ctx chain's p3 GEMMs have K=128 where int8 buys
    nothing and its im2col rhs build is VPU-bound; the int8 encoder loses
    ~6 ms to layout glue), kept as opt-in paths for other parts/shapes.
    """
    p = variables["params"]
    im1, im2 = x[..., :3], x[..., 3:]
    b = x.shape[0]
    both = _encoder(p["SiameseEncoder_0"], jnp.concatenate([im1, im2], axis=0))
    f1 = [f[:b] for f in both]
    f2 = [f[b:] for f in both]

    c16, c26 = f1[5], f2[5]
    if normalize:
        c16, c26 = normalize_features([c16, c26])
    corr = _leaky(cost_volume(c16, c26, displacement))
    flow, feat = _dense_decoder_xla(p["DenseDecoder_0"], corr)
    up_flow = _deconv(flow, p["Deconv_0"])
    up_feat = _deconv(feat, p["Deconv_1"])
    level_inputs = {"dec0": corr}

    xcat = None
    for i, (lvl, scale) in enumerate(zip((4, 3, 2, 1), warp_scales)):
        c1 = f1[lvl]
        warped = warp(f2[lvl], up_flow * scale,
                      align_corners=warp_align_corners)
        c1n, wn = (c1, warped)
        if normalize:
            c1n, wn = normalize_features([c1n, wn])
        corr = _leaky(cost_volume(c1n, wn, displacement))
        xcat = jnp.concatenate([corr, c1n, up_flow, up_feat], axis=-1)
        if lvl > 1:
            dec = p[f"DenseDecoder_{i + 1}"]
            level_inputs[f"dec{i + 1}"] = xcat
            flow, feat = _dense_decoder_xla(dec, xcat)
            up_flow = _deconv(flow, p[f"Deconv_{2 * i + 2}"])
            up_feat = _deconv(feat, p[f"Deconv_{2 * i + 3}"])

    # clamp: a degenerate (all-zero) calibration activation must not produce
    # scale 0 — conv_group_q8 divides by s_out/s_in (the weight-scale guard
    # in fold_quant_weights has the same 1e-30 floor)
    amax = lambda t: jnp.maximum(
        jnp.max(jnp.abs(t.astype(jnp.float32))), 1e-30)

    def growth_scales(dec, xin):
        # the fused path zero-pads the input to its 16/32-aligned stripe
        # width; pad channels are zeros and do not move the max
        sc = {"in": amax(xin) / 127.0, "growth": []}
        xcur = xin
        for j in range(5):
            cb = dec[f"ConvBlock_{j}"]["Conv_0"]
            c = _conv(xcur, cb["kernel"], cb["bias"])
            sc["growth"].append(amax(c) / 127.0)
            xcur = jnp.concatenate([c, xcur], axis=-1)
        return sc

    scales = {
        k: growth_scales(p[f"DenseDecoder_{k[3:]}"], v)
        for k, v in level_inputs.items()
    }
    scales["dec4"] = growth_scales(p["DenseDecoder_4"], xcat)

    if ctx:
        # context-chain scales (dilated chain + tail): replay context conv 1
        # on the L2 concat, then the chain
        _, feat4 = _dense_decoder_xla(p["DenseDecoder_4"], xcat)
        ctxp = p["ContextNetwork_0"]
        cb0 = ctxp["ConvBlock_0"]["Conv_0"]
        y = _conv(feat4, cb0["kernel"], cb0["bias"])
        ctx_sc = {"in": amax(y) / 127.0, "chain": []}
        for j, (g, dd) in enumerate(_CTX[1:], start=1):
            cb = ctxp[f"ConvBlock_{j}"]["Conv_0"]
            y = _conv(y, cb["kernel"], cb["bias"], dilation=dd)
            ctx_sc["chain"].append(amax(y) / 127.0)
        scales["ctx"] = ctx_sc

    if encoder:
        # encoder scales (per-conv amax of an XLA replay; the input images
        # are 8-bit sources on [-1, 1] so input quantization is ~lossless)
        xe = jnp.concatenate([im1, im2], axis=0)
        enc_sc = {"in": amax(xe) / 127.0, "levels": []}
        pe = p["SiameseEncoder_0"]
        for lvl in range(6):
            lw = []
            for jc in range(3):
                cb = pe[f"ConvBlock_{lvl * 3 + jc}"]["Conv_0"]
                xe = _conv(xe, cb["kernel"], cb["bias"],
                           stride=2 if jc == 0 else 1)
                lw.append(amax(xe) / 127.0)
            enc_sc["levels"].append(lw)
        scales["enc"] = enc_sc
    return scales


def _fused_level2(dec_params, ctx_params, xcat, th=16, interpret=False,
                  diff=False, xf=None, xf_shape=None, q8=None):
    """Fused dense decoder + flow head + context conv 1 at level 2.

    Returns flow2 (pre-context flow + context residual), NHWC fp32.
    ``xf``/``xf_shape``: pre-flat input, as in ``_fused_dense_decoder``.
    ``q8``: W8A8 scales (see :func:`calibrate_q8`) — routes the dense part
    through the int8 kernel; requires the flat path.
    """
    if xf is not None:
        assert xcat is None and not diff
        b, h, w, c0 = xf_shape
    else:
        b, h, w, c0 = xcat.shape
    block_ch = [c0] + list(_GROWTH)

    weights, biases, specs = [], [], []
    for j, g in enumerate(_GROWTH):
        cb = dec_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append(_split_newest_first(cb["kernel"], block_ch[: j + 1]))
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=tuple(range(j + 1)), cout=g))
    pf = dec_params["PredictFlow_0"]["Conv_0"]
    weights.append(_split_newest_first(pf["kernel"], block_ch))
    biases.append(pf["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=2, act=False, emit=True))
    # context conv 1 reads the same full concat (feat2)
    c1p = ctx_params["ConvBlock_0"]["Conv_0"]
    weights.append(_split_newest_first(c1p["kernel"], block_ch))
    biases.append(c1p["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=128, emit=True))

    # The DILATED context convs (d=2..16, 128ch) stay on XLA: measured
    # 0.32-0.44 ms each at B=8 (74-155 TFLOP/s), while in-kernel dilated
    # convs pay the per-dy K=128 GEMM split plus the d=8/16 halo recompute
    # (R/th up to 2.9x). The round-3 two-kernel split (halo 12 + halo 26,
    # dc3 round-tripped through HBM) was built and measured: 30.3 ms vs
    # 28.0 ms end-to-end — the layout round trips it removes are cheaper
    # than the halo recompute it adds. The chain TAIL is different: the
    # 64->32 conv runs at 25 TFLOP/s and the 32->2 flow head at 0.5
    # (cout fills 2/128 MXU rows — 0.86 ms for 11 GFLOP), so those two run
    # as one small im2col conv-group whose flat output adds to the fused
    # flow without ever transposing.
    def _ctx_dilated(y):
        for j, (g, d) in enumerate(_CTX[1:-1], start=1):
            cb = ctx_params[f"ConvBlock_{j}"]["Conv_0"]
            y = _conv(y, cb["kernel"], cb["bias"], dilation=d)
        return y  # [B, H, W, 64] after the d=16 conv

    c5 = ctx_params["ConvBlock_5"]["Conv_0"]
    pfc = ctx_params["PredictFlow_0"]["Conv_0"]

    def _ctx_tail_xla(y):
        y = _conv(y, c5["kernel"], c5["bias"])
        return _conv(y, pfc["kernel"], pfc["bias"], act=False)

    def _ctx_tail_flat(y):
        (res_f,) = conv_group(
            [nhwc_to_flat(y)],
            [[c5["kernel"]], [pfc["kernel"]]],
            [c5["bias"], pfc["bias"]],
            [ConvSpec(reads=(0,), cout=32, im2col=True),
             ConvSpec(reads=(1,), cout=2, act=False, emit=True,
                      im2col=True)],
            h, w, th=_tile_for(h, None), interpret=interpret)
        return res_f  # [B, 16, H*W] flat (channels 2..15 are zero pad)

    if diff:
        outs = conv_group_diff(
            [xcat], weights, biases, tuple(specs), h, w, th, None, interpret)
        flow, y = outs[5], outs[6]
        return flow + _ctx_tail_xla(_ctx_dilated(y))

    if xf is None:
        xf = nhwc_to_flat(xcat)
    if q8 is not None:
        flow_f, y = _fused_level2_q8(
            dec_params, ctx_params, xf, (b, h, w, c0), q8, th=th or 56,
            interpret=interpret)
        if "ctx" in q8:
            # the chain's halo (sum of dilations + tail = 32 rows) needs
            # th >= 32; fall back to one whole-H tile below that
            tc = _tile_for(h, th)
            res_f = _ctx_q8_chain(
                ctx_params, y, q8["ctx"], h, w,
                th=tc if tc >= 32 else h, interpret=interpret)
            return flat_to_nhwc(flow_f + res_f, h, w, 2)
    else:
        flow_f, y = conv_group(
            [xf], weights, biases, specs, h, w, th=th, interpret=interpret)
    res_f = _ctx_tail_flat(_ctx_dilated(flat_to_nhwc(y, h, w, 128)))
    return flat_to_nhwc(flow_f + res_f, h, w, 2)


def fast_apply_sharded(
    variables: Any,
    x: jax.Array,
    mesh,
    axis: str = "data",
    **kw,
):
    """``fast_apply`` wrapped in shard_map over the mesh's data axis.

    The fused kernels are per-example, so multi-chip serving/training is
    pure spec plumbing: params replicated, batch split over ``axis``, each
    device running the single-chip kernel program on its local shard. Works
    inside jit/grad (shard_map composes with both; the replicated-params
    transpose inserts the gradient psum automatically).

    Normalization note: normalize_features collapses feature moments across
    the local batch (reference correlation_layer.py:66-68), so each shard
    normalizes over its own sub-batch — the same semantics as the torch
    reference under DDP, where every replica sees only its local batch.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(fast_apply, **kw)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # Pallas calls defeat the varying-manual-axes checker
    )(variables, x)


def _fast_gate(variables: Any, x: jax.Array, mesh):
    """Shared usability gate for the fused path: TPU backend, PWC param
    tree, kernel-compatible shapes, mesh-divisible batch. Returns
    (usable, mesh) — mesh defaults to a 1-D all-device mesh when the
    backend is multi-device."""
    if jax.default_backend() != "tpu" and not INTERPRET_ON_CPU:
        return False, None
    if "SiameseEncoder_0" not in variables.get("params", {}):
        return False, None
    h, w = x.shape[1], x.shape[2]
    if h % 64 or w % 64 or (w // 4) % 128:
        return False, None
    if mesh is None and jax.device_count() > 1:
        from ocflow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if mesh is not None and mesh.size > 1 and x.shape[0] % mesh.size:
        return False, None
    return True, mesh


def maybe_fast_apply(
    variables: Any, x: jax.Array, diff: bool = False, mesh=None,
    axis: str = "data", th: int | None = None, q8=None,
):
    """``fast_apply`` when the fused path is usable, else None.

    Usable = TPU backend, PWC param tree, and shapes meeting the kernel
    constraints (W/4 a multiple of 128). Lets callers (e.g. train/steps.py)
    opportunistically use the fused path with a graceful flax fallback;
    ``diff=True`` returns the differentiable variant (Pallas forward, manual
    XLA adjoint) for gradient-carrying passes.

    On a multi-device backend the kernels run under shard_map with the batch
    split over ``mesh``'s ``axis`` (defaulting to a 1-D mesh over all
    devices), so the fused path survives real meshes instead of silently
    falling back to flax.
    """
    ok, mesh = _fast_gate(variables, x, mesh)
    if not ok:
        return None
    interp = INTERPRET_ON_CPU
    if mesh is not None and mesh.size > 1:
        return fast_apply_sharded(
            variables, x, mesh, axis, diff=diff, th=th, interpret=interp,
            q8=q8)
    return fast_apply(
        variables, x, diff=diff, th=th, interpret=interp, q8=q8)


def maybe_fast_apply_pair(
    variables: Any, x: jax.Array, diff: bool = True, mesh=None,
    axis: str = "data", th: int | None = None, q8=None,
):
    """``fast_apply_pair`` under the same gate/shard_map plumbing as
    ``maybe_fast_apply``; None when the fused path is unusable."""
    ok, mesh = _fast_gate(variables, x, mesh)
    if not ok:
        return None
    if mesh is not None and mesh.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        fn = functools.partial(
            fast_apply_pair, diff=diff, th=th, interpret=INTERPRET_ON_CPU,
            q8=q8)
        sp = (P(axis), P(axis))
        return shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(sp, sp),
            check_vma=False,
        )(variables, x)
    return fast_apply_pair(
        variables, x, diff=diff, th=th, interpret=INTERPRET_ON_CPU, q8=q8)


def fast_apply(
    variables: Any,
    x: jax.Array,
    displacement: int = 4,
    warp_scales=(0.625, 1.25, 2.5, 5.0),
    normalize: bool = True,
    warp_align_corners: bool = False,
    th: int | None = None,
    fuse_encoder: bool = True,
    interpret: bool = False,
    diff: bool = False,
    q8=None,
):
    """Drop-in fused replacement for ``FlowNetCV().apply(variables, x)``.

    ``q8``: optional W8A8 scales from :func:`calibrate_q8` — runs the L2
    dense block through the int8 kernel (serving only; ignored under
    ``diff``).

    H/4 must be divisible by ``th`` and W/4 by 128 (Sintel-padded 448x1024
    satisfies both). Returns ``(flow_full, flow_quarter)`` like the module.
    """
    p = variables["params"]
    im1, im2 = x[..., :3], x[..., 3:]
    b = x.shape[0]

    # Gradient-carrying runs (diff=True) use the plain XLA encoder +
    # autodiff: measured 22.6 ms vs 26.7 for the fused kernel + manual
    # adjoint at cat-batch 16 (PERF.md "Adjoint comparisons") — the fused
    # kernels only win at decode.
    if fuse_encoder and not diff:
        cat = jnp.concatenate([im1, im2], axis=0)
        if q8 is not None and "enc" in q8:
            both = _encoder_fused_q8(
                p["SiameseEncoder_0"], cat, q8["enc"], th=th,
                interpret=interpret)
        else:
            both = _encoder_fused(
                p["SiameseEncoder_0"], cat, th=th, interpret=interpret)
    else:
        both = _encoder(p["SiameseEncoder_0"], jnp.concatenate([im1, im2], axis=0))
    f1 = [f[:b] for f in both]
    f2 = [f[b:] for f in both]
    return _fast_decode(
        p, f1, f2, displacement, warp_scales, normalize, warp_align_corners,
        th, interpret, diff, q8=q8)


def fast_apply_pair(
    variables: Any,
    x: jax.Array,
    displacement: int = 4,
    warp_scales=(0.625, 1.25, 2.5, 5.0),
    normalize: bool = True,
    warp_align_corners: bool = False,
    th: int | None = None,
    interpret: bool = False,
    diff: bool = True,
    q8=None,
):
    """Forward AND backward flow sharing ONE siamese encoder pass.

    ``q8``: W8A8 scales for the BACKWARD (no-grad) decode only — the
    gradient-carrying forward keeps full precision; the backward flow
    feeds the (stop-gradient) occlusion estimate where the int8 noise
    (+0.5% EPE, PERF.md) is immaterial.

    The occ-aware unsupervised step (reference model.py:366-409) runs the
    whole network twice — on cat(img1,img2) and, under no_grad, on
    cat(img2,img1). The encoder features of the two passes are the SAME
    values (same params, same two images), so the backward-flow pass here
    is decode-only on stop_gradient'd features — a pure CSE the
    per-pass reference formulation cannot express. Exact: the top-level
    normalize_features moments are symmetric in its two arguments
    (correlation_layer.py:66-68), and every other backward-pass input is
    a stop_gradient of an identical forward value.

    Returns ``((flow_full, flow_l2), (back_full, back_l2))``; the backward
    pair carries no gradients (features AND params stop-gradient'd) and
    decodes through the inference kernels even when ``diff=True``.
    """
    p = variables["params"]
    im1, im2 = x[..., :3], x[..., 3:]
    b = x.shape[0]

    # Gradient-carrying encoder: plain XLA convs + autodiff (measured 22.6
    # ms vs 26.7 for the fused kernel + manual adjoint at cat-batch 16,
    # PERF.md "Adjoint comparisons") — the fused path only wins at decode.
    if diff:
        both = _encoder(
            p["SiameseEncoder_0"], jnp.concatenate([im1, im2], axis=0))
    else:
        both = _encoder_fused(
            p["SiameseEncoder_0"], jnp.concatenate([im1, im2], axis=0),
            th=th, interpret=interpret)
    f1 = [f[:b] for f in both]
    f2 = [f[b:] for f in both]
    fwd = _fast_decode(
        p, f1, f2, displacement, warp_scales, normalize, warp_align_corners,
        th, interpret, diff)
    sg = jax.lax.stop_gradient
    ps = sg(p)
    f1s = [sg(f) for f in f1]
    f2s = [sg(f) for f in f2]
    bwd = _fast_decode(
        ps, f2s, f1s, displacement, warp_scales, normalize,
        warp_align_corners, th, interpret, False, q8=sg(q8) if q8 else None)
    return fwd, bwd


def _fast_decode(
    p, f1, f2, displacement, warp_scales, normalize, warp_align_corners,
    th, interpret, diff, q8=None,
):
    """Coarse-to-fine decode from precomputed feature pyramids (the body of
    ``fast_apply`` below the encoder)."""
    b = f1[0].shape[0]
    use_flat = not diff  # flat-layout plumbing is inference-only
    c16, c26 = f1[5], f2[5]
    if normalize:
        c16, c26 = normalize_features([c16, c26])
    h6, w6 = c16.shape[1], c16.shape[2]
    if use_flat and _decoder_pack(b, w6) is not None:
        # corr comes channel-major straight from the CV kernel; the only
        # layout op the level pays is the zero-pad to the 16-aligned
        # stripe width (nhwc_to_flat of an 81-ch NHWC corr is gone)
        corr_f = _leaky(cost_volume_flat(c16, c26, displacement))
        nk = corr_f.shape[1]
        corr_f = jnp.pad(corr_f, ((0, 0), (0, _ceil16(nk) - nk), (0, 0)))
        if q8 is not None and corr_f.shape[1] % 32 == 0:
            flow, parts = None, None
            up_flow, up_feat = _fused_dense_decoder_q8(
                p["DenseDecoder_0"], corr_f, (b, h6, w6, nk), q8["dec0"],
                p["Deconv_1"], p["Deconv_0"], th=_tile_for(h6, th),
                interpret=interpret)
        else:
            flow, parts, up_flow, up_feat = _fused_dense_decoder(
                p["DenseDecoder_0"], None, th=_tile_for(h6, th),
                interpret=interpret, diff=diff, upfeat=p["Deconv_1"],
                upflow=p["Deconv_0"], xf=corr_f, xf_shape=(b, h6, w6, nk))
    else:
        corr = _leaky(cost_volume(c16, c26, displacement))
        if _decoder_pack(b, corr.shape[2]) is not None:
            flow, parts, up_flow, up_feat = _fused_dense_decoder(
                p["DenseDecoder_0"], corr, th=_tile_for(corr.shape[1], th),
                interpret=interpret, diff=diff, upfeat=p["Deconv_1"],
                upflow=p["Deconv_0"])
        else:
            flow, feat = _dense_decoder_xla(p["DenseDecoder_0"], corr)
            parts, up_flow, up_feat = [feat], None, None
    if up_flow is None:
        up_flow = _deconv(flow, p["Deconv_0"])
    if up_feat is None:
        up_feat = _deconv_split(parts, p["Deconv_1"])

    flow2 = None
    for i, (lvl, scale) in enumerate(zip((4, 3, 2, 1), warp_scales)):
        c1 = f1[lvl]
        warped = warp(f2[lvl], up_flow * scale, align_corners=warp_align_corners)
        c1n, wn = (c1, warped)
        if normalize:
            c1n, wn = normalize_features([c1n, wn])
        h_l, w_l = c1n.shape[1], c1n.shape[2]
        flat_lvl = use_flat and _decoder_pack(b, w_l) is not None
        if flat_lvl:
            corr_f = _leaky(cost_volume_flat(c1n, wn, displacement))
            rest = jnp.concatenate([c1n, up_flow, up_feat], axis=-1)
            rest_f = nhwc_to_flat(rest, c_pad=rest.shape[-1])
            c0 = corr_f.shape[1] + rest.shape[-1]
            pieces = [corr_f, rest_f]
            if _ceil16(c0) != c0:
                pieces.append(jnp.zeros(
                    (b, _ceil16(c0) - c0, h_l * w_l), corr_f.dtype))
            xf = jnp.concatenate(pieces, axis=1)
            xcat = None
        else:
            corr = _leaky(cost_volume(c1n, wn, displacement))
            xcat = jnp.concatenate([corr, c1n, up_flow, up_feat], axis=-1)
            xf, c0 = None, None
        if lvl > 1:
            dec = p[f"DenseDecoder_{i + 1}"]
            if flat_lvl and q8 is not None and xf.shape[1] % 32 == 0:
                flow, parts = None, None
                up_flow, up_feat = _fused_dense_decoder_q8(
                    dec, xf, (b, h_l, w_l, c0), q8[f"dec{i + 1}"],
                    p[f"Deconv_{2 * i + 3}"], p[f"Deconv_{2 * i + 2}"],
                    th=_tile_for(h_l, th), interpret=interpret)
            elif flat_lvl:
                flow, parts, up_flow, up_feat = _fused_dense_decoder(
                    dec, None, th=_tile_for(h_l, th),
                    interpret=interpret, diff=diff,
                    upfeat=p[f"Deconv_{2 * i + 3}"],
                    upflow=p[f"Deconv_{2 * i + 2}"],
                    xf=xf, xf_shape=(b, h_l, w_l, c0))
            elif _decoder_pack(b, xcat.shape[2]) is not None:
                flow, parts, up_flow, up_feat = _fused_dense_decoder(
                    dec, xcat, th=_tile_for(xcat.shape[1], th),
                    interpret=interpret, diff=diff,
                    upfeat=p[f"Deconv_{2 * i + 3}"],
                    upflow=p[f"Deconv_{2 * i + 2}"])
            else:
                flow, feat = _dense_decoder_xla(dec, xcat)
                parts, up_flow, up_feat = [feat], None, None
            if up_flow is None:
                up_flow = _deconv(flow, p[f"Deconv_{2 * i + 2}"])
            if up_feat is None:
                up_feat = _deconv_split(parts, p[f"Deconv_{2 * i + 3}"])
        else:
            # diff mode emits EVERY block activation as a VMEM-windowed
            # output; at pick_tile's th=56 the L2 level's extra windows
            # push scoped VMEM past the 100 MB limit (measured compile
            # OOM) — th=16 fits and compiles. Inference keeps th=56.
            l2_th = th
            if diff and th is None and h_l % 16 == 0:
                l2_th = 16
            flow2 = _fused_level2(
                p["DenseDecoder_4"], p["ContextNetwork_0"], xcat,
                th=_tile_for(h_l, l2_th), interpret=interpret,
                diff=diff, xf=xf, xf_shape=(b, h_l, w_l, c0),
                q8=(q8["dec4"] if (q8 is not None and use_flat and flat_lvl
                                   and xf.shape[1] % 32 == 0) else None))

    flow2 = flow2.astype(jnp.float32)
    h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
    flow1 = resize_bilinear(flow2, h, w, align_corners=True) * 20.0
    return flow1, flow2 * 5.0
