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

from typing import Any

import jax
import jax.numpy as jnp

from ocflow_tpu.ops.cost_volume import normalize_features
from ocflow_tpu.ops.pallas.conv_chain_kernel import (
    ConvSpec,
    conv_group,
    flat_to_nhwc,
    nhwc_to_flat,
)
from ocflow_tpu.ops.pallas.cost_volume_kernel import cost_volume_fused as cost_volume
from ocflow_tpu.ops.resize import resize_bilinear
from ocflow_tpu.ops.warp import warp

_GROWTH = (128, 128, 96, 64, 32)
_CTX = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))


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


def _encoder(params, x):
    """SiameseEncoder: 6 levels x (stride-2 conv + 2 convs)."""
    feats = []
    for lvl in range(6):
        for j in range(3):
            cb = params[f"ConvBlock_{lvl * 3 + j}"]["Conv_0"]
            x = _conv(x, cb["kernel"], cb["bias"], stride=2 if j == 0 else 1)
        feats.append(x)
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


def pick_tile(h: int) -> int:
    """Largest measured-good row tile dividing H (112 -> 56: 175 TFLOP/s on
    v5e vs 75 at th=8; halo recompute shrinks with th)."""
    for th in (56, 32, 28, 16, 14, 8, 4):
        if h % th == 0:
            return th
    return h


def _fused_dense_decoder(dec_params, xcat, th, interpret=False):
    """DenseDecoder as one fused kernel, emitting (flow, feat) like the flax
    module. Used at pyramid levels whose W is a multiple of 128 but which
    still need the full feature concat for the up-feat deconv (level 3)."""
    b, h, w, c0 = xcat.shape
    block_ch = [c0] + list(_GROWTH)
    weights, biases, specs = [], [], []
    for j, g in enumerate(_GROWTH):
        cb = dec_params[f"ConvBlock_{j}"]["Conv_0"]
        weights.append(_split_newest_first(cb["kernel"], block_ch[: j + 1]))
        biases.append(cb["bias"])
        specs.append(ConvSpec(reads=tuple(range(j + 1)), cout=g, emit=True))
    pf = dec_params["PredictFlow_0"]["Conv_0"]
    weights.append(_split_newest_first(pf["kernel"], block_ch))
    biases.append(pf["bias"])
    specs.append(ConvSpec(reads=tuple(range(6)), cout=2, act=False, emit=True))

    outs = conv_group(
        [nhwc_to_flat(xcat)], weights, biases, specs, h, w, th=th,
        interpret=interpret)
    cs = [flat_to_nhwc(o, h, w, g) for o, g in zip(outs[:5], _GROWTH)]
    flow = flat_to_nhwc(outs[5], h, w, 2)
    feat = jnp.concatenate(cs[::-1] + [xcat], axis=-1)  # newest first
    return flow, feat


def _fused_level2(dec_params, ctx_params, xcat, th=16, interpret=False):
    """Fused dense decoder + flow head + full context network at level 2.

    Returns flow2 (pre-context flow + context residual), NHWC fp32.
    """
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

    xf = nhwc_to_flat(xcat)
    flow_f, y = conv_group(
        [xf], weights, biases, specs, h, w, th=th, interpret=interpret)

    # remaining context convs (dilated) as single fused convs
    for j, (g, d) in enumerate(_CTX[1:], start=1):
        cb = ctx_params[f"ConvBlock_{j}"]["Conv_0"]
        (y,) = conv_group(
            [y], [[cb["kernel"]]], [cb["bias"]],
            [ConvSpec(reads=(0,), cout=g, dilation=d, emit=True)],
            h, w, th=th, interpret=interpret)
    pf = ctx_params["PredictFlow_0"]["Conv_0"]
    (res_f,) = conv_group(
        [y], [[pf["kernel"]]], [pf["bias"]],
        [ConvSpec(reads=(0,), cout=2, act=False, emit=True)],
        h, w, th=th, interpret=interpret)

    flow = flat_to_nhwc(flow_f, h, w, 2) + flat_to_nhwc(res_f, h, w, 2)
    return flow


def fast_apply(
    variables: Any,
    x: jax.Array,
    displacement: int = 4,
    warp_scales=(0.625, 1.25, 2.5, 5.0),
    normalize: bool = True,
    warp_align_corners: bool = False,
    th: int | None = None,
    interpret: bool = False,
):
    """Drop-in fused replacement for ``FlowNetCV().apply(variables, x)``.

    H/4 must be divisible by ``th`` and W/4 by 128 (Sintel-padded 448x1024
    satisfies both). Returns ``(flow_full, flow_quarter)`` like the module.
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

    flow2 = None
    for i, (lvl, scale) in enumerate(zip((4, 3, 2, 1), warp_scales)):
        c1 = f1[lvl]
        warped = warp(f2[lvl], up_flow * scale, align_corners=warp_align_corners)
        c1n, wn = (c1, warped)
        if normalize:
            c1n, wn = normalize_features([c1n, wn])
        corr = _leaky(cost_volume(c1n, wn, displacement))
        xcat = jnp.concatenate([corr, c1n, up_flow, up_feat], axis=-1)
        if lvl > 1:
            dec = p[f"DenseDecoder_{i + 1}"]
            if xcat.shape[2] % 128 == 0:  # level 3 at Sintel res
                flow, feat = _fused_dense_decoder(
                    dec, xcat, th=th or pick_tile(xcat.shape[1]),
                    interpret=interpret)
            else:
                flow, feat = _dense_decoder_xla(dec, xcat)
            up_flow = _deconv(flow, p[f"Deconv_{2 * i + 2}"])
            up_feat = _deconv(feat, p[f"Deconv_{2 * i + 3}"])
        else:
            flow2 = _fused_level2(
                p["DenseDecoder_4"], p["ContextNetwork_0"], xcat,
                th=th or pick_tile(xcat.shape[1]), interpret=interpret)

    flow2 = flow2.astype(jnp.float32)
    h, w = flow2.shape[1] * 4, flow2.shape[2] * 4
    flow1 = resize_bilinear(flow2, h, w, align_corners=True) * 20.0
    return flow1, flow2 * 5.0
