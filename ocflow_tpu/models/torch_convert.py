"""Torch → flax weight converters for the flow model zoo.

The reference's only pretrained-flow story is torch checkpoints (its PWCNet
downloads sniklaus weights at runtime, pwc_net.py:222-223; its training
scripts save Lightning ``state_dict``s). These converters map a reference
``state_dict`` (file or in-memory dict) onto our flax parameter trees so
that (a) reference-trained checkpoints can be served by this framework and
(b) network-level parity can be *proven* by golden tests (identical weights,
identical input → identical flow), not asserted.

Conventions (verified numerically in tests/test_parity_networks.py):
- torch ``nn.Conv2d``      OIHW  → flax ``nn.Conv``          HWIO
- torch ``ConvTranspose2d`` IOHW → flax ``nn.ConvTranspose`` HWIO, kernel
  spatially flipped (torch's transposed conv is the adjoint of its
  cross-correlation; flax's is a fractionally-strided convolution).
- torch ``BatchNorm2d`` (weight, bias, running_mean, running_var) →
  flax ``nn.BatchNorm`` (params.scale, params.bias, batch_stats.mean,
  batch_stats.var).

Each converter consumes the *entire* state_dict and raises on unknown keys
(modulo documented dead parameters in the reference, e.g. FlowNetCV's unused
``deconv2``, cost_volume_flow_net.py:104), so silent name drift is
impossible.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_kernel(w) -> np.ndarray:
    """OIHW → HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def _deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) → flax HWIO with spatial flip."""
    w = _np(w)
    return np.flip(w, (2, 3)).transpose(2, 3, 0, 1).copy()


class _Consumer:
    """state_dict view that tracks which keys were used."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def take(self, key: str):
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self, allow_unused: tuple[str, ...] = ()) -> None:
        leftover = [
            k
            for k in self.sd
            if k not in self.used
            and not any(k.startswith(p) for p in allow_unused)
            and "num_batches_tracked" not in k
        ]
        if leftover:
            raise ValueError(f"unconverted torch keys: {sorted(leftover)[:10]}")


def _conv(sd: _Consumer, name: str, bias: bool = True) -> dict:
    """bias=False ⇒ the flax conv has no bias param either (BN follows)."""
    out = {"kernel": _conv_kernel(sd.take(f"{name}.weight"))}
    if bias:
        out["bias"] = _np(sd.take(f"{name}.bias"))
    return out


def _deconv(sd: _Consumer, name: str, bias: bool = True) -> dict:
    out = {"kernel": _deconv_kernel(sd.take(f"{name}.weight"))}
    if bias:
        out["bias"] = _np(sd.take(f"{name}.bias"))
    else:
        out["bias"] = np.zeros(out["kernel"].shape[-1], np.float32)
    return out


def _bn(sd: _Consumer, name: str) -> tuple[dict, dict]:
    params = {"scale": _np(sd.take(f"{name}.weight")),
              "bias": _np(sd.take(f"{name}.bias"))}
    stats = {"mean": _np(sd.take(f"{name}.running_mean")),
             "var": _np(sd.take(f"{name}.running_var"))}
    return params, stats


def convert_flownetcv(state_dict: Mapping[str, object]) -> dict:
    """Reference FlowNetCV (cost_volume_flow_net.py:22-246) → flax variables
    for ``ocflow_tpu.models.FlowNetCV`` (no normalization layers → params
    only)."""
    sd = _Consumer(state_dict)
    params: dict = {}

    # Siamese encoder: per level [a(s2), aa, b]; level 6 declares them as
    # conv6aa(s2), conv6a, conv6b (reference :30-47).
    enc_names = []
    for lvl in range(1, 6):
        enc_names += [f"conv{lvl}a", f"conv{lvl}aa", f"conv{lvl}b"]
    enc_names += ["conv6aa", "conv6a", "conv6b"]
    enc = {
        f"ConvBlock_{i}": {"Conv_0": _conv(sd, f"{n}.0")}
        for i, n in enumerate(enc_names)
    }
    params["SiameseEncoder_0"] = enc

    # Dense decoders at levels 6..2 with their deconv/upfeat pairs
    # (reference :58-104); level 2 has no deconvs (deconv2 is dead weight).
    deconv_i = 0
    for dec_i, lvl in enumerate((6, 5, 4, 3, 2)):
        dec = {
            f"ConvBlock_{j}": {"Conv_0": _conv(sd, f"conv{lvl}_{j}.0")}
            for j in range(5)
        }
        dec["PredictFlow_0"] = {"Conv_0": _conv(sd, f"predict_flow{lvl}")}
        params[f"DenseDecoder_{dec_i}"] = dec
        if lvl > 2:
            params[f"Deconv_{deconv_i}"] = {
                "ConvTranspose_0": _deconv(sd, f"deconv{lvl}")
            }
            params[f"Deconv_{deconv_i + 1}"] = {
                "ConvTranspose_0": _deconv(sd, f"upfeat{lvl}")
            }
            deconv_i += 2

    # Context network dc_conv1..7 (reference :106-112).
    ctx = {
        f"ConvBlock_{j}": {"Conv_0": _conv(sd, f"dc_conv{j + 1}.0")}
        for j in range(6)
    }
    ctx["PredictFlow_0"] = {"Conv_0": _conv(sd, "dc_conv7")}
    params["ContextNetwork_0"] = ctx

    sd.finish(allow_unused=("deconv2.",))
    return {"params": params}


def convert_pwcnet(state_dict: Mapping[str, object]) -> dict:
    """Reference PWCNet (pwc_net.py:34-240, the sniklaus port) → flax
    variables for ``ocflow_tpu.models.PWCNet``.

    Accepts either the reference's key naming (``netExtractor.netOne.0.w…``)
    or the raw sniklaus URL checkpoint (``moduleExtractor.moduleOne…`` —
    the reference renames module→net at load, pwc_net.py:223), so the only
    pretrained flow weights in the ecosystem load directly."""
    state_dict = {
        k.replace("module", "net") if k.startswith("module") else k: v
        for k, v in state_dict.items()
    }
    sd = _Consumer(state_dict)
    params: dict = {}

    levels = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]
    enc = {}
    for lvl, name in enumerate(levels):
        for k, seq_i in enumerate((0, 2, 4)):
            enc[f"ConvBlock_{3 * lvl + k}"] = {
                "Conv_0": _conv(sd, f"netExtractor.{name}.{seq_i}")
            }
    params["SiameseEncoder_0"] = enc

    # Decoder(L) for L=6..2 → DenseDecoder_0..4. Decoder(L<6) also owns the
    # netUpflow/netUpfeat applied to the PREVIOUS level's outputs
    # (pwc_net.py:116-117,163-164) → our Deconv pairs created after
    # DenseDecoder_{i} for levels 6..3.
    dec_names = ["netSix", "netFiv", "netFou", "netThr", "netTwo"]
    convs = ["netOne", "netTwo", "netThr", "netFou", "netFiv"]
    for i, dname in enumerate(dec_names):
        dec = {
            f"ConvBlock_{j}": {"Conv_0": _conv(sd, f"{dname}.{cname}.0")}
            for j, cname in enumerate(convs)
        }
        dec["PredictFlow_0"] = {"Conv_0": _conv(sd, f"{dname}.netSix.0")}
        params[f"DenseDecoder_{i}"] = dec
    for i, dname in enumerate(dec_names[1:]):  # netFiv..netTwo own the deconvs
        params[f"Deconv_{2 * i}"] = {
            "ConvTranspose_0": _deconv(sd, f"{dname}.netUpflow")
        }
        params[f"Deconv_{2 * i + 1}"] = {
            "ConvTranspose_0": _deconv(sd, f"{dname}.netUpfeat")
        }

    ctx = {
        f"ConvBlock_{j}": {"Conv_0": _conv(sd, f"netRefiner.netMain.{2 * j}")}
        for j in range(6)
    }
    ctx["PredictFlow_0"] = {"Conv_0": _conv(sd, "netRefiner.netMain.12")}
    params["ContextNetwork_0"] = ctx

    sd.finish()
    return {"params": params}


def convert_flownets(state_dict: Mapping[str, object], use_bn: bool = True) -> dict:
    """Reference FlowNetS (flow_net_s.py:10-108) → flax variables for
    ``ocflow_tpu.models.FlowNetS``."""
    sd = _Consumer(state_dict)
    params: dict = {}
    stats: dict = {}

    convs = ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
             "conv5", "conv5_1", "conv6", "conv6_1"]
    for i, n in enumerate(convs):
        block = {"Conv_0": _conv(sd, f"{n}.0", bias=not use_bn)}
        if use_bn:
            bn_p, bn_s = _bn(sd, f"{n}.1")
            block["BatchNorm_0"] = bn_p
            stats[f"ConvBlock_{i}"] = {"BatchNorm_0": bn_s}
        params[f"ConvBlock_{i}"] = block

    for i, lvl in enumerate((6, 5, 4, 3, 2)):
        params[f"PredictFlow_{i}"] = {"Conv_0": _conv(sd, f"predict_flow{lvl}")}
    # creation order: up-flow deconv (bias=False in torch) then feature deconv
    pairs = [("upsampled_flow6_to_5", "deconv5"),
             ("upsampled_flow5_to_4", "deconv4"),
             ("upsampled_flow4_to_3", "deconv3"),
             ("upsampled_flow3_to_2", "deconv2")]
    for i, (up, dec) in enumerate(pairs):
        params[f"Deconv_{2 * i}"] = {"ConvTranspose_0": _deconv(sd, up, bias=False)}
        params[f"Deconv_{2 * i + 1}"] = {"ConvTranspose_0": _deconv(sd, f"{dec}.0")}

    sd.finish()
    out = {"params": params}
    if use_bn:
        out["batch_stats"] = stats
    return out


def _proj_block(sd: _Consumer, prefix: str) -> tuple[dict, dict]:
    """Reference Downsample/Upsample (simple_flow_net.py:6-57): three
    conv(bias=False)+BN+LeakyReLU stages → ProjDown/ProjUp ConvBlock_0..2."""
    params, stats = {}, {}
    for j in range(3):
        bn_p, bn_s = _bn(sd, f"{prefix}.bn{j + 1}")
        params[f"ConvBlock_{j}"] = {
            "Conv_0": _conv(sd, f"{prefix}.conv{j + 1}", bias=False),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBlock_{j}"] = {"BatchNorm_0": bn_s}
    return params, stats


def convert_simpleflownet(state_dict: Mapping[str, object]) -> dict:
    """Reference SimpleFlowNet (simple_flow_net.py:60-141) → flax variables
    for ``ocflow_tpu.models.SimpleFlowNet``."""
    sd = _Consumer(state_dict)
    params: dict = {}
    stats: dict = {}

    for i in range(5):
        p, s = _proj_block(sd, f"down{i + 1}")
        params[f"ProjDown_{i}"] = p
        stats[f"ProjDown_{i}"] = s
    for i in range(5):
        p, s = _proj_block(sd, f"up{i + 1}")
        params[f"ProjUp_{i}"] = p
        stats[f"ProjUp_{i}"] = s
    # predict_flow5..0 → PredictFlowStack_0..5; torch Sequential of three
    # conv() wrappers: .0.0 (32ch), .1.0 (16ch), .2.0 (2ch, no act).
    for i, lvl in enumerate((5, 4, 3, 2, 1, 0)):
        params[f"PredictFlowStack_{i}"] = {
            "ConvBlock_0": {"Conv_0": _conv(sd, f"predict_flow{lvl}.0.0")},
            "ConvBlock_1": {"Conv_0": _conv(sd, f"predict_flow{lvl}.1.0")},
            "Conv_0": _conv(sd, f"predict_flow{lvl}.2.0"),
        }

    sd.finish()
    return {"params": params, "batch_stats": stats}


def variables_to_npz(variables: dict, out_path: str) -> None:
    """Flatten a flax variables tree to '/'-joined keys and save as npz."""
    flat: dict[str, np.ndarray] = {}

    def rec(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, Mapping):
                rec(v, key)
            else:
                flat[key] = np.asarray(v)

    rec(variables, "")
    np.savez(out_path, **flat)


def npz_to_variables(path: str) -> dict:
    """Inverse of :func:`variables_to_npz`."""
    loaded = np.load(path)
    tree: dict = {}
    for key in loaded.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = loaded[key]
    return tree


def convert_checkpoint(path: str, network: str, out_path: str) -> None:
    """Convert a torch checkpoint file to a flax npz.

    ``network`` ∈ {'flownetcv', 'pwc', 'flownets', 'simple'}. Lightning
    checkpoints are unwrapped (``state_dict`` entry, ``model.`` / ``flow_pred.``
    prefixes stripped)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {
        k.split(".", 1)[1] if k.startswith(("model.", "flow_pred.")) else k: v
        for k, v in sd.items()
    }
    conv = {
        "flownetcv": convert_flownetcv,
        "pwc": convert_flownetcv,
        "pwcnet": convert_pwcnet,
        "flownets": convert_flownets,
        "simple": convert_simpleflownet,
    }[network]
    variables_to_npz(conv(sd), out_path)
