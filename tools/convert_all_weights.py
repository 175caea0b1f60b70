"""One-shot weight conversion: a directory of torch checkpoints → the npz
set this framework loads.

The reference ecosystem's pretrained weights are all torch: sniklaus PWC
URL weights (reference models/networks/pwc_net.py:222-223), Lightning
training checkpoints (reference test.py saves ``state_dict`` files whose
sub-modules are spliced by attribute prefix, models/model.py:948-954,
:1133-1135), torchvision VGG16 for the perceptual loss
(models/model.py:123-152) and the pytorch-fid InceptionV3
(inpainting_metrics/fid/inception.py:13-14). This tool classifies each
checkpoint by its state_dict KEYS (filenames are not trusted), routes it to
the matching converter in ``ocflow_tpu.models.torch_convert`` /
``losses.perceptual`` / ``metrics.inception``, and writes
``<stem>.<network>.npz`` plus a ``manifest.json`` with sha256 checksums of
source and output — so the day real weight files appear, trained-weight
parity closes with one command:

    python tools/convert_all_weights.py --src /path/to/ckpts --out weights/

Every converter used here is golden-tested against an in-process torch
forward in tests/test_parity_networks.py / test_vgg_converter.py /
test_parity_inception.py; classification is dry-run-tested on synthetic
state_dicts in tests/test_misc.py.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys


def classify_state_dict(keys) -> str | None:
    """Map a (prefix-stripped) torch state_dict key set to a network name.

    Returns one of the converter names below, or None when unrecognized.
    Order matters: the most specific signatures test first.
    """
    ks = set(keys)

    def any_start(prefix):
        return any(k.startswith(prefix) for k in ks)

    if any_start("Conv2d_1a_3x3.conv."):
        return "inception"
    if any_start("features.0.") and any_start("features.28."):
        return "vgg16"
    if any_start("moduleExtractor.") or any_start("netExtractor."):
        return "pwcnet"
    if any_start("fe6_0."):
        return "flow_occ_cv2"
    if any_start("conv1a.") and any_start("predict_occ6."):
        return "flow_occ_cv"
    if any_start("conv1a."):
        return "flownetcv"
    if any_start("occlusion_estimators."):
        return "flow_occ_fpn"
    if any_start("feature_pyramid_network."):
        return "flownet_fpn"
    if any_start("bottleneck10."):
        return "eflownet2" if any_start("predict_flow3.") else "eflownet"
    if any_start("conv_redir."):
        return "flownetc" if any_start("predict_flow6.") else None
    if any_start("conv3_1.") and any_start("predict_occ6."):
        return "flow_occ_s"
    if any_start("conv3_1.") and any_start("upsampled_occ6_to_5."):
        return "occ_s"
    if any_start("conv3_1."):
        return "flownets"
    if any_start("down1.") and any_start("predict_flow5."):
        return "simple_flow_occ" if any_start("predict_occ5.") else "simple"
    if any_start("down1.") and any_start("predict_occ5."):
        return "simple_occ"
    if any_start("down1.") and any_start("up6."):
        return "inpainting"
    if any_start("coarse_net.") or any_start("refine_conv_net."):
        return "sanet"
    if any_start("discriminator_net."):
        return "sa_discriminator"
    return None


# converter name → (callable taking a state_dict, flax-side note)
def _converters():
    from ocflow_tpu.models import torch_convert as tc

    return {
        "flownetcv": tc.convert_flownetcv,
        "pwcnet": tc.convert_pwcnet,
        "flownets": tc.convert_flownets,
        "flownetc": tc.convert_flownetc,
        "simple": tc.convert_simpleflownet,
        "eflownet": tc.convert_eflownet,
        "eflownet2": tc.convert_eflownet2,
        "flownet_fpn": tc.convert_flownet_fpn,
        "flow_occ_fpn": tc.convert_flow_occ_net_fpn,
        "flow_occ_cv": tc.convert_flow_occ_net_cv,
        "flow_occ_cv2": tc.convert_flow_occ_net_cv2,
        "flow_occ_s": tc.convert_flow_occ_net_s,
        "simple_flow_occ": tc.convert_simple_flow_occ_net,
        "simple_occ": tc.convert_simple_occlusion_net,
        "occ_s": tc.convert_occlusion_net_s,
        "inpainting": tc.convert_inpainting_net,
        "sanet": tc.convert_inpaint_sanet,
        "sa_discriminator": tc.convert_inpaint_discriminator,
    }


_ROLE_PREFIXES = ("model.", "flow_pred.", "generator.", "discriminator.",
                  "occ_pred.")


def _strip_roles(sd: dict) -> dict[str, dict]:
    """Split a (possibly combined) Lightning state_dict into role → subdict.

    A plain net state_dict returns {'': sd}. A combined checkpoint (e.g.
    generator.* + discriminator.*) yields one entry per role so each
    sub-module converts separately (reference splices them the same way,
    model.py:948-954)."""
    roles: dict[str, dict] = {}
    for k, v in sd.items():
        for p in _ROLE_PREFIXES:
            if k.startswith(p):
                roles.setdefault(p, {})[k[len(p):]] = v
                break
        else:
            roles.setdefault("", {})[k] = v
    # model./flow_pred. are plain wrappers, not roles — merge into ''
    for p in ("model.", "flow_pred."):
        if p in roles:
            inner = roles.pop(p)
            nested = _strip_roles(inner)
            for r, d in nested.items():
                roles.setdefault(r, {}).update(d)
    return roles


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def convert_file(path: str, out_dir: str) -> list[dict]:
    """Convert one checkpoint file; returns manifest entries."""
    import torch

    from ocflow_tpu.models.torch_convert import variables_to_npz

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if not isinstance(sd, dict):
        print(f"skip {path}: not a state_dict", file=sys.stderr)
        return []

    stem = os.path.splitext(os.path.basename(path))[0]
    entries = []
    converters = _converters()
    for role, sub in _strip_roles(sd).items():
        name = classify_state_dict(sub.keys())
        if name is None:
            # whole-file converters with their own loaders
            probe = classify_state_dict(sd.keys())
            if probe in ("vgg16", "inception") and role == "":
                out_path = os.path.join(out_dir, f"{stem}.{probe}.npz")
                if probe == "vgg16":
                    from ocflow_tpu.losses.perceptual import convert_torch_vgg16
                    convert_torch_vgg16(path, out_path)
                else:
                    from ocflow_tpu.metrics.inception import (
                        convert_torch_inception,
                    )
                    convert_torch_inception(path, out_path)
                entries.append({
                    "source": path, "network": probe, "role": "",
                    "output": out_path, "source_sha256": _sha256(path),
                    "output_sha256": _sha256(out_path),
                })
                return entries
            print(f"skip {path} role={role!r}: unrecognized keys "
                  f"(e.g. {sorted(sub)[:3]})", file=sys.stderr)
            continue
        variables = converters[name](sub)
        tag = role.rstrip(".") + "." if role else ""
        out_path = os.path.join(out_dir, f"{stem}.{tag}{name}.npz")
        variables_to_npz(variables, out_path)
        entries.append({
            "source": path, "network": name, "role": role.rstrip("."),
            "output": out_path, "source_sha256": _sha256(path),
            "output_sha256": _sha256(out_path),
        })
        print(f"{path} [{role or 'root'}] -> {out_path} ({name})")
    return entries


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", required=True,
                    help="directory of .pth/.pt/.ckpt files (or one file)")
    ap.add_argument("--out", default="weights",
                    help="output directory for npz files + manifest.json")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    if os.path.isfile(args.src):
        files = [args.src]
    else:
        files = sorted(
            os.path.join(args.src, f) for f in os.listdir(args.src)
            if f.endswith((".pth", ".pt", ".ckpt", ".tar")))
    manifest = []
    for path in files:
        try:
            manifest.extend(convert_file(path, args.out))
        except Exception as e:  # keep going; report at the end
            print(f"FAILED {path}: {type(e).__name__}: {e}", file=sys.stderr)
    man_path = os.path.join(args.out, "manifest.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"{len(manifest)} conversions -> {man_path}")
    return manifest


if __name__ == "__main__":
    main()
