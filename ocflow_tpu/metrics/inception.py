"""InceptionV3 feature extractor for FID / Inception Score
(reference inpainting_metrics/fid/inception.py — a pytorch-fid port).

Faithful torchvision InceptionV3 architecture in flax (NHWC), including the
pytorch-fid variant (``fid_variant=True``): 1008 classes and patched pooling
— ``count_include_pad=False`` average pools inside InceptionA/C and the first
InceptionE, and a *max* pool branch in the final InceptionE (reference
inception.py:205-328, FIDInceptionA/C/E_1/E_2). Weights load from a local
npz converted from the torch FID state_dict with
:func:`convert_torch_inception` (the reference downloads the same weights
from FID_WEIGHTS_URL at runtime, inception.py:13-14). Without weights the
module still runs on random features — relative comparisons only; absolute
FID requires the converted weights, and ``init_inception`` loads strictly
(raises on any missing tensor) so a half-loaded network can't masquerade as
the real thing.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | int = 0

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if isinstance(p, int):
            p = ((p, p), (p, p))
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=p, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


def _avg_pool3(x, count_include_pad: bool = True):
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=count_include_pad,
    )


class InceptionA(nn.Module):
    pool_features: int
    # pytorch-fid's FIDInceptionA uses count_include_pad=False (ref :216-219)
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(48, (1, 1))(x)
        b2 = BasicConv(64, (5, 5), padding=2)(b2)
        b3 = BasicConv(64, (1, 1))(x)
        b3 = BasicConv(96, (3, 3), padding=1)(b3)
        b3 = BasicConv(96, (3, 3), padding=1)(b3)
        b4 = BasicConv(self.pool_features, (1, 1))(
            _avg_pool3(x, count_include_pad=not self.fid_pool)
        )
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(384, (3, 3), stride=2)(x)
        b2 = BasicConv(64, (1, 1))(x)
        b2 = BasicConv(96, (3, 3), padding=1)(b2)
        b2 = BasicConv(96, (3, 3), stride=2)(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_pool: bool = False  # FIDInceptionC, reference inception.py:243-246

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(c7, (1, 1))(x)
        b2 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b3 = BasicConv(c7, (1, 1))(x)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b3 = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)))(b3)
        b3 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b3)
        b4 = BasicConv(192, (1, 1))(
            _avg_pool3(x, count_include_pad=not self.fid_pool)
        )
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(192, (1, 1))(x)
        b1 = BasicConv(320, (3, 3), stride=2)(b1)
        b2 = BasicConv(192, (1, 1))(x)
        b2 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)))(b2)
        b2 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)))(b2)
        b2 = BasicConv(192, (3, 3), stride=2)(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    # pool branch: 'avg' (torchvision), 'fid_avg' (FIDInceptionE_1,
    # count_include_pad=False, ref :278-281), 'max' (FIDInceptionE_2,
    # ref :315-319)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1))(x)
        b2 = BasicConv(384, (1, 1))(x)
        b2a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b2)
        b2b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = BasicConv(448, (1, 1))(x)
        b3 = BasicConv(384, (3, 3), padding=1)(b3)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)))(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)))(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(
                x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
            )
        else:
            pooled = _avg_pool3(x, count_include_pad=self.pool != "fid_avg")
        b4 = BasicConv(192, (1, 1))(pooled)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 features [B, 2048], logits [B, num_classes]).

    ``fid_variant=True`` builds the pytorch-fid network (1008 classes +
    patched pooling); that's the one the reference's FID uses."""

    num_classes: int = 1000
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        fid = self.fid_variant
        # input: [B, 299, 299, 3] in [-1, 1]
        x = BasicConv(32, (3, 3), stride=2)(x)
        x = BasicConv(32, (3, 3))(x)
        x = BasicConv(64, (3, 3), padding=1)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1))(x)
        x = BasicConv(192, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid_pool=fid)(x)
        x = InceptionA(64, fid_pool=fid)(x)
        x = InceptionA(64, fid_pool=fid)(x)
        x = InceptionB()(x)
        x = InceptionC(128, fid_pool=fid)(x)
        x = InceptionC(160, fid_pool=fid)(x)
        x = InceptionC(160, fid_pool=fid)(x)
        x = InceptionC(192, fid_pool=fid)(x)
        x = InceptionD()(x)
        x = InceptionE(pool="fid_avg" if fid else "avg")(x)
        x = InceptionE(pool="max" if fid else "avg")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → [B, 2048]
        logits = nn.Dense(self.num_classes)(feats)
        return feats, logits


def init_inception(
    rng: jax.Array,
    weights_path: str | None = None,
    fid_variant: bool | None = None,
    num_classes: int | None = None,
):
    """Build + initialize InceptionV3. With ``weights_path`` the load is
    STRICT: every tensor in the tree must be present in the npz (and the FID
    variant defaults on, matching :func:`convert_torch_inception` output)."""
    if fid_variant is None:
        fid_variant = weights_path is not None
    if num_classes is None:
        num_classes = 1008 if fid_variant else 1000
    net = InceptionV3(num_classes=num_classes, fid_variant=fid_variant)
    variables = net.init(rng, jnp.zeros((1, 299, 299, 3)))
    if weights_path:
        loaded = dict(np.load(weights_path, allow_pickle=True))
        flat = _flatten(variables)
        missing = ["/".join(k) for k in flat if "/".join(k) not in loaded]
        if missing:
            raise ValueError(
                f"weights file {weights_path} is missing {len(missing)} "
                f"tensors (e.g. {missing[:3]}); refusing a partial load"
            )
        for k in flat:
            key = "/".join(k)
            if flat[k].shape != loaded[key].shape:
                raise ValueError(
                    f"{key}: shape {loaded[key].shape} != {flat[k].shape}"
                )
            flat[k] = jnp.asarray(loaded[key])
        variables = _unflatten(flat)
    return net, variables


# torchvision/pytorch-fid module name ↔ our flax module name, in graph order.
_TORCH_STEM = [
    ("Conv2d_1a_3x3", "BasicConv_0"),
    ("Conv2d_2a_3x3", "BasicConv_1"),
    ("Conv2d_2b_3x3", "BasicConv_2"),
    ("Conv2d_3b_1x1", "BasicConv_3"),
    ("Conv2d_4a_3x3", "BasicConv_4"),
]
_TORCH_MIXED = [
    ("Mixed_5b", "InceptionA_0"), ("Mixed_5c", "InceptionA_1"),
    ("Mixed_5d", "InceptionA_2"), ("Mixed_6a", "InceptionB_0"),
    ("Mixed_6b", "InceptionC_0"), ("Mixed_6c", "InceptionC_1"),
    ("Mixed_6d", "InceptionC_2"), ("Mixed_6e", "InceptionC_3"),
    ("Mixed_7a", "InceptionD_0"), ("Mixed_7b", "InceptionE_0"),
    ("Mixed_7c", "InceptionE_1"),
]
# branch submodule order per block type = our BasicConv_i creation order
_TORCH_BRANCHES = {
    "InceptionA": ["branch1x1", "branch5x5_1", "branch5x5_2",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                   "branch_pool"],
    "InceptionB": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                   "branch3x3dbl_3"],
    "InceptionC": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                   "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                   "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "InceptionD": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                   "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
    "InceptionE": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                   "branch3x3dbl_3b", "branch_pool"],
}


def convert_torch_inception(state_dict_path: str, out_path: str) -> None:
    """Convert a torchvision/pytorch-fid InceptionV3 state_dict (.pth) to the
    npz layout ``init_inception`` loads ('/'-joined flax paths). Works for
    both the FID weights (FID_WEIGHTS_URL, 1008 classes — the reference's
    choice, inception.py:13-14,205) and stock torchvision ImageNet weights.
    Raises if any state_dict conv/bn/fc tensor goes unconsumed."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v for k, v in sd.items()}
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()

    def basic_conv(torch_name: str, flax_path: str) -> None:
        w = sd[f"{torch_name}.conv.weight"].numpy()
        out[f"params/{flax_path}/Conv_0/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"params/{flax_path}/BatchNorm_0/scale"] = sd[f"{torch_name}.bn.weight"].numpy()
        out[f"params/{flax_path}/BatchNorm_0/bias"] = sd[f"{torch_name}.bn.bias"].numpy()
        out[f"batch_stats/{flax_path}/BatchNorm_0/mean"] = sd[f"{torch_name}.bn.running_mean"].numpy()
        out[f"batch_stats/{flax_path}/BatchNorm_0/var"] = sd[f"{torch_name}.bn.running_var"].numpy()
        used.update(
            f"{torch_name}.{s}" for s in
            ("conv.weight", "bn.weight", "bn.bias", "bn.running_mean", "bn.running_var")
        )

    for tname, fname in _TORCH_STEM:
        basic_conv(tname, fname)
    for tname, fname in _TORCH_MIXED:
        block_type = fname.rsplit("_", 1)[0]
        for i, branch in enumerate(_TORCH_BRANCHES[block_type]):
            basic_conv(f"{tname}.{branch}", f"{fname}/BasicConv_{i}")
    out["params/Dense_0/kernel"] = sd["fc.weight"].numpy().T
    out["params/Dense_0/bias"] = sd["fc.bias"].numpy()
    used.update(("fc.weight", "fc.bias"))

    leftover = [
        k for k in sd
        if k not in used and "num_batches_tracked" not in k
        and not k.startswith("AuxLogits.")
    ]
    if leftover:
        raise ValueError(f"unconverted inception keys: {sorted(leftover)[:10]}")
    np.savez(out_path, **out)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        node = tree
        for part in k[:-1]:
            node = node.setdefault(part, {})
        node[k[-1]] = v
    return tree
