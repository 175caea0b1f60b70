"""Typed config + YAML loading.

Replaces the reference's raw ``yaml.load`` dicts (test.py:32-34) with a
dataclass carrying the same keys (network_type / model / dataset_name /
photo_weight / ...), so reference experiment configs port over directly.
``image_size`` accepts plain YAML lists (no ``!!python/tuple`` tags)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple


@dataclasses.dataclass
class Config:
    # dispatch
    network_type: str = "flow"  # flow | occ | flow-occ | inpainting | twostage
    model: str = "simple"
    dataset_name: str = "SyntheticFlow"
    root: str = ""
    # shapes / batching
    image_size: Optional[Tuple[int, int]] = None
    batch_size: int = 16
    num_workers: int = 6
    overfit: bool = False
    # number of samples for the Synthetic* procedural datasets
    dataset_size: Optional[int] = None
    # wrap the dataset in an in-memory sample cache (data.CacheDataset) —
    # first epoch pays decode/generation, later epochs are RAM reads
    cache_data: bool = False
    # upload the whole dataset to device HBM once and serve batches as
    # on-device gathers (data.DeviceCacheLoader) — removes the
    # host->device transfer from the step loop; dataset must fit in HBM
    device_cache: bool = False
    device_cache_dtype: str = "bfloat16"
    # optimization
    learning_rate: float = 1e-3
    # run the LR range test before fitting and adopt its suggestion
    # (reference --find_best_lr → trainer.tuner.lr_find, test.py:74-84)
    find_best_lr: bool = False
    max_epochs: int = 100
    patience: int = 60  # early stopping
    seed: int = 42
    # unsupervised flow weights (reference unsupervised_config.yml)
    photo_weight: float = 1.0
    smooth1_weight: float = 0.0
    smooth2_weight: float = 1.0
    with_occ: bool = False
    occ_aware: bool = False
    displacement: int = 4
    # inpainting / two-stage
    loss_type: str = "pixel-wise"  # pixel-wise | vgg
    reconst_weight: float = 1.0
    pixelwise_weight: float = 1.0
    smoothness_weight: float = 0.0
    occlusion_ratio: float = 0.3
    static_occ: bool = False
    adversarial_loss: bool = False
    org: bool = False
    # rematerialize gated-conv generator blocks in the backward pass
    # (jax.checkpoint) — required for full-res (448x1024) GAN inpainting
    # training to fit the 16 GB chip (see models/gated_conv.py)
    remat: bool = False
    with_gt_flow: bool = True
    using_pretrained_inpainting: bool = False
    unfreeze_epoch: int = 23  # FinetuningInpainting (test_unsupervised.py:25)
    finetune_lr: float = 1e-5
    flow_root: str = ""
    inpainting_root: str = ""
    supervised_flow: bool = False
    vgg_weights: str = ""
    # logging / output
    log_every_n_steps: int = 20
    log_image_every_epoch: int = 10
    n_display_images: int = 1
    result_dir: str = "results"
    log_dir: str = "tensorboard_logs"
    checkpoint_dir: str = "checkpoints"
    # optional CSV metrics sink (rank-0): train rows every
    # log_every_n_steps and one val row per epoch — a greppable/plottable
    # record alongside TensorBoard (used for the EPE-vs-step curves in
    # PERF.md; empty = disabled)
    metrics_csv: str = ""
    # parallelism
    mesh_shape: Optional[Tuple[int, ...]] = None  # default: all devices on 'data'
    # compute dtype for the forward pass ('float32' | 'bfloat16')
    compute_dtype: str = "float32"
    # extra passthrough keys
    extra: dict = dataclasses.field(default_factory=dict)

    def get(self, key: str, default=None):
        """dict-style access for the step factories (hparams protocol)."""
        if hasattr(self, key):
            return getattr(self, key)
        return self.extra.get(key, default)

    def as_hparams(self) -> dict:
        d = dataclasses.asdict(self)
        d.update(d.pop("extra"))
        return d


def load_config(path: str) -> Config:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


def config_from_dict(raw: dict) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    known = {k: v for k, v in raw.items() if k in fields}
    extra = {k: v for k, v in raw.items() if k not in fields}
    if "image_size" in known and known["image_size"] is not None:
        known["image_size"] = tuple(known["image_size"])
    if "mesh_shape" in known and known["mesh_shape"] is not None:
        known["mesh_shape"] = tuple(known["mesh_shape"])
    return Config(**known, extra=extra)
