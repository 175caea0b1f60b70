"""Training loop: the TPU-native replacement for pl.Trainer.

Owns: epoch iteration, seeded splits, data-parallel sharding over the mesh,
metric aggregation, TensorBoard logging (rank-0 only), best-checkpoint saving
on ``monitored_loss`` and early stopping (reference test.py:61-76).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np

from ocflow_tpu import data as data_lib
from ocflow_tpu import parallel
from ocflow_tpu.train.config import Config
from ocflow_tpu.utils.checkpoint import CheckpointManager
from ocflow_tpu.utils.profiling import StepTimer


class SummaryLogger:
    """TensorBoard scalars/images via flax's writer; no-op if unavailable."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if enabled and jax.process_index() == 0:
            try:
                from flax.metrics import tensorboard

                os.makedirs(log_dir, exist_ok=True)
                self._writer = tensorboard.SummaryWriter(log_dir)
            except Exception:
                self._writer = None

    def scalar(self, tag: str, value, step: int):
        if self._writer is not None:
            self._writer.scalar(tag, float(value), step)

    def image(self, tag: str, img, step: int):
        if self._writer is not None:
            self._writer.image(tag, img, step)

    def histogram(self, tag: str, values, step: int, bins: int = 64):
        """Gradient/param histograms (reference on_after_backward,
        model.py:1266-1270)."""
        if self._writer is not None:
            self._writer.histogram(tag, np.asarray(values).ravel(), step, bins=bins)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


class CsvLogger:
    """Append metric rows to a CSV file (rank-0 only; no-op when path='').

    One header from the first row's keys; later rows are aligned to it
    (missing keys -> '', extra keys dropped) so train and val rows with
    different metric sets can share a file via the 'phase' column."""

    def __init__(self, path: str):
        self._path = path if path and jax.process_index() == 0 else None
        self._keys = None

    def row(self, phase: str, step: int, epoch: int, metrics: dict):
        if self._path is None:
            return
        vals = {k: float(v) for k, v in metrics.items()}
        if self._keys is None:
            self._keys = sorted(vals)
            new = not os.path.exists(self._path)
            if new:
                d = os.path.dirname(self._path)
                if d:
                    os.makedirs(d, exist_ok=True)
            with open(self._path, "a") as f:
                if new:
                    f.write("phase,step,epoch," + ",".join(self._keys) + "\n")
        elif not set(vals) <= set(self._keys):
            # a phase introduced metrics the header doesn't carry (e.g. the
            # GAN regime's eval keys differ from its train keys): extend the
            # header in place so the new columns aren't silently dropped
            self._keys = sorted(set(self._keys) | set(vals))
            with open(self._path) as f:
                lines = f.read().splitlines()
            old_keys = lines[0].split(",")[3:]
            with open(self._path, "w") as f:
                f.write("phase,step,epoch," + ",".join(self._keys) + "\n")
                for line in lines[1:]:
                    parts = line.split(",")
                    old = dict(zip(old_keys, parts[3:]))
                    f.write(",".join(parts[:3]) + ","
                            + ",".join(old.get(k, "") for k in self._keys)
                            + "\n")
        with open(self._path, "a") as f:
            f.write(
                f"{phase},{step},{epoch},"
                + ",".join(
                    "" if k not in vals else repr(vals[k]) for k in self._keys
                )
                + "\n"
            )


def make_loaders(cfg: Config):
    """Dataset → seeded 80/10/10 split → loaders (reference
    lightning_datamodule.py:50-69; ``overfit`` makes train=val=test)."""
    kwargs = {}
    if not cfg.dataset_name.startswith("Synthetic"):
        kwargs["root"] = cfg.root
    elif cfg.dataset_size:
        kwargs["size"] = cfg.dataset_size
    if "Inpainting" in cfg.dataset_name:
        kwargs["occlusion_ratio"] = cfg.occlusion_ratio
        kwargs["static_occ"] = cfg.static_occ
    if cfg.image_size:
        kwargs["image_size"] = tuple(cfg.image_size)
    dataset = data_lib.build_dataset(cfg.dataset_name, **kwargs)
    if cfg.get("cache_data", False):
        dataset = data_lib.CacheDataset(dataset)
    if cfg.overfit:
        train_ds = val_ds = test_ds = dataset
    else:
        train_ds, val_ds, test_ds = data_lib.random_split(
            dataset, (0.8, 0.1, 0.1), seed=42
        )
    shard_index, num_shards = jax.process_index(), jax.process_count()

    def mk(ds, shuffle):
        # train drops the ragged last batch (static shapes, no recompiles);
        # eval pads up by keeping it — a small split must still yield batches
        kw = dict(
            batch_size=cfg.batch_size,
            shuffle=shuffle,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            drop_last=shuffle,
            shard_index=shard_index,
            num_shards=num_shards,
        )
        if cfg.get("device_cache", False):
            return data_lib.DeviceCacheLoader(
                ds, cache_dtype=cfg.get("device_cache_dtype", "bfloat16"),
                **kw)
        return data_lib.DataLoader(ds, **kw)

    return mk(train_ds, True), mk(val_ds, False), mk(test_ds, False)


def fit(
    cfg: Config,
    state,
    train_step: Callable,
    eval_step: Callable,
    train_loader,
    val_loader,
    mesh=None,
    step_args: tuple = (),
    viz_fn: Optional[Callable] = None,
):
    """Run the epoch loop; returns the final state.

    ``step_args``: extra positional args threaded to the step fns (e.g. the
    frozen-variables pytree of the two-stage regime).
    ``viz_fn(state, batch) -> {tag: uint8 HxWx3}``: qualitative panels,
    logged to TensorBoard and dumped to ``result_dir/val_{epoch}`` every
    ``log_image_every_epoch`` epochs (reference model.py:626-650).
    """
    logger = SummaryLogger(cfg.log_dir)
    csv = CsvLogger(cfg.get("metrics_csv", ""))
    ckpt = CheckpointManager(cfg.checkpoint_dir)
    if mesh is None and len(jax.devices()) > 1:
        mesh = parallel.make_mesh(cfg.mesh_shape)
    if mesh is not None:
        state = jax.device_put(state, parallel.replicated(mesh))

    best = float("inf")
    bad_epochs = 0
    global_step = 0
    timer = StepTimer()

    for epoch in range(cfg.max_epochs):
        train_loader.set_epoch(epoch)
        for batch in data_lib.device_iterator(train_loader, mesh):
            state, metrics = train_step(state, *step_args, batch)
            timer.tick(cfg.batch_size)
            if global_step % cfg.log_every_n_steps == 0:
                # ONE host fetch for the whole metrics dict (each float()
                # is a separate device round trip under the axon relay)
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                loss_val = host.get("loss", next(iter(host.values())))
                if not np.isfinite(loss_val):
                    # failure detection: surface divergence instead of
                    # silently training on NaNs (the reference only had a
                    # debug print inside ReconLoss)
                    raise FloatingPointError(
                        f"non-finite training loss {loss_val} at step "
                        f"{global_step} (epoch {epoch})"
                    )
                for k, v in host.items():
                    logger.scalar(f"train_{k}", v, global_step)
                logger.scalar("images_per_sec", timer.images_per_sec, global_step)
                csv.row(
                    "train",
                    global_step,
                    epoch,
                    {**host, "images_per_sec": timer.images_per_sec},
                )
            global_step += 1

        # validation
        val_metrics = []
        first_val_batch = None
        for batch in data_lib.device_iterator(val_loader, mesh):
            if first_val_batch is None:
                first_val_batch = batch
            val_metrics.append(
                {
                    k: float(v)
                    for k, v in jax.device_get(
                        eval_step(state, *step_args, batch)
                    ).items()
                }
            )

        # qualitative panels (reference dumps val images every
        # log_image_every_epoch epochs, model.py:626-650)
        if (
            viz_fn is not None
            and first_val_batch is not None
            and epoch % cfg.log_image_every_epoch == 0
            and jax.process_index() == 0
        ):
            panels = viz_fn(state, first_val_batch)
            val_dir = os.path.join(cfg.result_dir, f"val_{epoch}")
            os.makedirs(val_dir, exist_ok=True)
            import imageio.v2 as iio

            for tag, img in panels.items():
                logger.image(f"val/{tag}", img, epoch)
                iio.imwrite(os.path.join(val_dir, f"{tag}.png"), img)
        if not val_metrics:
            continue
        avg = {
            k: float(np.mean([m[k] for m in val_metrics])) for k in val_metrics[0]
        }
        # multi-host: all hosts must see the same val metric or their
        # early-stop/best-ckpt decisions diverge (cluster hang)
        avg = parallel.global_mean_metrics(avg)
        for k, v in avg.items():
            logger.scalar(f"val_{k}", v, epoch)
        csv.row("val", global_step, epoch, avg)
        monitored = avg.get("loss", next(iter(avg.values())))
        logger.scalar("monitored_loss", monitored, epoch)
        logger.flush()

        if jax.process_index() == 0:
            ckpt.save(epoch, state, monitored)
        if monitored < best - 1e-12:
            best = monitored
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs >= cfg.patience:
                break
    return state


def evaluate(cfg: Config, state, eval_step, loader, mesh=None, step_args=()):
    """Test loop: mean metrics over a loader."""
    out = []
    for batch in data_lib.device_iterator(loader, mesh):
        out.append(
            {
                k: float(v)
                for k, v in jax.device_get(
                    eval_step(state, *step_args, batch)
                ).items()
            }
        )
    if not out:
        return {}
    local = {k: float(np.mean([m[k] for m in out])) for k in out[0]}
    return parallel.global_mean_metrics(local)
