"""End-to-end test of the training loop (ocflow_tpu/train/loop.py) — the
pl.Trainer replacement: epoch iteration, validation, checkpointing, and the
CSV metrics sink used for the EPE-vs-step curves in PERF.md."""

import csv
import os

import jax.numpy as jnp
import optax
import pytest

from ocflow_tpu.train import config as config_lib
from ocflow_tpu.train import loop, steps
from ocflow_tpu.train.state import create_train_state


@pytest.mark.slow
def test_fit_writes_csv_and_checkpoints(tmp_path):
    from ocflow_tpu import models

    cfg = config_lib.config_from_dict(
        {
            "network_type": "flow",
            "model": "simple",
            "dataset_name": "SyntheticFlow",
            "image_size": [32, 64],
            "batch_size": 8,
            "num_workers": 0,
            "max_epochs": 2,
            "log_every_n_steps": 1,
            "learning_rate": 1e-4,
            "photo_weight": 1.0,
            "smooth1_weight": 0.1,
            "smooth2_weight": 0.0,
            "metrics_csv": str(tmp_path / "metrics.csv"),
            "log_dir": str(tmp_path / "tb"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "result_dir": str(tmp_path / "results"),
            "extra_dataset_size": 16,
        }
    )

    import numpy as np

    from ocflow_tpu.data.datasets import SyntheticFlow
    from ocflow_tpu.data.pipeline import DataLoader

    ds = SyntheticFlow(size=16, image_size=(32, 64))
    train_loader = DataLoader(ds, cfg.batch_size, shuffle=True, seed=0,
                              num_workers=0, drop_last=True)
    val_loader = DataLoader(ds, cfg.batch_size, shuffle=False, num_workers=0)

    net = models.SimpleFlowNet()
    sample = ds[0]
    state = create_train_state(
        net,
        __import__("jax").random.PRNGKey(0),
        jnp.asarray(sample["images"][None]),
        optax.adam(cfg.learning_rate),
    )
    train_step, eval_step = steps.make_unsupervised_flow_step(cfg.as_hparams())

    state = loop.fit(cfg, state, train_step, eval_step, train_loader, val_loader)

    # CSV: train rows at every step (log_every_n_steps=1) + one val row/epoch
    with open(cfg.metrics_csv) as f:
        rows = list(csv.DictReader(f))
    phases = [r["phase"] for r in rows]
    assert phases.count("val") == 2
    assert phases.count("train") == 4  # 16 samples / batch 8 = 2 steps/epoch
    train_rows = [r for r in rows if r["phase"] == "train"]
    assert all(float(r["loss"]) > 0 for r in train_rows)
    assert "epe" in rows[0]  # SyntheticFlow provides GT flow -> EPE logged
    # rows are aligned to one header even though val lacks images_per_sec
    assert all(r["images_per_sec"] == "" for r in rows if r["phase"] == "val")

    # checkpointing happened (Orbax directory per epoch)
    assert os.path.isdir(cfg.checkpoint_dir) and os.listdir(cfg.checkpoint_dir)
    assert int(state.step) == 4


def test_csv_logger_extends_header_for_new_keys(tmp_path):
    """A phase that introduces metrics after the header is written (the GAN
    regime's eval keys differ from its train keys) extends the header in
    place instead of silently dropping columns."""
    path = str(tmp_path / "m.csv")
    log = loop.CsvLogger(path)
    log.row("train", 0, 0, {"d_loss": 1.0, "g_loss": 2.0})
    log.row("val", 1, 0, {"loss": 3.0, "rhole": 4.0})
    log.row("train", 2, 1, {"d_loss": 5.0, "g_loss": 6.0})
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert set(rows[0]) == {"phase", "step", "epoch", "d_loss", "g_loss",
                            "loss", "rhole"}
    assert rows[0]["d_loss"] == "1.0" and rows[0]["loss"] == ""
    assert rows[1]["loss"] == "3.0" and rows[1]["rhole"] == "4.0"
    assert rows[2]["g_loss"] == "6.0"


@pytest.mark.slow
def test_train_cli_find_best_lr(tmp_path, monkeypatch, capsys):
    """CLI wiring of the LR range test (reference --find_best_lr,
    test.py:74-84): the trainer runs lr_find, prints and adopts the
    suggestion, then fits from fresh state."""
    import sys

    import yaml

    cfg = {
        "network_type": "flow",
        "model": "simple",
        "dataset_name": "SyntheticFlow",
        "image_size": [32, 64],
        "batch_size": 8,
        "num_workers": 0,
        "max_epochs": 1,
        "log_every_n_steps": 1,
        "learning_rate": 1e-3,
        "find_best_lr": True,
        "log_dir": str(tmp_path / "tb"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "result_dir": str(tmp_path / "results"),
        "extra_dataset_size": 16,
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    sys.path.insert(0, "/root/repo")
    import train as train_cli

    monkeypatch.setattr(sys, "argv", ["train.py", "--config", str(cfg_path)])
    train_cli.main()
    out = capsys.readouterr().out
    assert "find_best_lr suggestion:" in out
    lr_line = [ln for ln in out.splitlines()
               if "find_best_lr suggestion:" in ln][0]
    suggested = float(lr_line.split(":")[1])
    # the range test sweeps [1e-7, 1.0]; the suggestion must land inside
    assert 1e-7 <= suggested <= 1.0
