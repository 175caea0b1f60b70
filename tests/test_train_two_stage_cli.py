"""CLI-level test of the two-stage GC trainer path (train_unsupervised.py
network_type=twostage, reference TwoStageModelGC model.py:1105-1395 +
FinetuningInpainting test_unsupervised.py:13-31).

Drives main() end-to-end on CPU with a tiny config: asserts the run trains,
writes the metrics CSV, saves a checkpoint, and emits the full-pipeline
qualitative panel (frames / GT-flow warp / occlusion / completed frame) —
the plumbing that wires remat + pipeline viz into the twostage branch.
"""

import os
import sys

import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_stage_gc_cli(tmp_path, monkeypatch):
    cfg = {
        "network_type": "twostage",
        "with_gt_flow": True,
        "inpainting_stage": "gated",
        "remat": True,
        "loss_type": "pixel-wise",
        "dataset_name": "SyntheticFlowWarp",
        "dataset_size": 24,  # 19 train / 2 val / 3 test
        "image_size": [64, 128],
        "batch_size": 2,
        "num_workers": 0,
        "max_epochs": 1,
        "unfreeze_epoch": 1,
        "patience": 10,
        "learning_rate": 1e-4,
        "finetune_lr": 1e-5,
        "log_every_n_steps": 1,
        "log_image_every_epoch": 1,
        "metrics_csv": str(tmp_path / "metrics.csv"),
        "log_dir": str(tmp_path / "tb"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "result_dir": str(tmp_path),
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    sys.path.insert(0, REPO)
    try:
        import train_unsupervised as tu
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(sys, "argv", ["train_unsupervised.py", "--config", str(cfg_path)])
    tu.main()

    csv_text = (tmp_path / "metrics.csv").read_text()
    assert "pixelwise" in csv_text.splitlines()[0]
    assert len(csv_text.splitlines()) > 2
    assert (tmp_path / "val_0" / "pipeline.png").exists()
    assert os.listdir(tmp_path / "ckpt")
