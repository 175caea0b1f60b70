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


def test_eval_padding_on_mesh(rng):
    """Ragged eval batch (5 items, 8 devices) gets padded and runs sharded."""
    mesh = parallel.make_mesh()
    ds = data.SyntheticFlow(size=5, image_size=(32, 32))
    loader = data.DataLoader(ds, batch_size=5, drop_last=False)
    batches = list(data.device_iterator(loader, mesh))
    assert len(batches) == 1
    assert batches[0]["images"].shape[0] % 8 == 0
