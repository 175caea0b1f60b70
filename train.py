"""Supervised trainer CLI — mirrors the reference's test.py:17-84.

Dispatches network_type ∈ {flow, occ, flow-occ, inpainting} to the matching
model family + jitted step functions, builds the data pipeline, and runs the
epoch loop with best-checkpointing + early stopping.

    python train.py --config configs/supervised.yaml
"""

from __future__ import annotations

import argparse

import jax
import optax


def main():
    parser = argparse.ArgumentParser(description="Supervised OCFlow-TPU trainer")
    parser.add_argument("--config", default="configs/supervised.yaml")
    parser.add_argument("--max_epochs", type=int, default=None)
    args = parser.parse_args()

    from ocflow_tpu import models
    from ocflow_tpu.train import config as config_lib
    from ocflow_tpu.train import loop, steps, steps_inpainting
    from ocflow_tpu.train.state import create_train_state
    from ocflow_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = config_lib.load_config(args.config)
    if args.max_epochs is not None:
        cfg.max_epochs = args.max_epochs

    network_type = cfg.network_type
    assert network_type in ("flow", "occ", "flow-occ", "inpainting"), network_type

    train_loader, val_loader, test_loader = loop.make_loaders(cfg)
    sample = next(iter(train_loader))
    hparams = cfg.as_hparams()

    rng = jax.random.PRNGKey(cfg.seed)
    tx = optax.adam(cfg.learning_rate)

    if network_type == "flow":
        net = _flow_net(models, cfg)
        train_step, eval_step = steps.make_supervised_flow_step(hparams)
    elif network_type == "occ":
        net = models.build("occ", cfg.model)
        train_step, eval_step = steps.make_supervised_occ_step(hparams)
    elif network_type == "flow-occ":
        net = models.build("flow_occ", cfg.model)
        train_step, eval_step = steps.make_supervised_flow_occ_step(hparams)
    else:  # inpainting
        net = models.build("inpainting", cfg.model)
        train_step, eval_step = steps_inpainting.make_supervised_inpainting_step(hparams)

    def build_state(tx_):
        if network_type == "inpainting":
            return create_train_state(
                net, rng, sample["images"][:1, ..., :3], tx_,
                masks=sample["occ"][:1])
        return create_train_state(net, rng, sample["images"][:1], tx_)

    if cfg.find_best_lr:
        # LR range test before fitting, as the reference's --find_best_lr
        # (test.py:74-84): sweep 100 steps, print the suggestion, adopt it,
        # then train from FRESH state.
        from ocflow_tpu.train.lr_finder import lr_find

        suggested, _, _ = lr_find(
            build_state, lambda: (train_step, eval_step), train_loader,
            num_steps=100)
        print("find_best_lr suggestion:", suggested)
        cfg.learning_rate = suggested
        tx = optax.adam(suggested)

    state = build_state(tx)
    state = loop.fit(cfg, state, train_step, eval_step, train_loader, val_loader)
    results = loop.evaluate(cfg, state, eval_step, test_loader)
    print("test:", results)


def _flow_net(models, cfg):
    if cfg.model == "pwc":
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        return models.FlowNetCV(displacement=cfg.displacement, dtype=dtype)
    return models.build("flow", cfg.model)


if __name__ == "__main__":
    main()
