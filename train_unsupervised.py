"""Unsupervised / two-stage trainer CLI — mirrors the reference's
test_unsupervised.py:13-139.

network_type dispatch:
  flow       → unsupervised FlowStage (plain / with_occ / occ_aware)
  inpainting → InpaintingStage (recon/VGG) or GAN (adversarial_loss)
  twostage   → TwoStageGC (with_gt_flow) / TwoStage (no GT flow), with the
               FinetuningInpainting unfreeze schedule.

    python train_unsupervised.py --config configs/unsupervised.yaml
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    parser = argparse.ArgumentParser(description="Unsupervised OCFlow-TPU trainer")
    parser.add_argument("--config", default="configs/unsupervised.yaml")
    parser.add_argument("--max_epochs", type=int, default=None)
    args = parser.parse_args()

    from ocflow_tpu import models
    from ocflow_tpu.losses.perceptual import init_vgg16
    from ocflow_tpu.utils import enable_compilation_cache
    from ocflow_tpu.train import config as config_lib
    from ocflow_tpu.train import loop, steps, steps_inpainting, steps_two_stage
    from ocflow_tpu.train.state import TrainState, create_train_state
    from ocflow_tpu.utils.checkpoint import load_subtree

    enable_compilation_cache()
    cfg = config_lib.load_config(args.config)
    if args.max_epochs is not None:
        cfg.max_epochs = args.max_epochs

    network_type = cfg.network_type
    assert network_type in ("flow", "inpainting", "twostage"), network_type

    train_loader, val_loader, test_loader = loop.make_loaders(cfg)
    sample = next(iter(train_loader))
    hparams = cfg.as_hparams()
    rng = jax.random.PRNGKey(cfg.seed)

    vgg = None
    if cfg.loss_type == "vgg":
        vgg_net, vgg_vars = init_vgg16(
            jax.random.PRNGKey(0), cfg.vgg_weights or None
        )
        vgg = (vgg_net.apply, vgg_vars)

    if network_type == "flow":
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        net = (
            models.FlowNetCV(displacement=cfg.displacement, dtype=dtype)
            if cfg.model == "pwc"
            else models.build("flow", cfg.model)
        )
        state = create_train_state(
            net, rng, sample["images"][:1], optax.adam(cfg.learning_rate)
        )
        train_step, eval_step = steps.make_unsupervised_flow_step(hparams)

    elif network_type == "inpainting":
        gen_key = "gated_org" if cfg.org else cfg.model
        gen_kwargs = (
            {"remat": True} if cfg.remat and "gated" in gen_key else {}
        )
        gen = models.build("inpainting", gen_key, **gen_kwargs)
        state = create_train_state(
            gen, rng, sample["image"][:1], optax.adam(cfg.learning_rate),
            masks=sample["occ"][:1],
        )
        if cfg.adversarial_loss:
            dis = models.build("discriminator", "gated_org" if cfg.org else "gated")
            dis_in = jnp.concatenate([sample["image"][:1], sample["occ"][:1]], axis=-1)
            # D trains at 4x the G learning rate (reference model.py:922-925)
            dis_state = create_train_state(
                dis, jax.random.PRNGKey(1), dis_in, optax.adam(4 * cfg.learning_rate)
            )
            gan_step = steps_inpainting.make_gan_inpainting_step(hparams, vgg=vgg)

            def train_step(state_pair, batch):
                gen_state, dis_state = state_pair
                gen_state, dis_state, metrics = gan_step(gen_state, dis_state, batch)
                return (gen_state, dis_state), metrics

            _, plain_eval = steps_inpainting.make_inpainting_stage_step(
                {**hparams, "loss_type": "pixel-wise"}
            )

            def eval_step(state_pair, batch):
                return plain_eval(state_pair[0], batch)

            state = (state, dis_state)
        else:
            train_step, eval_step = steps_inpainting.make_inpainting_stage_step(
                hparams, vgg=vgg
            )

    else:  # twostage
        if cfg.with_gt_flow:
            occ_net = models.SimpleOcclusionNet()
            inp_key = cfg.get("inpainting_stage", "gated")
            inp_net = models.build(
                "inpainting",
                {"simple": "simple", "gated": "gated", "gated_org": "gated_org"}[inp_key],
                # full-res GC training backprops through the (gated-)frozen
                # inpainter even before unfreeze — remat is as mandatory
                # here as in the pure-inpainting regime (see Config.remat)
                **({"remat": True} if cfg.remat and "gated" in inp_key else {}),
            )
            occ_vars = occ_net.init(rng, sample["images"][:1])
            inp_vars = inp_net.init(
                jax.random.PRNGKey(1), sample["images"][:1, ..., :3],
                jnp.zeros_like(sample["images"][:1, ..., :1]),
            )
            if cfg.using_pretrained_inpainting and cfg.inpainting_root:
                inp_vars = dict(inp_vars)
                inp_vars["params"] = load_subtree(
                    cfg.inpainting_root, "params", template={"params": inp_vars["params"]}
                )
            steps_per_epoch = max(len(train_loader), 1)
            tx = steps_two_stage.make_two_stage_gc_optimizer(
                cfg.learning_rate,
                cfg.finetune_lr,
                unfreeze_step=cfg.unfreeze_epoch * steps_per_epoch,
            )
            state = TrainState.create(
                apply_fn=None,
                params={"occ": occ_vars["params"], "inpaint": inp_vars["params"]},
                batch_stats={
                    "occ": occ_vars.get("batch_stats", {}),
                    "inpaint": inp_vars.get("batch_stats", {}),
                },
                tx=tx,
            )
            train_step, eval_step = steps_two_stage.make_two_stage_gc_step(
                hparams, occ_apply=occ_net.apply, inpaint_apply=inp_net.apply, vgg=vgg
            )
        else:
            flow_net = models.SimpleFlowNet()
            occ_net = models.SimpleOcclusionNet()
            inp_net = models.InpaintingNet()
            flow_vars = flow_net.init(rng, sample["images"][:1])
            inp_vars = inp_net.init(
                jax.random.PRNGKey(1), sample["images"][:1, ..., :3],
                jnp.zeros_like(sample["images"][:1, ..., :1]),
            )
            if cfg.flow_root:
                flow_vars = load_pytree_variables(cfg.flow_root, flow_vars)
            if cfg.inpainting_root:
                inp_vars = load_pytree_variables(cfg.inpainting_root, inp_vars)
            state = create_train_state(
                occ_net, jax.random.PRNGKey(2), sample["images"][:1],
                optax.adam(cfg.learning_rate),
            )
            inner_train, inner_eval = steps_two_stage.make_two_stage_step(
                hparams, flow_apply=flow_net.apply, inpaint_apply=inp_net.apply
            )
            frozen = {"flow": flow_vars, "inpaint": inp_vars}
            train_step = lambda st, batch: inner_train(st, frozen, batch)
            eval_step = lambda st, batch: inner_eval(st, frozen, batch)

    viz_fn = None
    if network_type == "flow":
        # qualitative panels (reference model.py:626-650 dumps val images):
        # frames / predicted-flow color / warped frame2 (+ GT flow when the
        # dataset carries one)
        from ocflow_tpu.ops.warp import warp as _warp
        from ocflow_tpu.utils import panels as panels_lib

        @jax.jit
        def _viz_fwd(st, images):
            flow, _, _ = steps._apply_flow_net(
                st, st.params, st.batch_stats, images, train=False)
            warped = _warp(images[..., 3:], flow, grad_img=False)
            return flow, warped

        def viz_fn(st, batch):
            imgs = jnp.asarray(batch["images"][:1], jnp.float32)
            flow, warped = jax.device_get(_viz_fwd(st, imgs))
            img1 = np.asarray(imgs[0, ..., :3], np.float32)
            img2 = np.asarray(imgs[0, ..., 3:], np.float32)
            out = {"warp": panels_lib.warp_panel(
                img1, img2, warped[0], flow[0])}
            if "flow" in batch:
                out["flow"] = panels_lib.flow_panel(
                    img1, img2, flow[0],
                    np.asarray(batch["flow"][0], np.float32))
            return out

    elif network_type == "inpainting":
        from ocflow_tpu.utils import panels as panels_lib

        @jax.jit
        def _viz_gen(st, occluded, occ):
            _, refined, _ = steps_inpainting._apply_generator(
                st, st.params, st.batch_stats, occluded, occ, train=False)
            return refined

        def viz_fn(st, batch):
            gs = st[0] if isinstance(st, tuple) else st
            occluded = jnp.asarray(batch["occluded"][:1], jnp.float32)
            occ = jnp.asarray(batch["occ"][:1], jnp.float32)
            refined = np.asarray(
                jax.device_get(_viz_gen(gs, occluded, occ))[0], np.float32)
            image = np.asarray(batch["image"][0], np.float32)
            occ0 = np.asarray(batch["occ"][0], np.float32)
            complete = refined * occ0 + image * (1.0 - occ0)
            return {"inpaint": panels_lib.inpainting_panel(
                np.asarray(occluded[0], np.float32), refined, image,
                complete)}

    elif network_type == "twostage" and cfg.with_gt_flow:
        # full-pipeline panel: frames / GT-flow warp / predicted occlusion /
        # completed frame (the reference's qualitative val dump for
        # TwoStageModelGC, model.py:1256-1300)
        from ocflow_tpu.ops.warp import warp as _warp
        from ocflow_tpu.utils import panels as panels_lib

        @jax.jit
        def _viz_two(st, images, flow):
            warped = _warp(images[..., 3:], flow, align_corners=True,
                           grad_img=False)
            occ_vars = {"params": st.params["occ"]}
            if st.batch_stats and st.batch_stats.get("occ"):
                occ_vars["batch_stats"] = st.batch_stats["occ"]
            occ_soft = occ_net.apply(occ_vars, images, train=False)
            inp_vars = {"params": st.params["inpaint"]}
            if st.batch_stats and st.batch_stats.get("inpaint"):
                inp_vars["batch_stats"] = st.batch_stats["inpaint"]
            out = inp_net.apply(inp_vars, warped, occ_soft, train=False)
            completed = out[1] if isinstance(out, tuple) else out
            return warped, occ_soft, completed

        def viz_fn(st, batch):
            imgs = jnp.asarray(batch["images"][:1], jnp.float32)
            flow = jnp.asarray(batch["flow"][:1], jnp.float32)
            warped, occ_soft, completed = jax.device_get(
                _viz_two(st, imgs, flow))
            img1 = np.asarray(imgs[0, ..., :3], np.float32)
            img2 = np.asarray(imgs[0, ..., 3:], np.float32)
            return {"pipeline": panels_lib.pipeline_panel(
                img1, img2, np.asarray(flow[0], np.float32), warped[0],
                occ_soft[0], completed[0])}

    state = loop.fit(cfg, state, train_step, eval_step, train_loader,
                     val_loader, viz_fn=viz_fn)
    if network_type == "inpainting" and cfg.adversarial_loss:
        # GAN checkpoints are (gen_state, dis_state) tuples; ALSO export a
        # generator-only checkpoint with the standard top-level "params"
        # contract so two-stage splicing (inpainting_root -> load_subtree
        # 'params', reference model.py:1133-1135) and evaluate.py work on
        # GAN-trained inpainting the same as on stage-trained.
        from ocflow_tpu.utils.checkpoint import save_pytree

        gen_path = os.path.join(cfg.checkpoint_dir, "generator")
        save_pytree(gen_path, {"params": state[0].params,
                               "batch_stats": state[0].batch_stats})
        print("generator checkpoint:", gen_path)
    results = loop.evaluate(cfg, state, eval_step, test_loader)
    print("test:", results)


def load_pytree_variables(path, template):
    from ocflow_tpu.utils.checkpoint import load_pytree

    return load_pytree(path, template)


if __name__ == "__main__":
    main()
