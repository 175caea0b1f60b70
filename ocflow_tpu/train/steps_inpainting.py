"""Inpainting training regimes: supervised, unsupervised pre-training, and
SN-PatchGAN adversarial training (reference models/inpainting_model.py,
models/model.py:511-925).

Batches: supervised uses {'images','flow','occ'}; the stage/GAN regimes use
{'image' (complete), 'occ' (synthetic mask)} from the inpainting datasets.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ocflow_tpu import losses
from ocflow_tpu.losses.perceptual import vgg_perceptual_loss
from ocflow_tpu.ops import warp
from ocflow_tpu.train.state import TrainState


def _apply_generator(state, params, batch_stats, imgs, masks, train):
    """Run an inpainting generator; normalizes (coarse, refined) | refined
    signatures and threads BN/spectral-norm stats."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train and batch_stats:
        out, updates = state.apply_fn(
            variables, imgs, masks, train=True, mutable=["batch_stats"]
        )
        new_stats = updates["batch_stats"]
    else:
        out = state.apply_fn(variables, imgs, masks, train=False)
        new_stats = batch_stats
    if isinstance(out, tuple):
        coarse, refined = out
    else:
        coarse, refined = None, out
    return coarse, refined, new_stats


def make_supervised_inpainting_step(hparams: dict | None = None):
    """Warp frame 2 by GT flow, zero the GT-occluded region, inpaint, and take
    masked L1 over the hole (reference models/inpainting_model.py:62-75;
    the reference calls its InpaintingNet without the mask argument — a bug —
    here the mask is passed, matching the net's actual signature)."""

    def loss_fn(state, params, batch_stats, batch, train):
        imgs = batch["images"]
        img1, img2 = imgs[..., :3], imgs[..., 3:]
        occ = batch["occ"]
        img_warped = warp(img2, batch["flow"], align_corners=False, grad_img=False)
        _, img_completed, new_stats = _apply_generator(
            state, params, batch_stats, img_warped * (1.0 - occ), occ, train
        )
        loss = losses.masked_l1_loss(img_completed, img1, occ)
        return loss, ({"loss": loss}, new_stats)

    return _build_steps(loss_fn)


def make_inpainting_stage_step(hparams: dict, vgg=None):
    """Unsupervised inpainting pre-training on synthetic occlusions
    (reference InpaintingStageModel, model.py:557-592).

    hparams: loss_type ∈ {'pixel-wise','vgg'}, reconst_weight.
    vgg: optional (apply_fn, variables) for the perceptual loss.
    """
    loss_type = hparams.get("loss_type", "pixel-wise")
    reconst_weight = hparams.get("reconst_weight", 1.0)
    if loss_type == "vgg" and vgg is None:
        raise ValueError("loss_type='vgg' requires a vgg=(apply_fn, variables)")

    def loss_fn(state, params, batch_stats, batch, train):
        imgs, masks = batch["image"], batch["occ"]
        coarse, recon, new_stats = _apply_generator(
            state, params, batch_stats, imgs, masks, train
        )
        recon_total, rhole, runhole = losses.recon_loss(imgs, recon, masks, coarse)
        if loss_type == "vgg":
            vgg_loss = vgg_perceptual_loss(vgg[0], vgg[1], recon, imgs)
            loss = vgg_loss + reconst_weight * recon_total
            metrics = {
                "loss": loss,
                "vgg_loss": vgg_loss,
                "reconst_loss": recon_total,
            }
        else:
            loss = recon_total
            metrics = {"loss": loss, "rhole": rhole, "runhole": runhole}
        return loss, (metrics, new_stats)

    return _build_steps(loss_fn)


def make_gan_inpainting_step(hparams: dict, vgg=None):
    """SN-PatchGAN training (reference InpaintingGConvModel, model.py:732-781).

    Faithful to the reference's manual-optimization ordering: the
    discriminator steps first on (real, completed) pairs, then the generator
    steps against the *updated* discriminator (model.py:748-755). Both updates
    are fused into one jitted function.

    Returns ``train_step(gen_state, dis_state, batch) →
    (gen_state, dis_state, metrics)``.
    """
    loss_type = hparams.get("loss_type", "pixel-wise")
    if loss_type == "vgg" and vgg is None:
        raise ValueError("loss_type='vgg' requires a vgg=(apply_fn, variables)")

    def _apply_dis(dis_state, params, batch_stats, x, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            out, updates = dis_state.apply_fn(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return out, updates["batch_stats"]
        return dis_state.apply_fn(variables, x, train=False), batch_stats

    @jax.jit
    def train_step(gen_state: TrainState, dis_state: TrainState, batch):
        imgs, masks = batch["image"], batch["occ"]

        # Generator forward (no grad yet — reused for the D step)
        coarse, recon, gen_stats = _apply_generator(
            gen_state, gen_state.params, gen_state.batch_stats, imgs, masks, True
        )
        complete = recon * masks + imgs * (1.0 - masks)
        pos = jnp.concatenate([imgs, masks], axis=-1)
        neg = jnp.concatenate([jax.lax.stop_gradient(complete), masks], axis=-1)

        # --- discriminator update -----------------------------------------
        def d_loss_fn(d_params):
            pos_neg = jnp.concatenate([pos, neg], axis=0)
            pred, d_stats = _apply_dis(
                dis_state, d_params, dis_state.batch_stats, pos_neg, True
            )
            pred_pos, pred_neg = jnp.split(pred, 2, axis=0)
            return losses.sn_dis_loss(pred_pos, pred_neg), d_stats

        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            dis_state.params
        )
        dis_state = dis_state.apply_gradients(grads=d_grads, batch_stats=d_stats)

        # --- generator update vs updated D --------------------------------
        def g_loss_fn(g_params):
            coarse_g, recon_g, g_stats = _apply_generator(
                gen_state, g_params, gen_state.batch_stats, imgs, masks, True
            )
            complete_g = recon_g * masks + imgs * (1.0 - masks)
            neg_g = jnp.concatenate([complete_g, masks], axis=-1)
            pred_neg, _ = _apply_dis(
                dis_state, dis_state.params, dis_state.batch_stats, neg_g, False
            )
            g_loss = losses.sn_gen_loss(pred_neg)
            recon_total, rhole, runhole = losses.recon_loss(
                imgs, recon_g, masks, coarse_g
            )
            if loss_type == "vgg":
                content = vgg_perceptual_loss(vgg[0], vgg[1], recon_g, imgs)
            else:
                content = recon_total
            whole = g_loss + content
            aux = {
                "g_loss": g_loss,
                "content_loss": content,
                "occluded": rhole,
                "non_occluded": runhole,
            }
            return whole, (aux, g_stats)

        (whole, (aux, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_state.params)
        gen_state = gen_state.apply_gradients(grads=g_grads, batch_stats=g_stats)

        metrics = {"whole_loss": whole, "d_loss": d_loss, **aux}
        return gen_state, dis_state, metrics

    return train_step


def _build_steps(loss_fn: Callable):
    @jax.jit
    def train_step(state: TrainState, batch):
        def wrapped(params):
            return loss_fn(state, params, state.batch_stats, batch, True)

        grads, (metrics, new_stats) = jax.grad(wrapped, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (metrics, _) = loss_fn(state, state.params, state.batch_stats, batch, False)
        return metrics

    return train_step, eval_step
