"""Two-stage joint pipelines: flow → occlusion → inpainting
(reference TwoStageModel model.py:928-1102, TwoStageModelGC model.py:1105-1395).

Parameter freezing is structural, not mask-based: frozen networks (flow,
inpainter in TwoStageModel) are passed as a ``frozen`` variables pytree arg —
they never enter the optimizer, and XLA treats them as ordinary inputs. The
GC variant's "unfreeze inpainter at epoch N" (FinetuningInpainting,
test_unsupervised.py:13-31) is an optax multi_transform whose inpainter
branch scales updates by 0 until ``unfreeze_step``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ocflow_tpu import losses
from ocflow_tpu.losses.perceptual import vgg_perceptual_loss
from ocflow_tpu.ops import hard_threshold_ste, warp
from ocflow_tpu.train.state import TrainState


def make_two_stage_step(hparams: dict, flow_apply, inpaint_apply):
    """TwoStageModel: frozen flow + frozen inpainter, trainable occlusion net.

    loss = photo(non-occ) + reconst_w·photo(occ) + smooth_w·smooth1
    (reference model.py:1026-1042; NB the reconstruction term compares the
    *warped* image in the occluded region, and the completed image only feeds
    the — unused — inpainting forward, exactly like the reference).

    ``train_step(state, frozen, batch)`` where ``frozen`` =
    {'flow': variables, 'inpaint': variables}.
    """
    smooth_w = hparams.get("smoothness_weight", 0.0)
    reconst_w = hparams.get("reconst_weight", 1.0)

    def loss_fn(state, params, batch_stats, frozen, batch, train):
        imgs = batch["images"]
        img1, img2 = imgs[..., :3], imgs[..., 3:]
        flow_out = flow_apply(jax.lax.stop_gradient(frozen["flow"]), imgs)
        flow_pred = flow_out[0] if isinstance(flow_out, tuple) else flow_out

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            occ_pred, updates = state.apply_fn(
                variables, imgs, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            occ_pred = state.apply_fn(variables, imgs, train=False)
            new_stats = batch_stats

        img_warped = warp(img2, flow_pred, align_corners=True, grad_img=False)
        img_occluded = img_warped * (1.0 - occ_pred)
        # completed image computed for parity with the reference pipeline
        # (model.py:1023); the loss below does not use it — documented quirk.
        _ = inpaint_apply(
            jax.lax.stop_gradient(frozen["inpaint"]), img_occluded, occ_pred
        )

        smooth = losses.first_order_smoothness_loss(img1, flow_pred)
        photo = losses.photometric_error(
            img_warped * (1.0 - occ_pred), img1 * (1.0 - occ_pred)
        )
        reconst = losses.photometric_error(img_warped * occ_pred, img1 * occ_pred)
        loss = photo + reconst_w * reconst + smooth_w * smooth
        metrics = {
            "loss": loss,
            "photometric": photo,
            "reconst": reconst,
            "smoothness": smooth,
        }
        if "occ" in batch:
            metrics["bce_loss"] = losses.binary_cross_entropy(occ_pred, batch["occ"])
        return loss, (metrics, new_stats)

    @jax.jit
    def train_step(state: TrainState, frozen, batch):
        def wrapped(params):
            return loss_fn(state, params, state.batch_stats, frozen, batch, True)

        grads, (metrics, new_stats) = jax.grad(wrapped, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, frozen, batch):
        _, (metrics, _) = loss_fn(
            state, state.params, state.batch_stats, frozen, batch, False
        )
        return metrics

    return train_step, eval_step


class TwoStageGCState(TrainState):
    """Joint state over {'occ': ..., 'inpaint': ...} param subtrees."""


def make_two_stage_gc_optimizer(
    lr: float,
    inpaint_lr: float = 1e-5,
    unfreeze_step: int = 0,
) -> optax.GradientTransformation:
    """Adam over the occlusion net; inpainter updates gated to 0 until
    ``unfreeze_step`` then trained at ``inpaint_lr`` (FinetuningInpainting
    unfreezes at epoch 23 with lr 1e-5, test_unsupervised.py:25-31)."""

    def gate(step):
        return jnp.where(step >= unfreeze_step, 1.0, 0.0)

    return optax.multi_transform(
        {
            "occ": optax.adam(lr),
            # gate BEFORE adam so frozen-phase gradients never touch the
            # moment estimates (a true unfreeze, not a masked update)
            "inpaint": optax.chain(
                optax.scale_by_schedule(gate), optax.adam(inpaint_lr)
            ),
        },
        param_labels={"occ": "occ", "inpaint": "inpaint"},
    )


def make_two_stage_gc_step(hparams: dict, occ_apply, inpaint_apply, vgg=None):
    """TwoStageModelGC: warp by GT flow, trainable occlusion net (+inpainter
    after unfreeze), reconst on the completed image (reference
    model.py:1199-1254).

    The state's params are {'occ': ..., 'inpaint': ...}; batch_stats likewise.
    """
    loss_type = hparams.get("loss_type", "pixel-wise")
    photo_w = hparams.get("photo_weight", 0.0)
    reconst_w = hparams.get("reconst_weight", 1.0)
    smooth1_w = hparams.get("smooth1_weight", 1.0)
    pixelwise_w = hparams.get("pixelwise_weight", 1.0)
    if loss_type == "vgg" and vgg is None:
        raise ValueError("loss_type='vgg' requires vgg=(apply_fn, variables)")

    def _apply(apply_fn, params, stats, args, train, key):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        if train and stats:
            out, updates = apply_fn(variables, *args, train=True, mutable=["batch_stats"])
            return out, updates["batch_stats"]
        return apply_fn(variables, *args, train=False), stats

    def loss_fn(state, params, batch_stats, batch, train):
        imgs = batch["images"]
        img1, img2 = imgs[..., :3], imgs[..., 3:]
        img_warped = warp(img2, batch["flow"], align_corners=True, grad_img=False)

        occ_stats = batch_stats.get("occ", {}) if batch_stats else {}
        inp_stats = batch_stats.get("inpaint", {}) if batch_stats else {}
        occ_soft, occ_stats = _apply(
            occ_apply, params["occ"], occ_stats, (imgs,), train, "occ"
        )
        occ_hard = hard_threshold_ste(occ_soft)  # model.py:1214 (forward parity)

        smooth = losses.first_order_smoothness_loss(img_warped, occ_soft)
        out, inp_stats = _apply(
            inpaint_apply, params["inpaint"], inp_stats, (img_warped, occ_soft),
            train, "inpaint",
        )
        img_completed = out[1] if isinstance(out, tuple) else out

        photo = losses.photometric_error(
            img_warped * (1.0 - occ_soft), img1 * (1.0 - occ_soft)
        )
        photo_occ = losses.photometric_error(
            img_warped * occ_soft, img1 * occ_soft
        )
        if loss_type == "vgg":
            reconst = vgg_perceptual_loss(
                vgg[0], vgg[1], occ_soft * img_completed, occ_soft * img1
            )
        else:
            reconst = losses.photometric_error(
                occ_soft * img_completed, occ_soft * img1
            )
        pixelwise, _, _ = losses.recon_loss(img_completed, img1, occ_soft)

        loss = (
            photo_w * photo
            + reconst_w * reconst
            + smooth1_w * smooth
            + pixelwise_w * pixelwise
        )
        metrics = {
            "loss": loss,
            "photometric": photo,
            "photometric_occluded": photo_occ,
            "reconst": reconst,
            "smoothness": smooth,
            "pixelwise": pixelwise,
        }
        if "occ" in batch:
            metrics["bce_loss"] = losses.binary_cross_entropy(occ_soft, batch["occ"])
        new_stats = {"occ": occ_stats, "inpaint": inp_stats}
        return loss, (metrics, new_stats)

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
