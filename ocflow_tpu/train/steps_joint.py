"""Full joint flow + occlusion + inpainting training step (driver config #5:
"joint flow+occ+inpainting training step on KITTI-2015, bf16, batch 16").

One optimizer over {'flow_occ': ..., 'inpaint': ...} param subtrees: a joint
flow+occ network (reference FlowOccNetCV family, cost_volume_flow_occ_net.py)
predicts flow and occlusion, the inpainter completes the occlusion-masked
warp, and the loss combines valid-masked supervised flow L1 (KITTI GT is
sparse — the 16-bit png validity channel, flow_utils.py:72-79), optional GT
occlusion BCE, non-occluded photometric consistency, and the masked
reconstruction loss on the completed image.

Mixed precision: ``hparams['dtype']='bfloat16'`` runs both network bodies in
bf16 under the models.precision policy (fp32 master params, fp32 losses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocflow_tpu import losses
from ocflow_tpu.models.precision import apply_mixed, resolve_dtype
from ocflow_tpu.ops import hard_threshold_ste, warp
from ocflow_tpu.train.state import TrainState


def masked_flow_l1(flow_pred, flow_gt, valid=None):
    """Mean L1 over valid pixels (KITTI sparse GT); plain mean without mask."""
    diff = jnp.abs(flow_pred - flow_gt)
    if valid is None:
        return jnp.mean(diff)
    return jnp.sum(diff * valid) / (2.0 * jnp.sum(valid) + 1e-8)


def make_joint_step(hparams: dict, flow_occ_apply, inpaint_apply):
    """Returns jitted (train_step, eval_step) over a TrainState whose params
    are {'flow_occ': ..., 'inpaint': ...} (batch_stats subtrees likewise).

    Batch: {'images' [B,H,W,6], 'flow' [B,H,W,2]} + optional 'valid'
    [B,H,W,1] (KITTI sparsity mask) + optional 'occ' (GT occlusion).
    """
    flow_w = hparams.get("flow_weight", 1.0)
    occ_w = hparams.get("occ_bce_weight", 1.0)
    photo_w = hparams.get("photo_weight", 1.0)
    reconst_w = hparams.get("reconst_weight", 1.0)
    dtype = resolve_dtype(hparams.get("dtype"))

    def _apply(apply_fn, params, stats, args, train):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        if train and stats:
            out, updates = apply_mixed(
                apply_fn, variables, *args,
                dtype=dtype, mutable=["batch_stats"], train=True,
            )
            return out, updates["batch_stats"]
        out = apply_mixed(apply_fn, variables, *args, dtype=dtype, train=False)
        return out, stats

    def loss_fn(state, params, batch_stats, batch, train):
        imgs = batch["images"]
        img1, img2 = imgs[..., :3], imgs[..., 3:]
        fo_stats = batch_stats.get("flow_occ", {}) if batch_stats else {}
        inp_stats = batch_stats.get("inpaint", {}) if batch_stats else {}

        out, fo_stats = _apply(
            flow_occ_apply, params["flow_occ"], fo_stats, (imgs,), train
        )
        flow_pred, occ_pred = out[0], out[1]

        valid = batch.get("valid")
        flow_loss = masked_flow_l1(flow_pred, batch["flow"], valid)
        occ_loss = (
            losses.binary_cross_entropy(occ_pred, batch["occ"])
            if "occ" in batch
            else jnp.float32(0.0)
        )

        img_warped = warp(img2, flow_pred, align_corners=True)
        occ_hard = hard_threshold_ste(occ_pred)
        completed, inp_stats = _apply(
            inpaint_apply, params["inpaint"], inp_stats,
            (img_warped * (1.0 - occ_hard), occ_hard), train,
        )
        if isinstance(completed, tuple):
            completed = completed[1]  # gated-conv nets return (coarse, refined)

        photo = losses.photometric_error(
            img_warped * (1.0 - occ_pred), img1 * (1.0 - occ_pred)
        )
        reconst, _, _ = losses.recon_loss(completed, img1, occ_pred)

        loss = (
            flow_w * flow_loss
            + occ_w * occ_loss
            + photo_w * photo
            + reconst_w * reconst
        )
        epe = jnp.linalg.norm(flow_pred - batch["flow"], axis=-1, keepdims=True)
        epe = (
            jnp.sum(epe * valid) / (jnp.sum(valid) + 1e-8)
            if valid is not None
            else jnp.mean(epe)
        )
        metrics = {
            "loss": loss,
            "flow_l1": flow_loss,
            "occ_bce": occ_loss,
            "photometric": photo,
            "reconst": reconst,
            "epe": epe,
        }
        return loss, (metrics, {"flow_occ": fo_stats, "inpaint": inp_stats})

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
