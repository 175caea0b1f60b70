"""Jitted train/eval step factories — the TPU-native replacement for the
reference's LightningModule ``training_step`` zoo (SURVEY.md §2.2).

Each factory closes over a network + hyperparameters and returns pure
functions ``train_step(state, batch) -> (state, metrics)`` /
``eval_step(state, batch) -> metrics``. Everything inside is jit/pjit-safe:
static shapes, no data-dependent control flow, BatchNorm statistics threaded
functionally.

Batches are dicts of NHWC arrays:
  ``images`` [B, H, W, 6]  (frames 1|2 concatenated on channels, in [-1, 1])
  ``flow``   [B, H, W, 2]  (optional ground truth, metric-only when unsupervised)
  ``occ``    [B, H, W, 1]  (optional ground truth occlusion; 1 = occluded)
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ocflow_tpu import losses
from ocflow_tpu.ops import (
    occlusion_fb_consistency,
    occlusion_from_back_flow,
    resize_bilinear,
    warp,
)
from ocflow_tpu.train.state import TrainState


def _area_down(x: jax.Array, f: int) -> jax.Array:
    """f-x area (average-pool) downsample of an NHWC map."""
    b, h, w, c = x.shape
    return x.reshape(b, h // f, f, w // f, f, c).mean(axis=(2, 4))


def _apply_flow_net(state: TrainState, params, batch_stats, x, train: bool):
    """Run a flow net, normalizing the (flow, flow_l2 | flow) signatures and
    threading BatchNorm stats. Returns (flow_full, flow_l2_or_None, new_stats)."""
    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    if train and has_bn:
        out, updates = state.apply_fn(
            variables, x, train=True, mutable=["batch_stats"]
        )
        new_stats = updates["batch_stats"]
    else:
        out = state.apply_fn(variables, x, train=False)
        new_stats = batch_stats
    if isinstance(out, tuple):
        flow_full, flow_l2 = out
    else:
        flow_full, flow_l2 = out, None
    return flow_full, flow_l2, new_stats


# ---------------------------------------------------------------------------
# Supervised regimes (reference flow_model.py / occlusion_model.py /
# flow_occ_model.py / inpainting_model.py)
# ---------------------------------------------------------------------------


def make_supervised_flow_step(hparams: dict | None = None):
    """MSE(flow_pred, flow_gt) (reference flow_model.py:173-186)."""

    def loss_fn(state, params, batch_stats, batch, train):
        flow_pred, _, new_stats = _apply_flow_net(
            state, params, batch_stats, batch["images"], train
        )
        loss = jnp.mean((flow_pred - batch["flow"]) ** 2)
        return loss, ({"loss": loss}, new_stats)

    return _build_steps(loss_fn)


def make_supervised_occ_step(hparams: dict | None = None):
    """Focal BCE (gamma=2) on occlusion (reference occlusion_model.py:45-62)."""

    def loss_fn(state, params, batch_stats, batch, train):
        occ_pred, _, new_stats = _apply_flow_net(
            state, params, batch_stats, batch["images"], train
        )
        loss = losses.focal_bce_loss(occ_pred, batch["occ"])
        return loss, ({"loss": loss}, new_stats)

    return _build_steps(loss_fn)


def make_supervised_flow_occ_step(hparams: dict | None = None):
    """L1(flow) + BCE(occ) (reference flow_occ_model.py:48-55)."""

    def loss_fn(state, params, batch_stats, batch, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            (flow_pred, occ_pred), updates = state.apply_fn(
                variables, batch["images"], train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            flow_pred, occ_pred = state.apply_fn(
                variables, batch["images"], train=False
            )
            new_stats = batch_stats
        flow_loss = jnp.mean(jnp.abs(flow_pred - batch["flow"]))
        occ_loss = losses.binary_cross_entropy(occ_pred, batch["occ"])
        loss = flow_loss + occ_loss
        metrics = {"loss": loss, "flow_loss": flow_loss, "occ_loss": occ_loss}
        return loss, (metrics, new_stats)

    return _build_steps(loss_fn)


# ---------------------------------------------------------------------------
# Unsupervised flow (reference FlowStageModel, models/model.py:155-509)
# ---------------------------------------------------------------------------


def make_unsupervised_flow_step(hparams: dict):
    """Photometric + smoothness unsupervised flow training.

    hparams keys (reference models/model.py:159-171):
      photo_weight, smooth1_weight, smooth2_weight, with_occ (GT occ masking),
      occ_aware (forward-backward range-map occlusion), model ('pwc' computes
      smoothness at 1/4 resolution on flow_l2, models/model.py:332-335).
    """
    photo_w = hparams.get("photo_weight", 1.0)
    s1_w = hparams.get("smooth1_weight", 0.0)
    s2_w = hparams.get("smooth2_weight", 1.0)
    with_occ = hparams.get("with_occ", False)
    occ_aware = hparams.get("occ_aware", False)
    # 'range_map' (reference parity, models/model.py:388-391) or
    # 'fb_consistency' (TPU-fast deviation: one warp gather instead of the
    # ~97 ms/step scatter splat — ops/range_map.py:occlusion_fb_consistency)
    occ_method = hparams.get("occ_method", "range_map")
    # disable occlusion masking for the first K steps (0 = reference
    # behavior). At random init the fb-consistency check marks ~everything
    # occluded (round trips of random flows never close), zeroing the
    # photometric loss and its gradient; a short unmasked warmup
    # bootstraps the flow first (UnFlow-style practice, an extension).
    occ_warmup = hparams.get("occ_warmup_steps", 0)
    # 'full' (reference parity: occlusion from the upsampled full-res
    # flows) or 'quarter' (PWC only: from the native 1/4-res flows,
    # nearest-upsampled — 16x less occlusion work; see the block below)
    occ_res = hparams.get("occ_resolution", "full")
    is_pwc = hparams.get("model", "simple") == "pwc"
    # fused-kernel usage inside the step: 'both' (default) runs the
    # differentiable fused path for the gradient-carrying forward AND
    # (occ_aware) shares its encoder with the no-grad backward-flow pass
    # — measured ~34 pairs/s vs ~29.5 for 'backward' at 448x1024 batch 8
    # (PERF.md). 'backward' restricts the kernels to the no-grad pass;
    # 'off' uses the flax module throughout. The shared-encoder pair
    # program fits the 2 GiB AOT executable-serialization cap that made
    # 'both' opt-in in round 2.
    fast_mode = hparams.get("fast_forward", "both")
    # 'charbonnier' (reference parity) or 'census' (extension; the driver
    # north star lists photometric+census — BASELINE.json)
    photo_loss = hparams.get("photo_loss", "charbonnier")
    # 'full' (reference parity: warp img2 and compare at input resolution,
    # model.py:366-379) | 'half' | 'quarter': compute the photometric term
    # on area-downsampled images with correspondingly rescaled flow. The
    # full-res warp is ONE XLA gather whose cost is per-descriptor
    # (~11-22 ns/pixel, PERF.md): 82 ms of the 238 ms occ-aware step at
    # 448x1024 batch 8. 'half' cuts it 4x while still supervising finer
    # detail than the decoder's native quarter-res flow; measured
    # tradeoffs in PERF.md. Extension beyond the reference — default
    # stays 'full'.
    photo_res = hparams.get("photo_resolution", "full")
    from ocflow_tpu.models.precision import resolve_dtype as _rd

    # loss-tail compute dtype: the full-res photometric warp gather is ~2x
    # faster on bf16 data; reductions accumulate in fp32 (losses/*) and
    # warp coordinates are always fp32 (ops/warp.py), so this only
    # quantizes pixel VALUES — the same precision the bf16 network
    # computed them at
    tail_dt = _rd(hparams.get("compute_dtype"))

    def _photo(img_warped, img1, occ):
        if photo_loss == "census":
            return losses.census_loss(img_warped, img1, occ)
        return losses.photometric_error(img_warped, img1, occ)

    def loss_fn(state, params, batch_stats, batch, train):
        imgs = batch["images"]
        img1, img2 = imgs[..., :3], imgs[..., 3:]
        out = None
        back_pair = None
        if fast_mode == "both" and is_pwc and not batch_stats:
            # Fused-kernel forward for the gradient-carrying pass: Pallas
            # kernels with a manual XLA adjoint (custom VJP), grad-parity
            # tested vs the flax module in tests/test_pwc_fast.py. None
            # off-TPU or when shapes miss the kernel constraints. When the
            # step also needs the backward flow (occ_aware), the pair
            # variant shares ONE encoder between the two passes (the
            # features are the same values; reference recomputes them,
            # model.py:375-386).
            from ocflow_tpu.models.precision import cast_floating, resolve_dtype
            from ocflow_tpu.models.pwc_fast import (
                maybe_fast_apply,
                maybe_fast_apply_pair,
            )

            cdt = resolve_dtype(hparams.get("compute_dtype"))
            pc = cast_floating(params, cdt) if cdt is not None else params
            xi = cast_floating(imgs, cdt) if cdt is not None else imgs
            fmesh = hparams.get("_fast_mesh")  # test hook: pin the mesh
            # Optional W8A8 for the no-grad backward decode (extension):
            # hparams['q8_backward'] = calibrate_q8(...) scales. The
            # gradient-carrying forward stays full precision.
            q8b = hparams.get("q8_backward")
            if occ_aware:
                pair = maybe_fast_apply_pair(
                    {"params": pc}, xi, diff=True, mesh=fmesh, q8=q8b)
                if pair is not None:
                    out, back_pair = pair
            else:
                out = maybe_fast_apply(
                    {"params": pc}, xi, diff=True, mesh=fmesh)
        if out is not None:
            flow_pred, flow_l2 = out
            new_stats = batch_stats
        else:
            flow_pred, flow_l2, new_stats = _apply_flow_net(
                state, params, batch_stats, imgs, train
            )
        img1c = img1.astype(tail_dt) if tail_dt is not None else img1
        img2c = img2.astype(tail_dt) if tail_dt is not None else img2
        if photo_res != "full":
            pf = 2 if photo_res == "half" else 4
            ph, pw = img1.shape[1] // pf, img1.shape[2] // pf
            img1p = _area_down(img1c, pf)
            img2p = _area_down(img2c, pf)
            flow_p = resize_bilinear(
                flow_pred, ph, pw, align_corners=True) * (1.0 / pf)
        else:
            pf = 1
            img1p, img2p, flow_p = img1c, img2c, flow_pred
        img_warped = warp(img2p, flow_p, align_corners=True, grad_img=False)

        occ_pred = None
        if occ_aware:
            # Backward flow under stop_gradient (reference no_grad at :381).
            # torch's no_grad does NOT switch to eval mode: BatchNorm still
            # normalizes with batch statistics and updates running stats
            # (model.py:381-386), so the pass runs with train=<train> here
            # and its stats updates are kept. No-op for the BN-free PWC
            # flagship.
            back_in = jnp.concatenate([img2, img1], axis=-1)
            back_flow = None
            back_l2 = None
            if back_pair is not None:
                back_flow = back_pair[0].astype(back_in.dtype)
                back_l2 = back_pair[1].astype(back_in.dtype)
            elif fast_mode in ("both", "backward") and is_pwc and not batch_stats:
                # The pass carries no gradients, so the fused Pallas
                # inference path (no VJP) is legal here; None off-TPU or
                # when shapes miss the kernel constraints.
                from ocflow_tpu.models.precision import (
                    cast_floating,
                    resolve_dtype,
                )
                from ocflow_tpu.models.pwc_fast import maybe_fast_apply

                cdt = resolve_dtype(hparams.get("compute_dtype"))
                sp = jax.lax.stop_gradient(params)
                bi = back_in
                if cdt is not None:
                    sp = cast_floating(sp, cdt)
                    bi = cast_floating(bi, cdt)
                fast = maybe_fast_apply(
                    {"params": sp}, bi, q8=hparams.get("q8_backward"))
                if fast is not None:
                    back_flow = fast[0].astype(back_in.dtype)
                    back_l2 = fast[1].astype(back_in.dtype)
            if back_flow is None:
                back_flow, back_l2, new_stats = _apply_flow_net(
                    state,
                    jax.lax.stop_gradient(params),
                    jax.lax.stop_gradient(new_stats),
                    back_in,
                    train,
                )
            back_flow = jax.lax.stop_gradient(back_flow)
            quarter = (
                occ_res == "quarter" and is_pwc
                and flow_l2 is not None and back_l2 is not None
            )
            half = occ_res == "half" and not quarter
            if quarter:
                # occlusion from the PWC-native 1/4-res flows (16x fewer
                # pixels: the 97 ms full-res splat becomes ~6 ms, the fb
                # gather ~3 ms), nearest-upsampled. The full-res flow is
                # itself just the upsampled flow_l2, so the full-res
                # occlusion contains no extra information — only the
                # fb alphas effectively rescale (L2 pixel units).
                fwd_o = jax.lax.stop_gradient(flow_l2)
                bwd_o = jax.lax.stop_gradient(back_l2).astype(fwd_o.dtype)
            elif half:
                # VERDICT r3 #4b: splat at HALF res with the flow mass
                # aggregated exactly from the FULL-res flow (2x2-block
                # area mean, endpoints halved), nearest-upsampled back.
                # 4x fewer scatter updates than the full-res splat
                # (~97 -> ~24 ms); unlike 'quarter' this uses the
                # upsampled+context-refined full-res flow, not the raw
                # L2 output. Extension hparam; parity default is 'full'.
                fwd_o = _area_down(
                    jax.lax.stop_gradient(flow_pred), 2) * 0.5
                bwd_o = _area_down(
                    back_flow.astype(fwd_o.dtype), 2) * 0.5
            else:
                fwd_o = jax.lax.stop_gradient(flow_pred)
                bwd_o = back_flow.astype(fwd_o.dtype)
            if occ_method == "fb_consistency":
                occ_pred = occlusion_fb_consistency(fwd_o, bwd_o)
            else:
                occ_pred = occlusion_from_back_flow(bwd_o)
            occ_pred = jax.lax.stop_gradient(occ_pred)
            if quarter:
                occ_pred = jnp.repeat(
                    jnp.repeat(occ_pred, 4, axis=1), 4, axis=2
                )
            elif half:
                occ_pred = jnp.repeat(
                    jnp.repeat(occ_pred, 2, axis=1), 2, axis=2
                )
            if occ_warmup:
                occ_pred = jnp.where(
                    state.step < occ_warmup,
                    jnp.zeros_like(occ_pred),
                    occ_pred,
                )
            occ_photo = occ_pred if pf == 1 else _area_down(occ_pred, pf)
            photo = _photo(img_warped, img1p, occ_photo)
        elif with_occ:
            occ_gt = batch["occ"] if pf == 1 else _area_down(batch["occ"], pf)
            photo = _photo(img_warped, img1p, occ_gt)
        else:
            photo = _photo(img_warped, img1p, None)

        if is_pwc and flow_l2 is not None:
            h, w = img1.shape[1] // 4, img1.shape[2] // 4
            img1_s = resize_bilinear(img1c, h, w, align_corners=True)
            smooth1 = losses.first_order_smoothness_loss(img1_s, flow_l2)
            smooth2 = losses.second_order_smoothness_loss(img1_s, flow_l2)
        else:
            smooth1 = losses.first_order_smoothness_loss(img1c, flow_pred)
            smooth2 = losses.second_order_smoothness_loss(img1c, flow_pred)

        loss = photo_w * photo + s1_w * smooth1 + s2_w * smooth2
        metrics = {
            "loss": loss,
            "photometric": photo,
            "smooth1": smooth1,
            "smooth2": smooth2,
        }
        if "flow" in batch:
            metrics["flow_error"] = jnp.mean((flow_pred - batch["flow"]) ** 2)
            # true endpoint error (reference metric.py:7-12), for EPE-vs-step
            # curves during unsupervised training
            metrics["epe"] = jnp.mean(
                jnp.sqrt(
                    jnp.sum(
                        (flow_pred.astype(jnp.float32) - batch["flow"]) ** 2,
                        axis=-1,
                    )
                )
            )
        if occ_aware:
            metrics["photometric_occ"] = losses.photometric_error(
                img_warped, img1p, 1.0 - occ_photo
            )
            if "occ" in batch:
                # NB: reference reverses the BCE arguments (model.py:407);
                # we compute BCE(pred, target) — documented deviation.
                metrics["occ_error"] = losses.binary_cross_entropy(
                    occ_pred, batch["occ"]
                )
        return loss, (metrics, new_stats)

    return _build_steps(loss_fn)


# ---------------------------------------------------------------------------
# Step builder
# ---------------------------------------------------------------------------


def _build_steps(loss_fn: Callable):
    """Wrap a loss fn into jitted (train_step, eval_step)."""

    @jax.jit
    def train_step(state: TrainState, batch):
        def wrapped(params):
            return loss_fn(state, params, state.batch_stats, batch, True)

        grads, (metrics, new_stats) = jax.grad(wrapped, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (metrics, _) = loss_fn(
            state, state.params, state.batch_stats, batch, False
        )
        return metrics

    return train_step, eval_step
