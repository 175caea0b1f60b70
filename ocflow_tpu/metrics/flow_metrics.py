"""Flow quality metrics: EPE and KITTI outlier rate
(reference models/data/utils/flow_utils.py:179-332).

All on-device jnp; masks follow the reference semantics: unknown flow
(|u|>1e7) excluded, optional occlusion mask excludes occluded pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

UNKNOWN_FLOW_THRESH = 1e7


def flow_error(tu, tv, u, v, occ=None, unknown_thresh: float = UNKNOWN_FLOW_THRESH):
    """Mean EPE between GT (tu, tv) and estimate (u, v), [H, W] arrays
    (reference flow_utils.py:179-232). occ: [H, W], 1 = occluded (excluded)."""
    known = (jnp.abs(tu) <= unknown_thresh) & (jnp.abs(tv) <= unknown_thresh)
    if occ is not None:
        known = known & (occ == 0)
    epe = jnp.sqrt((tu - u) ** 2 + (tv - v) ** 2)
    return jnp.sum(jnp.where(known, epe, 0.0)) / jnp.maximum(jnp.sum(known), 1)


def evaluate_flow(gt_flow, pred_flow, occ=None):
    """Mean EPE for [H, W, 2] (or [B, H, W, 2]) flows
    (reference flow_utils.py:289-296)."""
    if gt_flow.ndim == 4:
        per = jax.vmap(
            lambda g, p: flow_error(g[..., 0], g[..., 1], p[..., 0], p[..., 1])
        )(gt_flow, pred_flow)
        return jnp.mean(per)
    return flow_error(
        gt_flow[..., 0], gt_flow[..., 1], pred_flow[..., 0], pred_flow[..., 1],
        occ=occ,
    )


def flow_kitti_error(tu, tv, u, v, mask=None, tau=(3.0, 0.05)):
    """KITTI metric: (EPE over valid, outlier-accuracy) with outlier =
    epe > tau[0] AND epe/|gt| > tau[1] (reference flow_utils.py:234-271)."""
    if mask is None:
        mask = jnp.ones_like(tu)
    valid = mask > 1e-7
    epe = jnp.sqrt((tu - u) ** 2 + (tv - v) ** 2)
    mag = jnp.sqrt(tu**2 + tv**2) + 1e-5
    outlier = (epe > tau[0]) & (epe / mag > tau[1])
    n = jnp.maximum(jnp.sum(valid), 1)
    aepe = jnp.sum(jnp.where(valid, epe, 0.0)) / n
    acc = 1.0 - jnp.sum(jnp.where(valid, outlier, False)) / n
    return aepe, acc


def evaluate_kitti_flow(gt, pred, tau=(3.0, 0.05)):
    """gt: [H, W, 2] or [H, W, 3] (with validity channel)."""
    mask = gt[..., 2] if gt.shape[-1] == 3 else None
    return flow_kitti_error(
        gt[..., 0], gt[..., 1], pred[..., 0], pred[..., 1], mask=mask, tau=tau
    )


def occlusion_f1(pred, target, threshold: float = 0.5, eps: float = 1e-9):
    """F1 score of the binarized occlusion mask (1 = occluded)."""
    p = (pred > threshold).astype(jnp.float32)
    t = (target > threshold).astype(jnp.float32)
    tp = jnp.sum(p * t)
    precision = tp / (jnp.sum(p) + eps)
    recall = tp / (jnp.sum(t) + eps)
    return 2.0 * precision * recall / (precision + recall + eps)


def calculate_average_epe(predict_fn, batches):
    """Dataloader-level EPE aggregation (reference flow_utils.py:311-332):
    ``predict_fn(images) -> flow``; batches yield dicts with 'images','flow'."""
    total, count = 0.0, 0
    for batch in batches:
        pred = predict_fn(batch["images"])
        total += float(evaluate_flow(batch["flow"], pred)) * batch["flow"].shape[0]
        count += batch["flow"].shape[0]
    return total / max(count, 1)
