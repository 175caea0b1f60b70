"""Metrics & eval (L5): flow EPE/KITTI, PSNR/SSIM, FID/IS, and dataloader
drivers (reference inpainting_metrics/__init__.py:5-81)."""

from __future__ import annotations

import numpy as np

from ocflow_tpu.metrics.flow_metrics import (
    flow_error,
    evaluate_flow,
    flow_kitti_error,
    evaluate_kitti_flow,
    occlusion_f1,
    calculate_average_epe,
)
from ocflow_tpu.metrics.image_metrics import psnr, ssim
from ocflow_tpu.metrics.fid import (
    activation_statistics,
    frechet_distance,
    calculate_fid_given_imgs,
    inception_score,
    get_activations,
)
from ocflow_tpu.metrics.inception import InceptionV3, init_inception


def _completed_images(inpaint_fn, batches):
    """Run an inpainter over batches; yield (complete, real) numpy pairs.
    ``complete = recon * mask + img * (1 - mask)`` (reference
    inpainting_metrics/__init__.py:37-46)."""
    for batch in batches:
        imgs, masks = batch["image"], batch["occ"]
        recon = np.asarray(inpaint_fn(imgs, masks))
        complete = recon * masks + imgs * (1 - masks)
        yield complete, np.asarray(imgs)


def calculate_psnr(inpaint_fn, batches) -> float:
    """Mean PSNR over a dataloader (reference __init__.py:58-81)."""
    vals = []
    for complete, imgs in _completed_images(inpaint_fn, batches):
        vals.append(float(psnr(complete, imgs)))
    return float(np.mean(vals))


def calculate_ssim(inpaint_fn, batches, window_size: int = 4) -> float:
    """Mean SSIM over a dataloader (reference __init__.py:5-27)."""
    vals = []
    for complete, imgs in _completed_images(inpaint_fn, batches):
        vals.append(float(ssim(complete, imgs, window_size=window_size)))
    return float(np.mean(vals))


def calculate_fid(inpaint_fn, batches, extract_fn, batch_size: int = 64) -> float:
    """FID between completed and real images over a dataloader
    (reference __init__.py:28-55)."""
    completes, reals = [], []
    for complete, imgs in _completed_images(inpaint_fn, batches):
        completes.append(complete)
        reals.append(imgs)
    return calculate_fid_given_imgs(
        np.concatenate(reals), np.concatenate(completes), extract_fn, batch_size
    )


__all__ = [
    "flow_error",
    "evaluate_flow",
    "flow_kitti_error",
    "evaluate_kitti_flow",
    "occlusion_f1",
    "calculate_average_epe",
    "psnr",
    "ssim",
    "activation_statistics",
    "frechet_distance",
    "calculate_fid_given_imgs",
    "inception_score",
    "get_activations",
    "InceptionV3",
    "init_inception",
    "calculate_psnr",
    "calculate_ssim",
    "calculate_fid",
]
