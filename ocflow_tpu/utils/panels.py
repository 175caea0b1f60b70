"""Qualitative evaluation panels (reference utils.py:60-267): stacked uint8
image grids for TensorBoard / disk dumps. Pure numpy."""

from __future__ import annotations

import numpy as np

from ocflow_tpu.utils.viz import denormalize_image, flow_to_image


def _to_u8(img):
    """[-1,1] float [H,W,3] → uint8."""
    return denormalize_image(img)


def _occ_u8(occ):
    """[H,W,1] mask → uint8 RGB."""
    g = (np.asarray(occ)[..., 0] * 255).clip(0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def flow_panel(img1, img2, flow_pred, flow_gt=None):
    """Rows: frame1, frame2, predicted flow, (GT flow)
    (reference utils.py visualize_flow)."""
    rows = [_to_u8(img1), _to_u8(img2), flow_to_image(np.asarray(flow_pred))]
    if flow_gt is not None:
        rows.append(flow_to_image(np.asarray(flow_gt)))
    return np.concatenate(rows, axis=0)


def warp_panel(img1, img2, img_warped, flow_pred):
    """Rows: frame1, frame2, warped frame2, flow color."""
    return np.concatenate(
        [
            _to_u8(img1),
            _to_u8(img2),
            _to_u8(img_warped),
            flow_to_image(np.asarray(flow_pred)),
        ],
        axis=0,
    )


def occlusion_panel(img1, img2, occ_pred, occ_gt=None):
    """Rows: frame1, frame2, predicted occ, (GT occ)."""
    rows = [_to_u8(img1), _to_u8(img2), _occ_u8(occ_pred)]
    if occ_gt is not None:
        rows.append(_occ_u8(occ_gt))
    return np.concatenate(rows, axis=0)


def inpainting_panel(masked_img, recon, img, complete):
    """Rows: masked input, raw reconstruction, ground truth, composited
    (reference model.py:635 saved_images quad)."""
    return np.concatenate(
        [_to_u8(masked_img), _to_u8(recon), _to_u8(img), _to_u8(complete)], axis=0
    )


def pipeline_panel(img1, img2, flow_pred, img_warped, occ_pred, img_completed):
    """Full-pipeline view (reference utils.py 10-panel visualizer, condensed):
    frames, flow color, warped, occlusion, completed."""
    return np.concatenate(
        [
            _to_u8(img1),
            _to_u8(img2),
            flow_to_image(np.asarray(flow_pred)),
            _to_u8(img_warped),
            _occ_u8(occ_pred),
            _to_u8(img_completed),
        ],
        axis=0,
    )


def pipeline_grid(img1, img2, img_pred_warped, img_warped, img_occluded,
                  img_completed, flow_pred, flow_gt, occ_pred, occ_gt):
    """The reference's FULL 10-panel pipeline view (utils.py visualize(),
    :118-267) as one 5x2 uint8 grid:

        image 1          | image 2
        pred warped      | warped (GT flow)
        occluded image   | completed image
        pred flow        | GT flow
        pred occlusion   | GT occlusion
    """
    rows = [
        (_to_u8(img1), _to_u8(img2)),
        (_to_u8(img_pred_warped), _to_u8(img_warped)),
        (_to_u8(img_occluded), _to_u8(img_completed)),
        (flow_to_image(np.asarray(flow_pred)),
         flow_to_image(np.asarray(flow_gt))),
        (_occ_u8(occ_pred), _occ_u8(occ_gt)),
    ]
    return np.concatenate([np.concatenate(r, axis=1) for r in rows], axis=0)
