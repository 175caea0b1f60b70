"""Synthetic occlusion generators for inpainting pre-training
(reference models/data/datasets.py:56-111). Host-side numpy; masks are
[H, W, 1] float32 with 1 = occluded."""

from __future__ import annotations

import numpy as np


def static_random_occlusion(
    rng: np.random.Generator, height: int, width: int, ratio: float = 0.5
) -> np.ndarray:
    """Single random rectangle of size (ratio*H, ratio*W)."""
    th, tw = int(ratio * height), int(ratio * width)
    h1 = int(rng.integers(0, max(height - th, 1)))
    w1 = int(rng.integers(0, max(width - tw, 1)))
    mask = np.zeros((height, width, 1), np.float32)
    mask[h1 : h1 + th, w1 : w1 + tw] = 1.0
    return mask


def free_form_occlusion(
    rng: np.random.Generator,
    height: int,
    width: int,
    ratio: float = 0.2,
    max_brush_width: int | None = None,
    max_len: int | None = None,
    max_angle: float = np.pi,
    max_rounds: int = 100,
) -> np.ndarray:
    """Random brush strokes (cv2.line) until coverage ≥ 0.9 * ratio.

    Defaults follow the reference call sites (datasets.py:446-449):
    max_brush_width = 0.02*H, max_len = 0.3*H.
    """
    import cv2

    if max_brush_width is None:
        max_brush_width = max(int(0.02 * height), 1)
    if max_len is None:
        max_len = max(int(0.3 * height), 1)

    mask = np.zeros((height, width), np.float64)
    i = 0
    for _ in range(max_rounds):
        start_x = int((rng.standard_normal() + 1) * height / 2)
        start_y = int((rng.standard_normal() + 1) * width / 2)
        for _ in range(1 + int(rng.integers(4))):
            angle = float(rng.uniform(0, max_angle))
            if i % 2 == 0:
                angle = 2 * np.pi - angle
            length = 10 + int(rng.integers(max_len))
            brush_w = 5 + int(rng.integers(max_brush_width))
            end_x = int(start_x + length * np.sin(angle))
            end_y = int(start_y + length * np.cos(angle))
            cv2.line(mask, (start_y, start_x), (end_y, end_x), 1.0, brush_w)
            start_x, start_y = end_x, end_y
            i += 1
        if mask.sum() / mask.size >= 0.9 * ratio:
            break
    return mask.astype(np.float32)[..., None]


def apply_occlusion(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero out the occluded region (img [H,W,C], mask [H,W,1])."""
    return np.where(mask > 0, 0.0, img).astype(img.dtype)
