"""Generic frame reader (reference models/data/utils/frame_utils.py:6-29)."""

from __future__ import annotations

import os

import numpy as np


def read_gen(path: str) -> np.ndarray:
    """Dispatch on extension: png/jpg/jpeg/ppm → image ([H,W,3] uint8-ish),
    .flo → flow, .pfm → data, .bin/.raw → np.load."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg", ".pgm"):
        im = None
        if ext in (".png", ".ppm", ".pgm"):
            from ocflow_tpu.data import native_io

            if native_io.available():
                try:
                    im = native_io.read_image(path)  # C++ decoder, GIL-free
                except ValueError:
                    # Files the native decoder recognizes but rejects (16-bit
                    # PPMs, pngs libpng errors on) still get a shot at the
                    # imageio path below.
                    im = None
        if im is None:
            from imageio.v2 import imread

            im = np.asarray(imread(path))
        if im.ndim == 2:
            im = im[..., None]
        elif im.shape[-1] > 3:
            im = im[..., :3]
        return im
    if ext == ".flo":
        from ocflow_tpu.data.flow_io import read_flo

        return read_flo(path)
    if ext == ".pfm":
        from ocflow_tpu.data.flow_io import read_pfm

        return read_pfm(path)[0]
    if ext in (".bin", ".raw"):
        return np.load(path)
    raise ValueError(f"Unsupported extension: {path}")
