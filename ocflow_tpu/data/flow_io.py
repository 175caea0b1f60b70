"""Optical-flow file I/O: Middlebury .flo, KITTI 16-bit png, PFM.

Host-side numpy (no torch/jax): these feed the input pipeline.
Reference: models/data/utils/flow_utils.py:7-138, 354-360.
"""

from __future__ import annotations

import re

import numpy as np

TAG_FLOAT = 202021.25  # Middlebury .flo magic
UNKNOWN_FLOW_THRESH = 1e7


def read_flo(path: str) -> np.ndarray:
    """Read a Middlebury .flo file → [H, W, 2] float32."""
    from ocflow_tpu.data import native_io

    if native_io.available():
        return native_io.read_flo(path)
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if magic != TAG_FLOAT:
            raise ValueError(f"{path}: invalid .flo magic {magic!r}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write [H, W, 2] float32 to a .flo file."""
    flow = np.asarray(flow, np.float32)
    h, w, c = flow.shape
    assert c == 2
    with open(path, "wb") as f:
        f.write(np.float32(TAG_FLOAT).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(h).tobytes())
        f.write(flow.tobytes())


def read_kitti_png_flow(path: str) -> np.ndarray:
    """KITTI flow png: 16-bit BGR; u = (R - 2^15)/64, valid = B
    (reference flow_utils.py:72-79). Returns [H, W, 3] (u, v, valid)."""
    from ocflow_tpu.data import native_io

    if native_io.available():
        return native_io.read_kitti_png_flow(path)
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float64)  # BGR → RGB
    flow = np.zeros_like(raw)
    flow[..., 0] = (raw[..., 0] - 2**15) / 64.0
    flow[..., 1] = (raw[..., 1] - 2**15) / 64.0
    flow[..., 2] = raw[..., 2]
    return flow


def write_kitti_png_flow(path: str, flow: np.ndarray) -> None:
    """Write [H, W, 2] flow as a KITTI 16-bit png."""
    import cv2

    h, w = flow.shape[:2]
    out = np.ones((h, w, 3), np.uint16)
    out[..., 0] = np.clip(flow[..., 0] * 64.0 + 2**15, 0, 65535).astype(np.uint16)
    out[..., 1] = np.clip(flow[..., 1] * 64.0 + 2**15, 0, 65535).astype(np.uint16)
    cv2.imwrite(path, out[:, :, ::-1])


def read_pfm(path: str):
    """Read a PFM file → (data, scale) (reference flow_utils.py:82-117)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.reshape(data, shape)[::-1], scale


def resize_flow_np(flow: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side flow resize with u/v rescale (reference flow_utils.py:120-138)."""
    import cv2

    h, w = flow.shape[:2]
    out = cv2.resize(flow, (width, height), interpolation=cv2.INTER_LINEAR)
    out = out.astype(np.float32)
    out[..., 0] *= width / w
    out[..., 1] *= height / h
    return out
