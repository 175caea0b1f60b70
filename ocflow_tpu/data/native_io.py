"""ctypes loader for the native (C++) decoders in ``_native/decode.cc``.

Builds the shared library on demand with g++ (cached next to the source) and
exposes numpy-returning readers. Callers fall back to the pure-Python paths
when the toolchain or libpng is unavailable or ``OCFLOW_NO_NATIVE=1``.

Why native: ctypes releases the GIL for the duration of each decode, so the
threaded prefetcher in data/pipeline.py gets real decode parallelism — the
reference needed 6 DataLoader worker *processes* for the same effect
(lightning_datamodule.py:63).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "decode.cc")
_LIB = os.path.join(os.path.dirname(__file__), "_native", "libocfio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Compile to a temp file and os.replace() it into place so the .so
    # appears atomically: concurrent processes (pytest workers, multi-process
    # launches) must never dlopen a partially written library.
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_LIB))
    os.close(fd)
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lpng", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("OCFLOW_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        for name, args in (
            ("flo_probe", [u8p, ctypes.c_int64, i32p, i32p]),
            ("flo_decode", [u8p, ctypes.c_int64, ctypes.c_void_p]),
            ("ppm_probe", [u8p, ctypes.c_int64, i32p, i32p, i32p]),
            ("ppm_decode", [u8p, ctypes.c_int64, ctypes.c_void_p]),
            ("png_probe", [u8p, ctypes.c_int64, i32p, i32p, i32p, i32p]),
            ("png_decode", [u8p, ctypes.c_int64, ctypes.c_void_p]),
            ("image_decode_norm_f32",
             [u8p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
              ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
              ctypes.c_float]),
        ):
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(
        ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo → [H, W, 2] float32 (native)."""
    lib = _load()
    assert lib is not None
    buf = open(path, "rb").read()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.flo_probe(_as_u8p(buf), len(buf), ctypes.byref(w), ctypes.byref(h))
    if rc:
        raise ValueError(f"{path}: bad .flo (rc={rc})")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.flo_decode(_as_u8p(buf), len(buf), out.ctypes.data_as(ctypes.c_void_p))
    if rc:
        raise ValueError(f"{path}: .flo decode failed (rc={rc})")
    return out


def read_image(path: str) -> np.ndarray | None:
    """png/ppm/pgm → [H, W, C] uint8 (or uint16 for 16-bit pngs).

    Returns None for formats the native library does not handle (caller
    falls back to imageio)."""
    lib = _load()
    assert lib is not None
    buf = open(path, "rb").read()
    p = _as_u8p(buf)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    bd = ctypes.c_int32()
    if len(buf) >= 8 and buf[:8] == b"\x89PNG\r\n\x1a\n":
        rc = lib.png_probe(p, len(buf), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(ch), ctypes.byref(bd))
        if rc:
            raise ValueError(f"{path}: bad png (rc={rc})")
        dtype = np.uint16 if bd.value == 16 else np.uint8
        out = np.empty((h.value, w.value, ch.value), dtype)
        rc = lib.png_decode(p, len(buf), out.ctypes.data_as(ctypes.c_void_p))
        if rc:
            raise ValueError(f"{path}: png decode failed (rc={rc})")
        return out
    if len(buf) >= 2 and buf[0:1] == b"P" and buf[1:2] in (b"5", b"6"):
        rc = lib.ppm_probe(p, len(buf), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(ch))
        if rc:
            raise ValueError(f"{path}: bad ppm (rc={rc})")
        out = np.empty((h.value, w.value, ch.value), np.uint8)
        rc = lib.ppm_decode(p, len(buf), out.ctypes.data_as(ctypes.c_void_p))
        if rc:
            raise ValueError(f"{path}: ppm decode failed (rc={rc})")
        return out
    return None


def read_pair_norm(
    path1: str, path2: str, th: int, tw: int,
    scale: float = 1.0 / 127.5, offset: float = -1.0,
) -> np.ndarray | None:
    """Decode an image pair fused with center-crop + [-1, 1] normalization.

    One GIL-free C++ pass per image (decode → crop to (th, tw) → float32
    x*scale+offset), written channel-interleaved into a single [th, tw, 6]
    buffer — eliminating the ~17 ms/pair of GIL-bound numpy
    (normalize_image + np.concatenate) that capped threaded loader scaling
    (tools/bench_input_pipeline.py). Returns None when either file needs
    the generic path (16-bit, gray, interlaced, non-png/ppm), never raises
    on format grounds.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((th, tw, 6), np.float32)
    base = out.ctypes.data
    for i, path in enumerate((path1, path2)):
        buf = open(path, "rb").read()
        rc = lib.image_decode_norm_f32(
            _as_u8p(buf), len(buf),
            ctypes.c_void_p(base + 4 * 3 * i), 6, th, tw, scale, offset,
        )
        if rc:
            # unsupported or undecodable here -> generic path (which raises
            # an informative error if the file is genuinely corrupt)
            return None
    return out


def read_kitti_png_flow(path: str) -> np.ndarray:
    """KITTI 16-bit flow png → [H, W, 3] float64 (u, v, valid), native
    (semantics of flow_io.read_kitti_png_flow / reference flow_utils.py:72-79)."""
    raw = read_image(path)
    assert raw is not None and raw.dtype == np.uint16 and raw.shape[-1] >= 3
    raw = raw.astype(np.float64)
    flow = np.zeros(raw.shape[:2] + (3,), np.float64)
    flow[..., 0] = (raw[..., 0] - 2.0**15) / 64.0
    flow[..., 1] = (raw[..., 1] - 2.0**15) / 64.0
    flow[..., 2] = raw[..., 2]
    return flow
