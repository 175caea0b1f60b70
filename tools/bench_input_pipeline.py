"""Host input-pipeline throughput benchmark (no TPU needed).

Answers: can the host decode PNG pairs fast enough to feed the chip?
Reference analog: 6 torch DataLoader worker processes
(/root/reference/models/lightning_datamodule.py:63-69); here a GIL-releasing
thread pool over the native C++ decoders (data/_native/decode.cc).

Generates (once, cached) a Sintel-layout tree of 448x1024 PNG pairs with
realistic compression ratios (smooth gradients + film grain, not pure
noise), then times full DataLoader epochs at several worker counts.

Run:  python tools/bench_input_pipeline.py [--pairs 64] [--root /tmp/...]
Prints one summary line per worker count plus a JSON tail for PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocflow_tpu.data.datasets import MpiSintelClean  # noqa: E402
from ocflow_tpu.data.flow_io import write_flo  # noqa: E402
from ocflow_tpu.data.pipeline import DataLoader  # noqa: E402

H, W = 448, 1024


def realistic_frame(rng: np.random.Generator) -> np.ndarray:
    """Smooth low-frequency content + mild grain: compresses like film
    frames (~0.5-1.0 bytes/px) instead of pure noise (incompressible)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    for c in range(3):
        fx, fy = rng.uniform(0.5, 3, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = (
            0.5
            + 0.25 * np.sin(2 * np.pi * fx * xx / W + ph[0])
            + 0.25 * np.cos(2 * np.pi * fy * yy / H + ph[1])
        )
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def ensure_tree(root: str, n_pairs: int) -> None:
    marker = os.path.join(root, f".done_{n_pairs}_{H}x{W}")
    if os.path.exists(marker):
        return
    import imageio.v2 as iio

    rng = np.random.default_rng(0)
    n_scenes = max(1, n_pairs // 8)
    per_scene = -(-n_pairs // n_scenes)  # frames per scene = pairs+1
    for s in range(n_scenes):
        scene = os.path.join(root, "clean", f"scene_{s}")
        fscene = os.path.join(root, "flow", f"scene_{s}")
        os.makedirs(scene, exist_ok=True)
        os.makedirs(fscene, exist_ok=True)
        for f in range(1, per_scene + 2):
            iio.imwrite(
                os.path.join(scene, f"frame_{f:04d}.png"),
                realistic_frame(rng),
            )
            if f <= per_scene:
                write_flo(
                    os.path.join(fscene, f"frame_{f:04d}.flo"),
                    rng.standard_normal((H, W, 2)).astype(np.float32),
                )
    open(marker, "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--root", default="/tmp/ocflow_pipebench")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 6, 12])
    args = ap.parse_args()

    t0 = time.perf_counter()
    ensure_tree(args.root, args.pairs)
    print(f"[tree] {args.root} ready ({time.perf_counter() - t0:.1f}s)")
    png_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(args.root, "clean"))
        for f in fs
    )
    ds = MpiSintelClean(root=args.root)
    n_pairs = len(ds)
    print(
        f"[tree] {n_pairs} pairs, mean png "
        f"{png_bytes / max(1, n_pairs + len(ds.image_list)) / 1e6:.2f} MB"
    )

    results = {}
    for nw in args.workers:
        loader = DataLoader(ds, args.batch, shuffle=False, num_workers=nw)
        # warm epoch (page cache, lazy .so build), then timed epochs
        for _ in loader:
            pass
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += batch["images"].shape[0]
            best = min(best, (time.perf_counter() - t0) / n)
        pairs_s = 1.0 / best
        # each pair decodes 2 PNGs + 1 flo; decoded bytes moved per pair:
        mb_s = (2 * H * W * 3 + H * W * 2 * 4) * pairs_s / 1e6
        results[nw] = round(pairs_s, 1)
        print(
            f"[bench] workers={nw:2d}: {pairs_s:7.1f} pairs/s "
            f"({mb_s:6.0f} MB/s decoded)"
        )

    print(json.dumps({"metric": "host_pipeline_pairs_per_sec", "by_workers": results}))


if __name__ == "__main__":
    main()
