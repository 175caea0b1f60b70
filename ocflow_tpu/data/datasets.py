"""Dataset classes: file-list construction + per-sample decode, NHWC numpy.

Mirrors the reference's 13 dataset classes (models/data/datasets.py) with the
same directory layouts, crop-to-/64 rule, resize-with-flow-rescale, [-1, 1]
normalization and occlusion binarization — but returns plain numpy dicts
(``images`` [H,W,6], ``flow`` [H,W,2], ``occ`` [H,W,1], or the inpainting
triple ``occluded``/``image``/``occ``) ready for host batching.

A ``SyntheticFlow`` dataset (no files needed) backs tests and benchmarks.
"""

from __future__ import annotations

import os
from glob import glob
from os.path import isfile, join
from typing import Sequence

import numpy as np

from ocflow_tpu.data.frame_io import read_gen
from ocflow_tpu.data.flow_io import read_kitti_png_flow, resize_flow_np
from ocflow_tpu.data.occlusion import (
    apply_occlusion,
    free_form_occlusion,
    static_random_occlusion,
)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [-1, 1] (ToTensor + Normalize(.5, .5),
    reference lightning_datamodule.py:20-23)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def center_crop(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[(h - th) // 2 : (h + th) // 2, (w - tw) // 2 : (w + tw) // 2]


class StaticRandomCrop:
    """Crop offset drawn once, applied to every array (so image pairs, flow
    and occ stay aligned — reference datasets.py:39-47)."""

    def __init__(self, rng: np.random.Generator, image_size, crop_size):
        self.th, self.tw = crop_size
        h, w = image_size
        self.h1 = int(rng.integers(0, max(h - self.th, 1)))
        self.w1 = int(rng.integers(0, max(w - self.tw, 1)))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return img[self.h1 : self.h1 + self.th, self.w1 : self.w1 + self.tw]


def rescale(images: np.ndarray, range_=(0.0, 1.0), old_range=(0.0, 255.0)) -> np.ndarray:
    """Linear range remap (reference RescaleTransform, datasets.py:17-37)."""
    lo, hi = range_
    olo, ohi = old_range
    return (images - olo) / (ohi - olo) * (hi - lo) + lo


def floor64(size: Sequence[int]) -> tuple[int, int]:
    """Crop target: floor spatial dims to a multiple of 64
    (reference datasets.py:148-150)."""
    h, w = size
    if h % 64 or w % 64:
        return (h // 64) * 64, (w // 64) * 64
    return h, w


def _resize_img(img: np.ndarray, height: int, width: int) -> np.ndarray:
    import cv2

    out = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[..., None]
    return out


def binarize_occ(occ: np.ndarray) -> np.ndarray:
    """occ > 0.5 → 1 else 0 (reference datasets.py:664-665)."""
    return (occ > 0.5).astype(np.float32)


class Dataset:
    """Minimal map-style dataset protocol."""

    size: int
    replicates: int = 1

    def __len__(self):
        return self.size * self.replicates

    def __getitem__(self, index: int) -> dict:
        raise NotImplementedError


class _FlowPairDataset(Dataset):
    """Shared logic: image pair + optional flow + optional occ."""

    def __init__(self, image_list, flow_list=None, occ_list=None, image_size=None, replicates=1):
        self.image_list = image_list
        self.flow_list = flow_list
        self.occ_list = occ_list
        self.image_size = image_size
        self.replicates = replicates
        self.size = len(image_list)
        if self.size == 0:
            raise FileNotFoundError("Empty dataset: no files matched")
        self.render_size = floor64(read_gen(image_list[0][0]).shape[:2])

    def __getitem__(self, index):
        index = index % self.size
        th, tw = self.render_size
        images = None
        if not self.image_size:
            # fused native decode+crop+normalize (GIL-free single pass);
            # None -> generic path below
            from ocflow_tpu.data import native_io

            images = native_io.read_pair_norm(
                self.image_list[index][0], self.image_list[index][1], th, tw
            )
        if images is None:
            img1 = center_crop(read_gen(self.image_list[index][0]), th, tw)
            img2 = center_crop(read_gen(self.image_list[index][1]), th, tw)
            if self.image_size:
                img1 = _resize_img(img1, *self.image_size)
                img2 = _resize_img(img2, *self.image_size)
            images = np.concatenate(
                [normalize_image(img1), normalize_image(img2)], axis=-1
            )
        sample = {"images": images}
        if self.flow_list is not None:
            flow = center_crop(read_gen(self.flow_list[index]).astype(np.float32), th, tw)
            if self.image_size:
                flow = resize_flow_np(flow, *self.image_size)
            sample["flow"] = flow
        if self.occ_list is not None:
            occ = center_crop(read_gen(self.occ_list[index]).astype(np.float32), th, tw)
            if occ.ndim == 2:
                occ = occ[..., None]
            occ = occ[..., :1]
            if occ.max() > 1.5:  # stored as 0/255 png
                occ = occ / 255.0
            if self.image_size:
                occ = _resize_img(occ, *self.image_size)
            sample["occ"] = binarize_occ(occ)
        return sample


class MpiSintel(_FlowPairDataset):
    """Sintel pairs + .flo flow (reference datasets.py:113-200)."""

    def __init__(self, root="", dstype="clean", replicates=1, image_size=None):
        flow_root = join(root, "flow")
        image_root = join(root, dstype)
        files = sorted(glob(join(flow_root, "*/*.flo")))
        image_list, flow_list = [], []
        for file in files:
            fbase = file[len(flow_root) + 1 :]
            fprefix, fnum = fbase[:-8], int(fbase[-8:-4])
            img1 = join(image_root, fprefix + f"{fnum:04d}.png")
            img2 = join(image_root, fprefix + f"{fnum + 1:04d}.png")
            assert isfile(img1), f"Cannot find file: {img1}"
            assert isfile(img2), f"Cannot find file: {img2}"
            image_list.append([img1, img2])
            flow_list.append(file)
        super().__init__(image_list, flow_list, None, image_size, replicates)


class MpiSintelClean(MpiSintel):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "clean", replicates, image_size)


class MpiSintelFinal(MpiSintel):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "final", replicates, image_size)


class MpiSintelOcc(Dataset):
    """Sintel pairs + occlusion masks (reference datasets.py:202-290);
    returns {'images', 'occ'}."""

    def __init__(self, root="", dstype="clean", replicates=1, image_size=None):
        occ_root = join(root, "occlusions")
        image_root = join(root, dstype)
        occs = sorted(glob(join(occ_root, "*/*.png")))
        image_list, occ_list = [], []
        for file in occs:
            fbase = file[len(occ_root) + 1 :]
            fprefix, fnum = fbase[:-8], int(fbase[-8:-4])
            img1 = join(image_root, fprefix + f"{fnum:04d}.png")
            img2 = join(image_root, fprefix + f"{fnum + 1:04d}.png")
            assert isfile(img1) and isfile(img2)
            image_list.append([img1, img2])
            occ_list.append(file)
        self._inner = _FlowPairDataset(image_list, None, occ_list, image_size, replicates)
        self.size = self._inner.size
        self.replicates = replicates

    def __getitem__(self, index):
        return self._inner[index]


class MpiSintelOccClean(MpiSintelOcc):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "clean", replicates, image_size)


class MpiSintelOccFinal(MpiSintelOcc):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "final", replicates, image_size)


class MpiSintelFlowOcc(Dataset):
    """Sintel pairs + flow + occ (reference datasets.py:292-394)."""

    def __init__(self, root="", dstype="clean", replicates=1, image_size=None):
        flow_root = join(root, "flow")
        occ_root = join(root, "occlusions")
        image_root = join(root, dstype)
        files = sorted(glob(join(flow_root, "*/*.flo")))
        image_list, flow_list, occ_list = [], [], []
        for file in files:
            fbase = file[len(flow_root) + 1 :]
            fprefix, fnum = fbase[:-8], int(fbase[-8:-4])
            img1 = join(image_root, fprefix + f"{fnum:04d}.png")
            img2 = join(image_root, fprefix + f"{fnum + 1:04d}.png")
            occ = join(occ_root, fprefix + f"{fnum:04d}.png")
            assert isfile(img1) and isfile(img2) and isfile(occ)
            image_list.append([img1, img2])
            flow_list.append(file)
            occ_list.append(occ)
        self._inner = _FlowPairDataset(image_list, flow_list, occ_list, image_size, replicates)
        self.size = self._inner.size
        self.replicates = replicates

    def __getitem__(self, index):
        return self._inner[index]


class MpiSintelFlowOccClean(MpiSintelFlowOcc):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "clean", replicates, image_size)


class MpiSintelFlowOccFinal(MpiSintelFlowOcc):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "final", replicates, image_size)


class _InpaintingDataset(Dataset):
    """Single frames + synthetic occlusion → {'occluded','image','occ'}
    (reference datasets.py:396-463)."""

    def __init__(self, image_list, replicates=1, image_size=None,
                 occlusion_ratio=0.5, static_occ=False, seed=0):
        self.image_list = image_list
        self.size = len(image_list)
        if self.size == 0:
            raise FileNotFoundError("Empty dataset: no files matched")
        self.replicates = replicates
        self.image_size = image_size
        self.occlusion_ratio = occlusion_ratio
        self.static_occ = static_occ
        self.seed = seed
        self.render_size = floor64(read_gen(image_list[0]).shape[:2])

    def __getitem__(self, index):
        rng = np.random.default_rng((self.seed, index))
        idx = index % self.size
        th, tw = self.render_size
        img = center_crop(read_gen(self.image_list[idx]), th, tw)
        if self.image_size:
            img = _resize_img(img, *self.image_size)
        img = normalize_image(img)
        h, w = img.shape[:2]
        if self.static_occ:
            mask = static_random_occlusion(rng, h, w, self.occlusion_ratio)
        else:
            mask = free_form_occlusion(rng, h, w, self.occlusion_ratio)
        return {"occluded": apply_occlusion(img, mask), "image": img, "occ": mask}


class MpiSintelInpainting(_InpaintingDataset):
    def __init__(self, root="", dstype="clean", replicates=1, image_size=None,
                 occlusion_ratio=0.5, static_occ=False, seed=0):
        image_list = sorted(glob(join(root, dstype, "*/*.png")))
        super().__init__(image_list, replicates, image_size, occlusion_ratio, static_occ, seed)


class MpiSintelCleanInpainting(MpiSintelInpainting):
    def __init__(self, root="", replicates=1, image_size=None, occlusion_ratio=0.5,
                 static_occ=False, seed=0):
        super().__init__(root, "clean", replicates, image_size, occlusion_ratio, static_occ, seed)


class MpiSintelFinalInpainting(MpiSintelInpainting):
    # NB: the reference passes dstype='clean' here too (datasets.py:463) —
    # replicated faithfully.
    def __init__(self, root="", replicates=1, image_size=None, occlusion_ratio=0.5,
                 static_occ=False, seed=0):
        super().__init__(root, "clean", replicates, image_size, occlusion_ratio, static_occ, seed)


class FlyingChairs(_FlowPairDataset):
    """ppm pairs + .flo (reference datasets.py:465-531)."""

    def __init__(self, root="", replicates=1, image_size=None):
        images = sorted(glob(join(root, "*.ppm")))
        flow_list = sorted(glob(join(root, "*.flo")))
        assert len(images) // 2 == len(flow_list)
        image_list = [[images[2 * i], images[2 * i + 1]] for i in range(len(flow_list))]
        super().__init__(image_list, flow_list, None, image_size, replicates)


class FlyingChairsInpainting(_InpaintingDataset):
    def __init__(self, root="", replicates=1, image_size=None, occlusion_ratio=0.5,
                 static_occ=False, seed=0):
        image_list = sorted(glob(join(root, "*-img_*.png")))
        super().__init__(image_list, replicates, image_size, occlusion_ratio, static_occ, seed)


class FlyingChairs2(_FlowPairDataset):
    """png pairs + flow_01.flo + occ_01.png — the default unsupervised
    training set (reference datasets.py:587-669)."""

    def __init__(self, root="", replicates=1, image_size=None):
        images = sorted(glob(join(root, "*-img_*.png")))
        flow_list = sorted(glob(join(root, "*-flow_01.flo")))
        occ_list = sorted(glob(join(root, "*-occ_01.png")))
        assert len(images) // 2 == len(flow_list)
        image_list = [[images[2 * i], images[2 * i + 1]] for i in range(len(flow_list))]
        super().__init__(image_list, flow_list, occ_list, image_size, replicates)


class ImagesFromFolder(_FlowPairDataset):
    """Consecutive-frame pairs, images only (reference datasets.py:671-721)."""

    def __init__(self, root="", iext="png", replicates=1, image_size=None):
        images = sorted(glob(join(root, "*." + iext)))
        image_list = [[images[i], images[i + 1]] for i in range(len(images) - 1)]
        super().__init__(image_list, None, None, image_size, replicates)


class ImgFlowOccFromFolder(_FlowPairDataset):
    """Folder layout img_1/ img_2/ flow/ occlusion/ (reference datasets.py:723-792)."""

    def __init__(self, root="", iext="png", replicates=1, image_size=None):
        first = sorted(glob(join(root, "img_1", "*." + iext)))
        second = sorted(glob(join(root, "img_2", "*." + iext)))
        flow_list = sorted(glob(join(root, "flow", "*.flo")))
        occ_list = sorted(glob(join(root, "occlusion", "*." + iext)))
        assert len(first) == len(second) == len(flow_list) == len(occ_list)
        image_list = [list(p) for p in zip(first, second)]
        super().__init__(image_list, flow_list, occ_list, image_size, replicates)


class SyntheticFlow(Dataset):
    """Procedural pairs with known flow: img2 is img1 translated by a random
    integer shift. No files needed; used by tests and benchmarks."""

    def __init__(self, size=64, image_size=(64, 128), max_shift=4, seed=0, with_occ=True):
        self.size = size
        self.image_size = image_size
        self.max_shift = max_shift
        self.seed = seed
        self.with_occ = with_occ

    def __getitem__(self, index):
        rng = np.random.default_rng((self.seed, index % self.size))
        h, w = self.image_size
        sx = int(rng.integers(-self.max_shift, self.max_shift + 1))
        sy = int(rng.integers(-self.max_shift, self.max_shift + 1))
        pad = self.max_shift
        base = rng.uniform(-1, 1, (h + 2 * pad, w + 2 * pad, 3)).astype(np.float32)
        # Gaussian-smooth so photometric gradients have a multi-pixel
        # convergence basin (raw noise has sub-pixel correlation length and
        # is unlearnable by warping losses); rescale to keep contrast.
        import cv2

        base = cv2.GaussianBlur(base, (0, 0), 3.0) * 3.0
        base = np.clip(base, -1.0, 1.0)
        img1 = base[pad : pad + h, pad : pad + w]
        img2 = base[pad + sy : pad + sy + h, pad + sx : pad + sx + w]
        # img2[y, x] = img1[y + sy, x + sx], so backward-warping img2 to img1
        # samples img2 at (x - sx, y - sy): GT flow is (-sx, -sy).
        flow = np.zeros((h, w, 2), np.float32)
        flow[..., 0] = -sx
        flow[..., 1] = -sy
        sample = {
            "images": np.concatenate([img1, img2], axis=-1),
            "flow": flow,
        }
        if self.with_occ:
            sample["occ"] = np.zeros((h, w, 1), np.float32)
        return sample


class SyntheticFlowWarp(Dataset):
    """Procedural pairs with a smooth non-rigid GT flow field.

    Unlike ``SyntheticFlow`` (constant integer shift), each sample draws a
    random affine motion plus a band-limited random deformation, and builds
    img1 by INVERSE-warping img2 through the field: img1(p) = img2(p + F(p)),
    the exact relation the repo's backward ``ops.warp`` assumes, so GT EPE
    is well-defined and photometric losses have a true optimum at F. Serves
    as the real-shaped stand-in for FlyingChairs-style data in this
    zero-egress environment (no dataset files can be downloaded); texture =
    multi-scale smoothed noise so the photometric loss has a multi-pixel
    convergence basin.
    """

    def __init__(self, size=512, image_size=(448, 1024), max_shift=16.0,
                 seed=0, with_occ=False):
        self.size = size
        self.image_size = image_size
        self.max_shift = float(max_shift)
        self.seed = seed
        self.with_occ = with_occ

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        import cv2

        rng = np.random.default_rng((self.seed, index % self.size))
        h, w = self.image_size

        # multi-octave texture in [-1, 1]
        img2 = np.zeros((h, w, 3), np.float32)
        for sigma, amp in ((2.0, 1.0), (6.0, 1.5), (18.0, 2.0)):
            img2 += cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w, 3)).astype(np.float32),
                (0, 0), sigma) * amp * sigma
        img2 = np.clip(img2 / np.abs(img2).max() * 1.6, -1.0, 1.0)

        # flow = affine (translation + small rotation/zoom) + smooth field
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        tx, ty = rng.uniform(-self.max_shift, self.max_shift, 2)
        rot = rng.uniform(-0.02, 0.02)
        zoom = rng.uniform(-0.02, 0.02)
        u = tx + zoom * (xx - cx) - rot * (yy - cy)
        v = ty + zoom * (yy - cy) + rot * (xx - cx)
        for sigma, amp in ((24.0, 4.0), (64.0, 8.0)):
            u += cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w)).astype(np.float32),
                (0, 0), sigma) * amp * sigma / 8.0
            v += cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w)).astype(np.float32),
                (0, 0), sigma) * amp * sigma / 8.0
        flow = np.stack([u, v], axis=-1)

        # img1(p) = img2(p + F(p)); out-of-view samples get border replicate
        # (photometric loss there is noise either way)
        img1 = cv2.remap(
            img2, np.ascontiguousarray(xx + u, np.float32),
            np.ascontiguousarray(yy + v, np.float32), cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REPLICATE)

        sample = {
            "images": np.concatenate([img1, img2], axis=-1),
            "flow": flow.astype(np.float32),
        }
        if self.with_occ:
            sample["occ"] = np.zeros((h, w, 1), np.float32)
        return sample


class SyntheticInpainting(Dataset):
    """Procedural inpainting samples: multi-octave texture frames (same
    generator as SyntheticFlowWarp) + free-form occlusion strokes →
    {'occluded', 'image', 'occ'}, the _InpaintingDataset contract
    (reference datasets.py:396-463) without needing files. Stand-in for
    FlyingChairsInpainting/MpiSintel*Inpainting in this zero-egress
    environment; drives the inpainting GAN and two-stage regimes on TPU.
    """

    def __init__(self, size=64, image_size=(64, 128), occlusion_ratio=0.5,
                 static_occ=False, seed=0):
        self.size = size
        self.image_size = image_size
        self.occlusion_ratio = occlusion_ratio
        self.static_occ = static_occ
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        import cv2

        rng = np.random.default_rng((self.seed, 7, index % self.size))
        h, w = self.image_size
        img = np.zeros((h, w, 3), np.float32)
        for sigma, amp in ((2.0, 1.0), (6.0, 1.5), (18.0, 2.0)):
            img += cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w, 3)).astype(np.float32),
                (0, 0), sigma) * amp * sigma
        img = np.clip(img / np.abs(img).max() * 1.6, -1.0, 1.0)
        if self.static_occ:
            mask = static_random_occlusion(rng, h, w, self.occlusion_ratio)
        else:
            mask = free_form_occlusion(rng, h, w, self.occlusion_ratio)
        return {"occluded": apply_occlusion(img, mask), "image": img,
                "occ": mask}


class KITTI2015(_FlowPairDataset):
    """KITTI-2015 training layout: ``root/image_2/%06d_10.png`` +
    ``%06d_11.png`` frame pairs with ``root/<flow_type>/%06d_10.png`` 16-bit
    png flow (u,v scaled by 64 around 2^15, validity in the third channel —
    reference IO semantics at flow_utils.py:72-79,354-360). ``flow_type`` ∈
    {'flow_occ' (all valid pixels), 'flow_noc' (non-occluded only)}.

    Returns {'images', 'flow' [H,W,2], 'valid' [H,W,1]}; invalid pixels carry
    zero flow and valid=0 (KITTI GT is sparse), so losses/metrics must mask
    by 'valid' (metrics.flow_kitti_error does).
    """

    def __init__(self, root="", flow_type="flow_occ", replicates=1, image_size=None):
        image_root = join(root, "image_2")
        flow_root = join(root, flow_type)
        files = sorted(glob(join(flow_root, "*_10.png")))
        image_list, flow_list = [], []
        for file in files:
            frame = file[len(flow_root) + 1 : -7]
            img1 = join(image_root, f"{frame}_10.png")
            img2 = join(image_root, f"{frame}_11.png")
            assert isfile(img1), f"Cannot find file: {img1}"
            assert isfile(img2), f"Cannot find file: {img2}"
            image_list.append([img1, img2])
            flow_list.append(file)
        # flow_list stays None in super(): KITTI flow needs the 16-bit reader
        super().__init__(image_list, None, None, image_size, replicates)
        self.kitti_flow_list = flow_list

    def __getitem__(self, index):
        sample = super().__getitem__(index)
        index = index % self.size
        th, tw = self.render_size
        raw = read_kitti_png_flow(self.kitti_flow_list[index]).astype(np.float32)
        raw = center_crop(raw, th, tw)
        flow, valid = raw[..., :2], raw[..., 2:3]
        if self.image_size:
            flow = resize_flow_np(flow, *self.image_size)
            valid = (_resize_img(valid, *self.image_size) > 0.5).astype(np.float32)
        sample["flow"] = flow * valid  # sparse GT: zero out invalid pixels
        sample["valid"] = valid
        return sample


class KITTI2015Noc(KITTI2015):
    def __init__(self, root="", replicates=1, image_size=None):
        super().__init__(root, "flow_noc", replicates, image_size)


DATASET_REGISTRY = {
    "KITTI2015": KITTI2015,
    "KITTI2015Noc": KITTI2015Noc,
    "MpiSintelClean": MpiSintelClean,
    "MpiSintelFinal": MpiSintelFinal,
    "MpiSintelOccClean": MpiSintelOccClean,
    "MpiSintelOccFinal": MpiSintelOccFinal,
    "MpiSintelFlowOccClean": MpiSintelFlowOccClean,
    "MpiSintelFlowOccFinal": MpiSintelFlowOccFinal,
    "MpiSintelCleanInpainting": MpiSintelCleanInpainting,
    "MpiSintelFinalInpainting": MpiSintelFinalInpainting,
    "FlyingChairs": FlyingChairs,
    "FlyingChairsInpainting": FlyingChairsInpainting,
    "FlyingChairs2": FlyingChairs2,
    "ImagesFromFolder": ImagesFromFolder,
    "ImgFlowOccFromFolder": ImgFlowOccFromFolder,
    "SyntheticFlow": SyntheticFlow,
    "SyntheticFlowWarp": SyntheticFlowWarp,
    "SyntheticInpainting": SyntheticInpainting,
}
