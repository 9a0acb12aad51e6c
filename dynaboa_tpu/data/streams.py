"""Streaming frame datasets (layer L4).

Capability parity with reference ``boa_dataset/pw3d.py`` and
``boa_dataset/internet_data.py``: per-(seq, person) npz archives of frame
annotations are concatenated into one strictly-ordered frame stream; each
frame yields the 224x224 ImageNet-normalized crop, the crop-normalized
keypoints, GT SMPL parameters (3DPW), gender, bbox and image name.

Redesign notes:
* NHWC output (TPU layout) instead of the reference's CHW.
* A thread-pool prefetcher replaces the torch DataLoader's 8 worker
  processes (base_adaptor.py:137) — the work is numpy/cv2-bound IO.
* Frames can optionally be emitted raw (full padded frame + center/scale)
  so preprocessing runs in the fused on-device graph
  (dynaboa_tpu.ops.image.fused_crop_resize_normalize).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from dynaboa_tpu import constants
from dynaboa_tpu.ops import image as I


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1].astype(np.float32)


def _sort_key_3dpw(path: str) -> int:
    """Order parity with reference pw3d.py:19-23 (vid * 10 + person)."""
    base = os.path.basename(path)
    vid = base.split("_")[1]
    pid = base.split("_")[2][:-4]
    return int(vid) * 10 + int(pid)


def crop_and_normalize(img: np.ndarray, center, scale):
    """Host preprocessing: crop -> 224^2 -> [0,1] -> ImageNet normalize,
    NHWC float32."""
    out = I.crop_numpy(img, center, scale,
                       [constants.IMG_RES, constants.IMG_RES])
    out = out.astype(np.float32) / 255.0
    out = (out - constants.IMG_NORM_MEAN) / constants.IMG_NORM_STD
    return out


def pad_raw_frame(img: np.ndarray, pad_shape: tuple[int, int]) -> np.ndarray:
    """Zero-pad a raw frame to the stream's static shape (fused-preprocess
    mode).  Zero padding is exactly what the host crop would have produced
    for out-of-image taps (reference dataprocess.py:48-96), so a crop box
    touching the pad region reads identical values on both paths."""
    h, w = img.shape[:2]
    ph, pw = pad_shape
    if h > ph or w > pw:
        raise ValueError(f"frame {img.shape[:2]} exceeds pad_shape {pad_shape}")
    out = np.zeros((ph, pw, 3), img.dtype)
    out[:h, :w] = img
    return out


class PW3DStream:
    """3DPW test-set stream for the #PS protocol.

    Loads ``3dpw_{seq}_{person}.npz`` archives (produced by
    ``dynaboa_tpu.data.preprocess.pw3d``) in the reference's fixed order.
    """

    def __init__(self, npz_dir: str, img_root: str, prefetch: int = 8,
                 fused_preprocess: bool = False,
                 pad_shape: tuple[int, int] = (1920, 1920)):
        paths = glob.glob(osp.join(npz_dir, "3dpw_[0-9]*_[0-9].npz"))
        paths.sort(key=_sort_key_3dpw)
        if not paths:
            raise FileNotFoundError(f"no 3dpw npz archives in {npz_dir}")
        self.seq_paths = paths
        self.img_root = img_root
        self.prefetch = prefetch
        self.fused_preprocess = fused_preprocess
        self.pad_shape = pad_shape

        fields = {k: [] for k in
                  ("imgname", "scale", "center", "pose", "shape", "j2d",
                   "op_j2d", "gender")}
        self.seq_lengths = []
        for p in paths:
            d = np.load(p, allow_pickle=True)
            n = d["scale"].shape[0]
            self.seq_lengths.append(n)
            for k in fields:
                if k == "gender":
                    if "gender" in d:
                        g = np.array(
                            [0 if str(x) == "m" else 1 for x in d["gender"]],
                            np.int32)
                    else:
                        g = -np.ones(n, np.int32)
                    fields[k].append(g)
                else:
                    fields[k].append(d[k])
        self.imgname = np.concatenate(fields["imgname"])
        self.scale = np.concatenate(fields["scale"]).astype(np.float32)
        self.center = np.concatenate(fields["center"]).astype(np.float32)
        self.pose = np.concatenate(fields["pose"]).astype(np.float32)
        self.betas = np.concatenate(fields["shape"]).astype(np.float32)
        self.j2d = np.concatenate(fields["j2d"]).astype(np.float32)
        self.op_j2d = np.concatenate(fields["op_j2d"]).astype(np.float32)
        self.gender = np.concatenate(fields["gender"])

    def __len__(self):
        return self.scale.shape[0]

    def record_order(self, out_path: str):
        """seq_order.record parity (reference pw3d.py:67-69)."""
        with open(out_path, "w") as f:
            for p in self.seq_paths:
                f.write(p + "\n")

    def _load(self, i: int) -> dict:
        img = _imread_rgb(osp.join(self.img_root, str(self.imgname[i])))
        center, scale = self.center[i], float(self.scale[i])
        if self.fused_preprocess:
            item = {
                "raw_image": pad_raw_frame(img, self.pad_shape).astype(
                    np.uint8),
                "center": np.asarray(center, np.float32),
                "scale": np.float32(scale),
            }
        else:
            item = {"image": crop_and_normalize(img, center, scale)}
        item |= {
            "smpl_j2d": I.normalize_j2d(self.j2d[i], center, scale),
            "op_j2d": I.normalize_j2d(self.op_j2d[i], center, scale),
            "pose": self.pose[i],
            "betas": self.betas[i],
            "gender": self.gender[i],
            "imgname": str(self.imgname[i]),
            "bbox": np.array([center[0], center[1], scale * 200.0],
                             np.float32),
        }
        return item

    def __getitem__(self, i: int) -> dict:
        """Random access loads ON DEMAND (image read + crop per call) —
        nothing is materialized, so lazy views over index subsets
        (parallel.streams.partition_items) hold O(1) memory."""
        return self._load(i)

    def __iter__(self) -> Iterator[dict]:
        return _prefetched(self._load, len(self), self.prefetch)


class InternetStream:
    """Unlabeled internet-video stream (reference internet_data.py).

    npz fields: imgname / center / scale / part (49-joint keypoints with
    conf, produced by the AlphaPose extractor in data.preprocess.internet).
    """

    def __init__(self, root: str, prefetch: int = 8,
                 fused_preprocess: bool = False,
                 pad_shape: tuple[int, int] = (1920, 1920)):
        self.fused_preprocess = fused_preprocess
        self.pad_shape = pad_shape
        self.imgdir = osp.join(root, "images")
        paths = sorted(glob.glob(osp.join(root, "*.npz")))
        if not paths:
            raise FileNotFoundError(f"no npz archives in {root}")
        names, scales, centers, parts = [], [], [], []
        for p in paths:
            d = np.load(p, allow_pickle=True)
            names.append(d["imgname"])
            scales.append(d["scale"])
            centers.append(d["center"])
            parts.append(d["part"])
        self.imgname = np.concatenate(names)
        self.scale = np.concatenate(scales).astype(np.float32)
        self.center = np.concatenate(centers).astype(np.float32)
        self.j2d = np.concatenate(parts).astype(np.float32)
        self.prefetch = prefetch

    def __len__(self):
        return self.scale.shape[0]

    def _load(self, i: int) -> dict:
        img = _imread_rgb(osp.join(self.imgdir, str(self.imgname[i])))
        center, scale = self.center[i], float(self.scale[i])
        if self.fused_preprocess:
            head = {
                "raw_image": pad_raw_frame(img, self.pad_shape).astype(
                    np.uint8),
                "center": np.asarray(center, np.float32),
                "scale": np.float32(scale),
            }
        else:
            head = {"image": crop_and_normalize(img, center, scale)}
        return head | {
            "smpl_j2d": I.normalize_j2d(self.j2d[i], center, scale),
            "pose": np.zeros(72, np.float32),
            "betas": np.zeros(10, np.float32),
            "gender": np.int32(-1),
            "imgname": str(self.imgname[i]),
            "bbox": np.array([center[0], center[1], scale * 200.0],
                             np.float32),
        }

    def __getitem__(self, i: int) -> dict:
        return self._load(i)

    def __iter__(self) -> Iterator[dict]:
        return _prefetched(self._load, len(self), self.prefetch)


def _prefetched(load, n: int, workers: int) -> Iterator[dict]:
    """Ordered prefetching iterator (replaces DataLoader worker processes)."""
    if workers <= 0:
        for i in range(n):
            yield load(i)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        window = workers * 2
        futures = {i: ex.submit(load, i) for i in range(min(window, n))}
        for i in range(n):
            item = futures.pop(i).result()
            j = i + window
            if j < n:
                futures[j] = ex.submit(load, j)
            yield item


class SyntheticStream:
    """Deterministic synthetic stream with the exact 3DPW item schema —
    backs tests and the no-data benchmark mode."""

    def __init__(self, num_frames: int = 16, img_res: int = constants.IMG_RES,
                 seed: int = 0, fused_preprocess: bool = False):
        """``fused_preprocess=True`` emits raw uint8 frames + (center, scale)
        instead of host-cropped images, exercising the on-device
        ``fused_crop_resize_normalize`` path end-to-end.

        Frames are generated LAZILY, deterministically per (seed, index) —
        a 35k-frame stream holds no frame memory, so long-run soaks and
        lazy parallel partitions stay O(1) in host RAM."""
        self.n = num_frames
        self.img_res = img_res
        self.fused_preprocess = fused_preprocess
        self.seed = seed

    def _make_raw(self, r) -> dict:
        # spatially smooth content (8x8 blocks) so the host anti-aliasing
        # filter and the device supersampled box filter agree closely
        raw_res = self.img_res * 2
        low = r.integers(0, 256, size=(raw_res // 8, raw_res // 8, 3))
        raw = np.kron(low, np.ones((8, 8, 1))).astype(np.uint8)
        center = np.asarray([raw_res / 2.0, raw_res / 2.0], np.float32)
        scale = np.float32(self.img_res * 1.1 / 200.0)
        return {"raw_image": raw, "center": center, "scale": scale,
                "out_res": self.img_res}

    def _make(self, i: int) -> dict:
        r = np.random.default_rng((self.seed, i))
        if self.fused_preprocess:
            head = self._make_raw(r)
        else:
            head = {"image": r.normal(
                size=(self.img_res, self.img_res, 3)).astype(np.float32)}
        return head | {
            "smpl_j2d": np.concatenate([
                r.uniform(-1, 1, size=(49, 2)), np.ones((49, 1))], -1
            ).astype(np.float32),
            "op_j2d": np.concatenate([
                r.uniform(-1, 1, size=(49, 2)), np.ones((49, 1))], -1
            ).astype(np.float32),
            "pose": r.normal(scale=0.2, size=72).astype(np.float32),
            "betas": r.normal(scale=0.3, size=10).astype(np.float32),
            "gender": np.int32(i % 2),
            "imgname": f"synthetic_{i:06d}.png",
            "bbox": np.array([112.0, 112.0, 224.0], np.float32),
        }

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> dict:
        return self._make(i)

    def __iter__(self):
        return (self._make(i) for i in range(self.n))
