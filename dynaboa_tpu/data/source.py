"""Labeled source-domain (H36M) exemplar loading for mixed training.

Capability parity with the reference's SourceDataset
(base_adaptor.py:450-555): a joblib archive of ~100 fully-labeled H36M
samples (imgname/scale/center/pose/shape/S/part) whose images are cropped and
normalized.  The reference re-reads and re-crops the exemplar image from disk
on every retrieval hit; here the whole bank is preprocessed once and staged
to device memory (see engine.retrieval).
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import jax.numpy as jnp

from dynaboa_tpu.data.streams import _imread_rgb, crop_and_normalize
from dynaboa_tpu.engine.retrieval import ExemplarBank
from dynaboa_tpu.ops import image as I


def load_source_exemplars(datapath: str, img_root: str) -> ExemplarBank:
    """Load + preprocess the exemplar archive into an on-device bank."""
    import joblib

    data = joblib.load(datapath)
    imgnames = data["imgname"]
    scales = np.asarray(data["scale"], np.float32)
    centers = np.asarray(data["center"], np.float32)
    poses = np.asarray(data["pose"], np.float32)
    betas = np.asarray(data["shape"], np.float32)
    S = np.asarray(data["S"], np.float32)
    part = np.asarray(data["part"], np.float32)

    M = scales.shape[0]
    # 49-joint layout: 25 zero OpenPose slots + 24 GT joints
    # (reference base_adaptor.py:465-467)
    kp = np.concatenate([np.zeros((M, 25, 3), np.float32), part], axis=1)

    images, keypoints = [], []
    for i in range(M):
        img = _imread_rgb(osp.join(img_root, str(imgnames[i])))
        images.append(crop_and_normalize(img, centers[i], float(scales[i])))
        keypoints.append(I.normalize_j2d(kp[i], centers[i], float(scales[i])))

    return ExemplarBank(
        images=jnp.asarray(np.stack(images)),
        keypoints=jnp.asarray(np.stack(keypoints)),
        pose=jnp.asarray(poses),
        betas=jnp.asarray(betas),
        pose_3d=jnp.asarray(S),
    )
