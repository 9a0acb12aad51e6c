"""Numerics / geometry kernel library (layer L0 of the framework)."""

from dynaboa_tpu.ops.rotations import (
    rot6d_to_rotmat,
    quat_to_rotmat,
    batch_rodrigues,
    rotmat_to_quat,
    quat_to_aa,
    rotmat_to_aa,
)
from dynaboa_tpu.ops.camera import (
    perspective_projection,
    weak_perspective_to_translation,
    project_to_crop,
    estimate_translation,
    estimate_translation_hmmr,
)
from dynaboa_tpu.ops.procrustes import (
    similarity_transform,
    reconstruction_error,
    compute_error_accel,
    compute_pck,
)
from dynaboa_tpu.ops import image, keypoints

__all__ = [
    "rot6d_to_rotmat", "quat_to_rotmat", "batch_rodrigues", "rotmat_to_quat",
    "quat_to_aa", "rotmat_to_aa", "perspective_projection",
    "weak_perspective_to_translation", "project_to_crop",
    "estimate_translation", "estimate_translation_hmmr",
    "similarity_transform", "reconstruction_error",
    "compute_error_accel", "compute_pck", "image", "keypoints",
]
