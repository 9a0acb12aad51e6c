"""Losses and priors (layer L3)."""

from dynaboa_tpu.losses.priors import (
    GMMPrior,
    load_gmm_prior,
    default_gmm_path,
    synthetic_gmm_prior,
    gmm_prior_nll,
    gmm_prior_nll_full,
    gmm_mean_pose,
    create_prior,
    shape_prior,
    angle_prior,
    l2_prior,
)
from dynaboa_tpu.losses.adaptation import (
    keypoint_2d_loss,
    keypoint_2d_loss_openpose,
    pose_prior_loss,
    frame_loss,
    teacher_loss,
    aligned_s3d_loss,
    labeled_loss,
    motion_loss,
    feature_cosine_similarities,
)

__all__ = [
    "GMMPrior", "load_gmm_prior", "default_gmm_path", "synthetic_gmm_prior",
    "gmm_prior_nll", "gmm_prior_nll_full", "gmm_mean_pose", "create_prior",
    "shape_prior", "angle_prior", "l2_prior",
    "keypoint_2d_loss", "keypoint_2d_loss_openpose", "pose_prior_loss",
    "frame_loss", "teacher_loss", "aligned_s3d_loss", "labeled_loss",
    "motion_loss", "feature_cosine_similarities",
]
