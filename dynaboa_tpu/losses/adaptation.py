"""Adaptation losses for dynamic bilevel online adaptation.

Capability parity with the loss builders on the reference's BaseAdaptor
(base_adaptor.py): conf-weighted 2D reprojection (lower/upper level, 222-317),
mean-teacher distillation (cal_teacher_loss:320-343), labeled mixed-training
loss (adapt_on_labeled_data:346-376), temporal motion loss
(cal_motion_loss:379-398), hip-aligned 3D loss (cal_s3d_loss:412-422) and the
feature cosine similarity (cal_feature_diff:211-219).

Every function is pure (no logging side channels); each returns its scalar
plus a dict of sub-terms so the runner can surface the same observability
keys the reference writes to TensorBoard.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynaboa_tpu.ops.rotations import batch_rodrigues, rotmat_to_aa
from dynaboa_tpu.losses.priors import GMMPrior, gmm_prior_nll, shape_prior


def row_weighted_mean(x: jnp.ndarray, w: jnp.ndarray | None) -> jnp.ndarray:
    """Mean over all elements with optional per-row (batch) weights.

    ``w=None`` (or all-ones) reproduces ``x.mean()`` exactly; zero-weight
    rows contribute neither numerator nor denominator.  Used to exclude the
    pad rows of a partial batched window (the final window of a stream whose
    length is not a multiple of window_size) from every loss term."""
    if w is None:
        return x.mean()
    wb = w.reshape(w.shape[0], *([1] * (x.ndim - 1)))
    per_row = float(x.size // x.shape[0])
    return (x * wb).sum() / (w.sum() * per_row)


def keypoint_2d_loss(
    pred_s2d_normed: jnp.ndarray,   # (B, 49, 2) in [-1, 1]
    gt_j2d: jnp.ndarray,            # (B, 49, 3) normalized, conf last
    row_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Confidence-weighted MSE on the 24 GT joints (indices 25:)
    (reference base_adaptor.py:229-234)."""
    conf = gt_j2d[:, 25:, 2:3]
    err = (pred_s2d_normed[:, 25:] - gt_j2d[:, 25:, :2]) ** 2
    return row_weighted_mean(err * conf, row_w)


def keypoint_2d_loss_openpose(
    pred_s2d_normed: jnp.ndarray,
    kp2d: jnp.ndarray,
    row_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Webcam-path variant: losses over the 25 OpenPose joints (indices :25)
    (reference dynaboa_webcam.py:249-254 uses [:, :25])."""
    conf = kp2d[:, :25, 2:3]
    err = (pred_s2d_normed[:, :25] - kp2d[:, :25, :2]) ** 2
    return row_weighted_mean(err * conf, row_w)


def pose_prior_loss(
    prior: GMMPrior, pred_rotmat: jnp.ndarray, betas: jnp.ndarray,
    row_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GMM max-mixture NLL on the 23 body rotations converted to axis-angle
    (reference base_adaptor.py:405-409)."""
    body = pred_rotmat[:, 1:].reshape(-1, 3, 3)
    aa = rotmat_to_aa(body).reshape(pred_rotmat.shape[0], 69)
    del betas  # the reference passes betas through but the GMM ignores them
    return row_weighted_mean(gmm_prior_nll(prior, aa), row_w)


def frame_loss(
    prior: GMMPrior,
    pred_s2d_normed: jnp.ndarray,
    pred_rotmat: jnp.ndarray,
    pred_shape: jnp.ndarray,
    gt_j2d: jnp.ndarray,
    s2d_weight: float,
    shape_prior_weight: float,
    pose_prior_weight: float,
    row_w: jnp.ndarray | None = None,
    kp_loss_fn=None,
):
    """The per-frame unsupervised loss mix used at both levels
    (reference base_adaptor.py:231-247 / 280-296).  ``kp_loss_fn`` selects
    the 2D keypoint term (default GT-SPIN ``keypoint_2d_loss``; the webcam
    path passes ``keypoint_2d_loss_openpose``) so both keypoint sources
    share ONE weight-mix/aux implementation."""
    s2d = (kp_loss_fn or keypoint_2d_loss)(pred_s2d_normed, gt_j2d, row_w)
    sp = shape_prior(pred_shape, row_w)
    pp = pose_prior_loss(prior, pred_rotmat, pred_shape, row_w)
    total = s2d * s2d_weight + sp * shape_prior_weight + pp * pose_prior_weight
    return total, {"s2dloss": s2d, "shape_prior": sp, "pose_prior": pp}


def teacher_loss(
    pred_rotmat, pred_shape, pred_s2d, pred_s3d,
    ema_rotmat, ema_shape, ema_s2d, ema_s3d,
    row_w: jnp.ndarray | None = None,
):
    """SPIN-style distillation vs the mean teacher: fixed 5/5/0.001/1 mix
    (reference base_adaptor.py:320-343)."""
    s2d = row_weighted_mean((pred_s2d - ema_s2d) ** 2, row_w)
    s3d = row_weighted_mean((ema_s3d - pred_s3d) ** 2, row_w)
    shape = row_weighted_mean((pred_shape - ema_shape) ** 2, row_w)
    pose = row_weighted_mean((pred_rotmat - ema_rotmat) ** 2, row_w)
    total = s2d * 5 + s3d * 5 + shape * 0.001 + pose * 1
    return total, {"s2dloss": s2d, "s3dloss": s3d, "shape_loss": shape,
                   "pose_loss": pose, "loss": total}


def aligned_s3d_loss(
    pred_s3d: jnp.ndarray,   # (B, 24, 3) predicted GT-half joints
    gt_s3d: jnp.ndarray,     # (B, 24, 3)
    conf: jnp.ndarray,       # (B, 24, 1)
) -> jnp.ndarray:
    """Pelvis-align both skeletons at the hip midpoint (joints 2, 3), then
    conf-weighted MSE (reference base_adaptor.py:412-422)."""
    gt_hip = (gt_s3d[:, 2] + gt_s3d[:, 3]) / 2
    pred_hip = (pred_s3d[:, 2] + pred_s3d[:, 3]) / 2
    gt = gt_s3d - gt_hip[:, None]
    pred = pred_s3d - pred_hip[:, None]
    return (conf * (pred - gt) ** 2).mean()


def labeled_loss(
    pred_rotmat, pred_shape, pred_s2d_normed, pred_s3d,
    gt_pose_aa, gt_shape, gt_j2d, gt_s3d,
):
    """Fully-supervised loss on retrieved source exemplars: fixed
    5/5/0.001/1 mix (reference base_adaptor.py:346-376).

    Args:
      gt_pose_aa: (B, 72) axis-angle SMPL pose.
      gt_j2d: (B, 49, 3) normalized keypoints with conf.
      gt_s3d: (B, 24, 4) 3D joints with visibility last.
    """
    gt_rotmat = batch_rodrigues(gt_pose_aa.reshape(-1, 3)).reshape(-1, 24, 3, 3)
    pose = ((pred_rotmat - gt_rotmat) ** 2).mean()
    shape = ((pred_shape - gt_shape) ** 2).mean()
    conf = gt_j2d[:, 25:, 2:3]
    s2d = (((pred_s2d_normed[:, 25:] - gt_j2d[:, 25:, :2]) ** 2) * conf).mean()
    s3d = aligned_s3d_loss(pred_s3d[:, 25:], gt_s3d[..., :3], conf)
    total = s2d * 5 + s3d * 5 + shape * 0.001 + pose * 1
    return total, {"labled_s2dloss": s2d, "labled_s3dloss": s3d,
                   "labled_shape_loss": shape, "labled_pose_loss": pose,
                   "labled_loss": total}


def motion_loss(
    pred_s2d: jnp.ndarray,        # (B, 24, 2) current-frame GT-half pred
    gt_s2d: jnp.ndarray,          # (B, 24, 3) current-frame GT joints + conf
    hist_pred_s2d: jnp.ndarray,   # (B, 24, 2) prediction on the t-interval frame
    hist_s2d: jnp.ndarray,        # (B, 24, 3) GT joints of that frame + conf
    row_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """2D motion consistency: predicted displacement vs GT displacement over
    the history interval, gated to joints confident in BOTH frames
    (reference base_adaptor.py:379-398)."""
    pred_motion = pred_s2d - hist_pred_s2d
    gt_motion = gt_s2d[..., :2] - hist_s2d[..., :2]
    conf = jnp.where(
        (hist_s2d[..., 2:3] + gt_s2d[..., 2:3]) == 2.0, 1.0, 0.0
    )
    return row_weighted_mean(((pred_motion - gt_motion) ** 2) * conf, row_w)


def feature_cosine_similarities(features_i, features_j, eps: float = 1e-12):
    """Per-tap cosine similarity between two feature lists.

    Returns the (15,) similarity vector; entry 12 is the dynamic-BOA
    convergence signal (reference base_adaptor.py:211-219,
    dynaboa_benchmark.py:166).  NB the reference's *logged* mean divides by
    len-1 (a log-only quirk, base_adaptor.py:218); here the mean is the true
    mean and only the per-tap values drive control flow, identically to the
    reference.
    """
    sims = []
    for fi, fj in zip(features_i, features_j):
        a = fi.reshape(-1)
        b = fj.reshape(-1)
        denom = jnp.maximum(
            jnp.linalg.norm(a) * jnp.linalg.norm(b), eps
        )
        sims.append(jnp.vdot(a, b) / denom)
    return jnp.stack(sims)
