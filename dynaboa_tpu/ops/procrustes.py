"""Batched Procrustes alignment (orthogonal similarity transform).

Capability parity with reference ``utils/pose_utils.py:9-64`` — there a
per-sample numpy SVD loop on the host; here one batched ``jnp.linalg.svd``
over (B, 3, 3) cross-covariances so PA-MPJPE stays on device.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Align S1 to S2 with the optimal (scale, rotation, translation).

    Solves the orthogonal Procrustes problem per batch element, exactly the
    classic Umeyama recipe of the reference (pose_utils.py:9-57).

    Args:
      S1: (B, N, 3) source points.
      S2: (B, N, 3) target points.
    Returns:
      (B, N, 3): S1 mapped through the optimal similarity transform.
    """
    # Work in (B, 3, N) like the reference's transposed layout.
    X1 = jnp.swapaxes(S1, -1, -2)
    X2 = jnp.swapaxes(S2, -1, -2)

    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c**2, axis=(-1, -2))

    K = jnp.matmul(X1c, jnp.swapaxes(X2c, -1, -2), precision=_HI)  # (B, 3, 3)
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)

    # det correction to ensure a proper rotation.
    det = jnp.linalg.det(U @ jnp.swapaxes(V, -1, -2))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[..., 2, 2].set(jnp.sign(det))
    R = V @ Z @ jnp.swapaxes(U, -1, -2)

    trace_RK = jnp.trace(R @ K, axis1=-2, axis2=-1)
    scale = trace_RK / var1
    t = mu2 - scale[..., None, None] * (R @ mu1)

    S1_hat = scale[..., None, None] * jnp.matmul(R, X1, precision=_HI) + t
    return jnp.swapaxes(S1_hat, -1, -2)


def reconstruction_error(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean joint error after Procrustes alignment (PA-MPJPE core).

    Parity with reference pose_utils.py:100-101.

    Args:
      S1, S2: (B, N, 3)
    Returns:
      (B,) mean L2 error per sample.
    """
    S1_hat = similarity_transform(S1, S2)
    return jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)


def compute_error_accel(
    joints_gt: jnp.ndarray, joints_pred: jnp.ndarray
) -> jnp.ndarray:
    """Acceleration error over a joint trajectory.

    Parity with reference pose_utils.py:116-144 (vis=None path).

    Args:
      joints_gt, joints_pred: (N, J, 3)
    Returns:
      (N-2,) per-frame acceleration error.
    """
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return jnp.linalg.norm(accel_pred - accel_gt, axis=2).mean(axis=1)


def compute_pck(s1: jnp.ndarray, s2: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Percentage of correct keypoints under an L2 threshold.

    Parity with reference pose_utils.py:66-73.

    Args:
      s1, s2: (B, N, 3)
    Returns:
      (B,) fraction of joints within ``threshold``.
    """
    return (jnp.linalg.norm(s1 - s2, axis=-1) < threshold).mean(axis=-1)


def reconstruction_error_full(
    S1: jnp.ndarray,
    S2: jnp.ndarray,
    needpck: bool = False,
    needauc: bool = False,
    reduction: str = "mean",
):
    """Procrustes-aligned reconstruction error with optional PCK@150mm and
    AUC over 0..150 mm thresholds (reference pose_utils.py:76-114, PoseAug
    AUC recipe).

    Returns ``re`` or ``(re, pck)`` / ``(re, auc)`` / ``(re, pck, auc)``.
    """
    import numpy as _np

    pck_150 = compute_pck(S1, S2, 0.15) if needpck else None
    auc = None
    if needauc:
        thresholds = _np.linspace(0, 150, 31)
        pcks = jnp.stack([compute_pck(S1, S2, float(t) / 1000.0)
                          for t in thresholds])
        auc = pcks.mean()

    re = reconstruction_error(S1, S2)
    if reduction == "mean":
        re = re.mean()
    elif reduction == "sum":
        re = re.sum()

    if needauc and needpck:
        return re, pck_150, auc
    if needauc:
        return re, auc
    if needpck:
        return re, pck_150
    return re
