"""Rotation representation conversions, fully batched and differentiable.

Capability parity with reference ``utils/geometry.py`` (rot6d_to_rotmat:47-61,
batch_rodrigues:9-23, quat_to_rotmat:25-45, rotation_matrix_to_angle_axis:
184-306), redesigned for XLA: every function is branchless (``jnp.where``
instead of boolean-mask case selection), shape-polymorphic over leading batch
dims, and NaN-safe under ``jax.grad``.
"""

from __future__ import annotations

import jax.numpy as jnp

_NORM_EPS = 1e-12  # matches torch F.normalize clamp


def _safe_normalize(v: jnp.ndarray, eps: float = _NORM_EPS) -> jnp.ndarray:
    """v / max(||v||, eps) along the last axis (torch F.normalize semantics)."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrices via Gram-Schmidt.

    Zhou et al. CVPR'19 continuity representation, with the reference's exact
    element layout: the 6-vector reshapes to (3, 2) row-major, so column 0 is
    elements [0, 2, 4] and column 1 is [1, 3, 5] (reference geometry.py:47-61).

    Args:
      x: (..., 6) or (..., 24*6) — any trailing size divisible by 6.
    Returns:
      (N, 3, 3) with N = prod(leading dims) * (trailing // 6); b1, b2, b3 are
      the matrix *columns*.
    """
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    b1 = _safe_normalize(a1)
    b2 = _safe_normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize (w, x, y, z) quaternions and convert to matrices.

    Parity with reference geometry.py:25-45.

    Args:
      quat: (..., 4)
    Returns:
      (..., 3, 3)
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix, through the quaternion exponential.

    Numerically identical to reference geometry.py:9-23 (including the
    ``||theta + 1e-8||`` regularized norm that makes theta=0 well-defined).

    Args:
      theta: (..., 3) axis-angle vectors.
    Returns:
      (..., 3, 3)
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def rotmat_to_quat(R: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrices -> (w, x, y, z) quaternions, branchless.

    Implements the four-case Shepperd extraction with ``jnp.where`` selection
    over the same case predicate structure as the reference
    (geometry.py:248-306), so the chosen branch — and therefore the float
    rounding — matches per element.  Gradients are finite everywhere because
    every sqrt argument is clamped positive before use.

    Args:
      R: (..., 3, 3)
    Returns:
      (..., 4) unit quaternions (sign convention of the reference).
    """
    # The reference operates on R^T element indices; writing the formulas in
    # terms of R directly gives the identical arithmetic.
    Rt = jnp.swapaxes(R, -1, -2)
    r = lambda i, j: Rt[..., i, j]

    t0 = 1 + r(0, 0) - r(1, 1) - r(2, 2)
    q0 = jnp.stack([r(1, 2) - r(2, 1), t0, r(0, 1) + r(1, 0),
                    r(2, 0) + r(0, 2)], axis=-1)
    t1 = 1 - r(0, 0) + r(1, 1) - r(2, 2)
    q1 = jnp.stack([r(2, 0) - r(0, 2), r(0, 1) + r(1, 0), t1,
                    r(1, 2) + r(2, 1)], axis=-1)
    t2 = 1 - r(0, 0) - r(1, 1) + r(2, 2)
    q2 = jnp.stack([r(0, 1) - r(1, 0), r(2, 0) + r(0, 2),
                    r(1, 2) + r(2, 1), t2], axis=-1)
    t3 = 1 + r(0, 0) + r(1, 1) + r(2, 2)
    q3 = jnp.stack([t3, r(1, 2) - r(2, 1), r(2, 0) - r(0, 2),
                    r(0, 1) - r(1, 0)], axis=-1)

    mask_d2 = r(2, 2) < eps
    mask_d0_d1 = r(0, 0) > r(1, 1)
    mask_d0_nd1 = r(0, 0) < -r(1, 1)

    c0 = mask_d2 & mask_d0_d1
    c1 = mask_d2 & ~mask_d0_d1
    c2 = ~mask_d2 & mask_d0_nd1
    # c3 = ~mask_d2 & ~mask_d0_nd1 (fallthrough)

    def pick(a, b, c, d):
        out = jnp.where(c0[..., None], a, d)
        out = jnp.where(c1[..., None], b, out)
        out = jnp.where(c2[..., None], c, out)
        return out

    q = pick(q0, q1, q2, q3)
    t = pick(t0[..., None], t1[..., None], t2[..., None], t3[..., None])
    # t > 0 on the selected branch for any orthonormal input; clamp for safety
    # so grads stay finite on degenerate (non-rotation) inputs.
    q = q * 0.5 / jnp.sqrt(jnp.maximum(t, eps))
    return q


def quat_to_aa(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Quaternions -> axis-angle, safe at theta -> 0.

    Parity with reference geometry.py:216-245: for sin^2(theta/2) <= 0 the
    scale falls back to 2 (small-angle limit), and the two-argument atan2 keeps
    the angle in [0, pi] by flipping sign pairs when cos < 0.

    Args:
      quaternion: (..., 4) as (w, x, y, z).
    Returns:
      (..., 3)
    """
    q1, q2, q3 = quaternion[..., 1], quaternion[..., 2], quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    # Guard the sqrt so its gradient is finite at sin_sq == 0; the guarded
    # lane is overwritten by the small-angle branch below.
    safe_sin_sq = jnp.where(sin_sq > 0.0, sin_sq, 1.0)
    sin_theta = jnp.sqrt(safe_sin_sq)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k = jnp.where(sin_sq > 0.0, two_theta / sin_theta, 2.0 * jnp.ones_like(sin_theta))
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> axis-angle (differentiable; NaNs mapped to 0).

    Composition parity with reference geometry.py:184-213 (rotmat -> quat ->
    axis-angle with a NaN guard at the end).

    Args:
      R: (..., 3, 3)
    Returns:
      (..., 3)
    """
    aa = quat_to_aa(rotmat_to_quat(R))
    return jnp.where(jnp.isnan(aa), 0.0, aa)
