"""Camera models: perspective projection, weak-perspective decoding, and
vectorized weighted-least-squares translation estimation.

Capability parity with reference ``utils/geometry.py`` (perspective_projection:
63-91, estimate_translation:94-181) and ``base_adaptor.py:160-170``
(weak-perspective cam decoding), redesigned batched: the reference solves the
camera-translation least squares one sample at a time in numpy; here the whole
batch is one ``jnp.linalg.solve`` over stacked 3x3 normal equations.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dynaboa_tpu import constants

# Small geometric contractions are precision-critical (mm-level parity) and
# contribute negligible FLOPs next to the backbone, so always run them in
# full float32 on the MXU.
_HI = lax.Precision.HIGHEST


def perspective_projection(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length,
    camera_center: jnp.ndarray,
) -> jnp.ndarray:
    """Project 3D points with a pinhole camera.

    Args:
      points: (B, N, 3)
      rotation: (B, 3, 3) camera rotation.
      translation: (B, 3)
      focal_length: scalar or (B,)
      camera_center: (B, 2)
    Returns:
      (B, N, 2) pixel coordinates.
    """
    pts = jnp.einsum("bij,bkj->bki", rotation, points, precision=_HI) + translation[:, None, :]
    projected = pts / pts[..., 2:3]
    f = jnp.broadcast_to(jnp.asarray(focal_length, points.dtype), pts.shape[:1])
    xy = projected[..., :2] * f[:, None, None] + camera_center[:, None, :]
    return xy


def weak_perspective_to_translation(cam: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Decode the HMR (s, tx, ty) camera into a 3D camera translation.

    t = [tx, ty, 2 * FOCAL_LENGTH / (IMG_RES * s + eps)]
    (reference base_adaptor.py:160-162).
    """
    tz = 2.0 * constants.FOCAL_LENGTH / (constants.IMG_RES * cam[:, 0] + eps)
    return jnp.stack([cam[:, 1], cam[:, 2], tz], axis=-1)


def project_to_crop(cam: jnp.ndarray, s3d: jnp.ndarray, eps: float = 1e-9):
    """Weak-perspective projection of 3D joints into the 224x224 crop.

    Returns both the pixel-space projection (origin at crop center) and the
    [-1, 1]-normalized coordinates the losses consume
    (reference base_adaptor.py:160-170).

    Args:
      cam: (B, 3) as (s, tx, ty).
      s3d: (B, N, 3)
    Returns:
      dict with 'ori' (B, N, 2) and 'normed' (B, N, 2).
    """
    batch = s3d.shape[0]
    cam_t = weak_perspective_to_translation(cam, eps)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=s3d.dtype), (batch, 3, 3))
    center = jnp.zeros((batch, 2), dtype=s3d.dtype)
    s2d = perspective_projection(
        s3d, eye, cam_t, constants.FOCAL_LENGTH, center
    )
    return {"ori": s2d, "normed": s2d / (constants.IMG_RES / 2.0)}


def estimate_translation(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length: float = 5000.0,
    img_size: float = 224.0,
) -> jnp.ndarray:
    """Weighted least-squares camera translation from 2D/3D correspondences.

    Vectorized equivalent of reference geometry.py:94-132 (there: a python
    loop of per-sample ``np.linalg.solve``).  For each sample solve
    ``argmin_t sum_j w_j || f * (X_j + t)_{xy} / (Z_j + t_z) - x_j ||^2``
    linearized as in the reference (unknowns [t_x, t_y, t_z]).

    Args:
      S: (B, N, 3) 3D joints.
      joints_2d: (B, N, 3) pixel-space 2D joints with confidence last.
    Returns:
      (B, 3) camera translations.
    """
    conf = joints_2d[..., 2]
    xy = joints_2d[..., :2]
    f = jnp.asarray(focal_length, S.dtype)
    center = img_size / 2.0

    # Residual rows: for each joint two equations
    #   f * t_x + (c_x - x) * t_z = (x - c_x) * Z - f * X
    #   f * t_y + (c_y - y) * t_z = (y - c_y) * Z - f * Y
    w = jnp.sqrt(jnp.maximum(conf, 0.0))[..., None]           # (B, N, 1)
    Z = S[..., 2:3]                                           # (B, N, 1)
    zeros = jnp.zeros_like(conf)
    ones = jnp.ones_like(conf)
    rows_x = jnp.stack([f * ones, zeros, center - xy[..., 0]], axis=-1)
    rows_y = jnp.stack([zeros, f * ones, center - xy[..., 1]], axis=-1)
    Q = jnp.concatenate([rows_x * w, rows_y * w], axis=1)     # (B, 2N, 3)
    cx = ((xy[..., 0] - center) * Z[..., 0] - f * S[..., 0])[..., None]
    cy = ((xy[..., 1] - center) * Z[..., 0] - f * S[..., 1])[..., None]
    c = jnp.concatenate([cx * w, cy * w], axis=1)[..., 0]     # (B, 2N)

    A = jnp.einsum("bri,brj->bij", Q, Q, precision=_HI)                      # (B, 3, 3)
    b = jnp.einsum("bri,br->bi", Q, c, precision=_HI)                        # (B, 3)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def estimate_translation_hmmr(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length: float = 5000.0,
    img_size: float = 256.0,
) -> jnp.ndarray:
    """HMMR-convention translation fit: uses only the first 14 joints of the
    correspondences (reference geometry.py:134-153; there a per-sample numpy
    loop over ``estimate_translation_np``, here the same batched WLS solve as
    ``estimate_translation``).

    Args:
      S: (B, >=14, 3) 3D joints.
      joints_2d: (B, >=14, 3) pixel-space 2D joints with confidence last.
    Returns:
      (B, 3) camera translations.
    """
    return estimate_translation(S[:, :14], joints_2d[:, :14],
                                focal_length=focal_length, img_size=img_size)
