"""Bounding-box crop geometry and the fused on-device preprocessing graph.

The reference preprocesses every frame on the host (``utils/dataprocess.py``:
get_transform:13-37, transform:39-46, crop:48-96 — numpy box extraction +
skimage bilinear resize), then normalizes with torchvision.  Here the same
affine-crop convention ("scale" in units of 200 px, one-indexed point
transform with truncation) is kept in two forms:

* a faithful host/numpy path (`crop_numpy`) used by the offline tooling and
  parity tests, and
* `fused_crop_resize_normalize` — a single gather-based XLA graph (decode ->
  crop -> bilinear resize -> ImageNet normalize) that runs on TPU with static
  shapes, so per-frame preprocessing fuses into the model's program instead of
  bouncing through cv2/skimage on the host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dynaboa_tpu import constants


# ---------------------------------------------------------------------------
# Affine transform bookkeeping (host + device safe: plain arithmetic).
# ---------------------------------------------------------------------------

def get_transform(center, scale, res, rot: float = 0.0) -> np.ndarray:
    """3x3 matrix mapping original-image points into the res x res crop.

    ``scale`` is the person size in units of 200 px (reference
    dataprocess.py:13-37).
    """
    h = 200.0 * scale
    t = np.zeros((3, 3))
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rot = -rot
        rot_mat = np.zeros((3, 3))
        rot_rad = rot * np.pi / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        rot_mat[2, 2] = 1
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform_point(pt, center, scale, res, invert: int = 0, rot: float = 0.0):
    """One-indexed point transform with integer truncation.

    Bit-parity with reference dataprocess.py:39-46 (the +/-1 and
    ``astype(int) + 1`` conventions leak into keypoint normalization, so they
    are preserved exactly).
    """
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1, pt[1] - 1, 1.0])
    new_pt = t @ new_pt
    return new_pt[:2].astype(int) + 1


def transform_points_batch(pts: np.ndarray, center, scale, res) -> np.ndarray:
    """Vectorized `transform_point` over (N, 2) points (rot=0 path).

    Replaces the reference's per-keypoint python loop
    (boa_dataset/pw3d.py:153-165) with one matmul.
    """
    t = get_transform(center, scale, res)
    homo = np.concatenate([pts - 1.0, np.ones((pts.shape[0], 1))], axis=1)
    out = homo @ t.T
    return out[:, :2].astype(int) + 1


def crop_bounds(center, scale, res):
    """Upper-left / bottom-right source-image corners of the crop box."""
    ul = np.array(transform_point([1, 1], center, scale, res, invert=1)) - 1
    br = np.array(
        transform_point([res[0] + 1, res[1] + 1], center, scale, res, invert=1)
    ) - 1
    return ul, br


# ---------------------------------------------------------------------------
# Host (numpy) crop: faithful reference path for tooling and parity tests.
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _gaussian_blur(img: np.ndarray, sigmas) -> np.ndarray:
    """Separable gaussian blur with reflect padding (skimage-compatible)."""
    out = img.astype(np.float64)
    for axis, sigma in enumerate(sigmas):
        if sigma <= 0:
            continue
        radius = int(4.0 * sigma + 0.5)
        k = _gaussian_kernel1d(sigma, radius)
        out = np.apply_along_axis(
            lambda m: np.convolve(np.pad(m, radius, mode="reflect"), k, "valid"),
            axis,
            out,
        )
    return out


def resize_bilinear_np(
    img: np.ndarray, out_shape, anti_aliasing: bool = True
) -> np.ndarray:
    """Bilinear resize with skimage semantics (half-pixel centers, edge clamp,
    gaussian anti-aliasing prefilter when downsampling)."""
    in_h, in_w = img.shape[:2]
    out_h, out_w = out_shape
    src = img.astype(np.float64)
    if anti_aliasing:
        fy, fx = in_h / out_h, in_w / out_w
        sig = (max(0.0, (fy - 1) / 2), max(0.0, (fx - 1) / 2))
        if sig[0] > 0 or sig[1] > 0:
            sigmas = list(sig) + [0.0] * (img.ndim - 2)
            src = _gaussian_blur(src, sigmas)

    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def crop_numpy(
    img: np.ndarray, center, scale, res, anti_aliasing: bool = True
) -> np.ndarray:
    """Zero-padded box crop + bilinear resize (reference dataprocess.py:48-96,
    rot=0 path)."""
    ul, br = crop_bounds(center, scale, res)
    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if img.ndim > 2:
        new_shape += [img.shape[2]]
    new_img = np.zeros(new_shape, dtype=np.float64)

    new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(img.shape[1], br[0])
    old_y = max(0, ul[1]), min(img.shape[0], br[1])
    new_img[new_y[0]:new_y[1], new_x[0]:new_x[1]] = img[
        old_y[0]:old_y[1], old_x[0]:old_x[1]
    ]
    return resize_bilinear_np(new_img, res, anti_aliasing=anti_aliasing)


def normalize_j2d(kp: np.ndarray, center, scale) -> np.ndarray:
    """Keypoints -> crop frame -> [-1, 1] (reference pw3d.py:153-165)."""
    kp = kp.copy()
    res = [constants.IMG_RES, constants.IMG_RES]
    kp[:, :2] = transform_points_batch(kp[:, :2] + 1, center, scale, res)
    kp[:, :-1] = 2.0 * kp[:, :-1] / constants.IMG_RES - 1.0
    return kp.astype(np.float32)


# ---------------------------------------------------------------------------
# Device path: fused crop + resize + normalize as one XLA gather graph.
# ---------------------------------------------------------------------------

def fused_crop_resize_normalize(
    image: jnp.ndarray,
    center: jnp.ndarray,
    scale: jnp.ndarray,
    out_res: int = constants.IMG_RES,
    supersample: int = 2,
) -> jnp.ndarray:
    """Crop by (center, scale), resize to out_res, and ImageNet-normalize —
    one jittable graph with static shapes.

    The source image shape is static (pad frames of a sequence to a common
    size); the crop box is dynamic, entering only through gather coordinates.
    ``supersample`` integer-oversamples the bilinear gather and box-filters
    down, approximating skimage's gaussian anti-aliasing prefilter
    (dataprocess.py:91) without a dynamic-width convolution.

    Args:
      image: (H, W, 3) float32 RGB in [0, 255].
      center: (2,) crop center in source pixels.
      scale: () person scale in 200 px units.
    Returns:
      (out_res, out_res, 3) float32, ImageNet-normalized, NHWC-friendly.
    """
    h_img, w_img = image.shape[0], image.shape[1]
    res = out_res * supersample

    # Crop box in source coords.  The reference's one-indexed transform
    # arithmetic (dataprocess.py:39-54) reduces, for rot=0, to
    # ul = int(center - h/2), br = int(center + h/2) with truncation.
    h = 200.0 * scale
    ul_x = jnp.trunc(center[0] - h / 2.0)
    ul_y = jnp.trunc(center[1] - h / 2.0)
    br_x = jnp.trunc(center[0] + h / 2.0)
    br_y = jnp.trunc(center[1] + h / 2.0)
    box_w = br_x - ul_x
    box_h = br_y - ul_y

    # Output grid -> patch coordinates (skimage half-pixel convention),
    # clamped at the patch border (the zero padding happens at the *patch*
    # border in the reference, then bilinear samples clamp at patch edges).
    ys = (jnp.arange(res, dtype=jnp.float32) + 0.5) * box_h / res - 0.5
    xs = (jnp.arange(res, dtype=jnp.float32) + 0.5) * box_w / res - 0.5
    patch_y = jnp.clip(ys, 0.0, box_h - 1.0)
    patch_x = jnp.clip(xs, 0.0, box_w - 1.0)
    src_y = patch_y + ul_y
    src_x = patch_x + ul_x

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = (src_y - y0)[:, None, None]
    wx = (src_x - x0)[None, :, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def sample(yi, xi):
        # Out-of-source-bounds taps read zero (the reference's zero padding).
        valid = (
            (yi[:, None] >= 0) & (yi[:, None] < h_img)
            & (xi[None, :] >= 0) & (xi[None, :] < w_img)
        )[..., None]
        yc = jnp.clip(yi, 0, h_img - 1)
        xc = jnp.clip(xi, 0, w_img - 1)
        vals = image[yc][:, xc]
        return jnp.where(valid, vals, 0.0)

    top = sample(y0i, x0i) * (1 - wx) + sample(y0i, x0i + 1) * wx
    bot = sample(y0i + 1, x0i) * (1 - wx) + sample(y0i + 1, x0i + 1) * wx
    out = top * (1 - wy) + bot * wy

    if supersample > 1:
        out = out.reshape(out_res, supersample, out_res, supersample, 3).mean(
            axis=(1, 3)
        )

    out = out / 255.0
    mean = jnp.asarray(constants.IMG_NORM_MEAN)
    std = jnp.asarray(constants.IMG_NORM_STD)
    return (out - mean) / std


def uncrop_bounds(center, scale, crop_res, orig_shape):
    """Source-image placement of a crop (for overlay rendering); mirrors
    reference dataprocess.py:98-123 geometry."""
    ul, br = crop_bounds(center, scale, crop_res)
    return ul, br, orig_shape


# ---------------------------------------------------------------------------
# Augmentation helpers (reference dataprocess.py:125-164)
# ---------------------------------------------------------------------------

def rot_aa(aa: np.ndarray, rot: float) -> np.ndarray:
    """Rotate an axis-angle global orientation by an in-plane image rotation
    of ``rot`` degrees (reference dataprocess.py:125-136; implemented on the
    framework's own rotation ops instead of cv2.Rodrigues)."""
    import jax.numpy as jnp

    from dynaboa_tpu.ops.rotations import batch_rodrigues, rotmat_to_aa

    R = np.array([
        [np.cos(np.deg2rad(-rot)), -np.sin(np.deg2rad(-rot)), 0],
        [np.sin(np.deg2rad(-rot)), np.cos(np.deg2rad(-rot)), 0],
        [0, 0, 1],
    ])
    per = np.asarray(batch_rodrigues(jnp.asarray(aa, jnp.float32)[None]))[0]
    res = np.asarray(rotmat_to_aa(jnp.asarray((R @ per)[None],
                                              jnp.float32)))[0]
    return res.astype(aa.dtype)


def flip_img(img: np.ndarray) -> np.ndarray:
    """Horizontal image flip (reference dataprocess.py:138-143)."""
    return np.fliplr(img)


def flip_kp(kp: np.ndarray) -> np.ndarray:
    """Flip keypoints with the left/right permutation for 24- or 49-joint
    layouts (reference dataprocess.py:145-153)."""
    if len(kp) == 24:
        perm = constants.J24_FLIP_PERM
    elif len(kp) == 49:
        perm = constants.J49_FLIP_PERM
    else:
        raise ValueError(f"no flip permutation for {len(kp)} joints")
    kp = kp[perm].copy()
    kp[:, 0] = -kp[:, 0]
    return kp


def flip_pose(pose: np.ndarray) -> np.ndarray:
    """Flip SMPL axis-angle parameters (reference dataprocess.py:155-164)."""
    pose = pose[constants.SMPL_POSE_FLIP_PERM].copy()
    pose[1::3] = -pose[1::3]
    pose[2::3] = -pose[2::3]
    return pose


def uncrop(img: np.ndarray, center, scale, orig_shape) -> np.ndarray:
    """Place a crop back into original-image coordinates
    (reference dataprocess.py:98-123)."""
    res = img.shape[:2]
    ul, br = crop_bounds(center, scale, res)
    crop_shape = [br[1] - ul[1], br[0] - ul[0]]
    new_img = np.zeros(orig_shape, dtype=np.uint8)
    new_x = max(0, -ul[0]), min(br[0], orig_shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], orig_shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(orig_shape[1], br[0])
    old_y = max(0, ul[1]), min(orig_shape[0], br[1])
    resized = resize_bilinear_np(img, crop_shape, anti_aliasing=False)
    new_img[old_y[0]:old_y[1], old_x[0]:old_x[1]] = resized[
        new_y[0]:new_y[1], new_x[0]:new_x[1]]
    return new_img
