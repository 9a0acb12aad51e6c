import numpy as np
import jax.numpy as jnp

from dynaboa_tpu import constants
from dynaboa_tpu.ops import (
    perspective_projection,
    weak_perspective_to_translation,
    project_to_crop,
    estimate_translation,
    similarity_transform,
    reconstruction_error,
    compute_error_accel,
)
from tests.test_rotations import random_rotmats


class TestProjection:
    def test_pinhole_closed_form(self, rng):
        pts = rng.normal(size=(2, 5, 3)).astype(np.float32)
        pts[..., 2] += 10.0
        t = np.zeros((2, 3), dtype=np.float32)
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
        center = np.full((2, 2), 112.0, dtype=np.float32)
        out = perspective_projection(
            jnp.asarray(pts), jnp.asarray(eye), jnp.asarray(t), 5000.0,
            jnp.asarray(center),
        )
        want = pts[..., :2] / pts[..., 2:3] * 5000.0 + 112.0
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_rotation_applied_before_translation(self, rng):
        R = random_rotmats(rng, 1)
        pts = rng.normal(size=(1, 4, 3)).astype(np.float32)
        t = np.array([[0.1, -0.2, 8.0]], dtype=np.float32)
        out = perspective_projection(
            jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), 100.0,
            jnp.zeros((1, 2)),
        )
        cam_pts = pts @ R[0].T + t[0]
        want = cam_pts[..., :2] / cam_pts[..., 2:3] * 100.0
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    def test_weak_perspective_translation(self):
        cam = jnp.asarray([[1.0, 0.5, -0.5]])
        t = weak_perspective_to_translation(cam)
        np.testing.assert_allclose(
            np.asarray(t),
            [[0.5, -0.5, 2 * constants.FOCAL_LENGTH / (constants.IMG_RES + 1e-9)]],
            rtol=1e-6,
        )

    def test_project_to_crop_normalization(self, rng):
        s3d = rng.normal(size=(3, 49, 3)).astype(np.float32) * 0.2
        cam = np.array([[1.0, 0.0, 0.0]] * 3, dtype=np.float32)
        out = project_to_crop(jnp.asarray(cam), jnp.asarray(s3d))
        np.testing.assert_allclose(
            np.asarray(out["normed"]),
            np.asarray(out["ori"]) / (constants.IMG_RES / 2.0),
            rtol=1e-6,
        )


class TestEstimateTranslation:
    def test_recovers_true_translation(self, rng):
        S = rng.normal(size=(4, 24, 3)).astype(np.float32)
        t_true = np.stack(
            [rng.uniform(-0.5, 0.5, 4), rng.uniform(-0.5, 0.5, 4),
             rng.uniform(5, 15, 4)], axis=1
        ).astype(np.float32)
        f, size = 5000.0, 224.0
        cam_pts = S + t_true[:, None]
        xy = cam_pts[..., :2] / cam_pts[..., 2:3] * f + size / 2
        j2d = np.concatenate([xy, np.ones((4, 24, 1), np.float32)], axis=-1)
        t_est = estimate_translation(jnp.asarray(S), jnp.asarray(j2d), f, size)
        # The linearized LS is exact only as Z >> spread; expect ~cm accuracy.
        np.testing.assert_allclose(np.asarray(t_est), t_true, atol=0.05)

    def test_zero_confidence_joints_ignored(self, rng):
        S = rng.normal(size=(1, 10, 3)).astype(np.float32)
        t_true = np.array([[0.2, -0.1, 10.0]], dtype=np.float32)
        cam_pts = S + t_true[:, None]
        xy = cam_pts[..., :2] / cam_pts[..., 2:3] * 5000.0 + 112.0
        conf = np.ones((1, 10, 1), np.float32)
        xy_corrupt = xy.copy()
        xy_corrupt[0, 0] += 500.0  # corrupt one joint...
        conf[0, 0] = 0.0           # ...but zero its confidence
        j2d = np.concatenate([xy_corrupt, conf], axis=-1)
        t_est = estimate_translation(jnp.asarray(S), jnp.asarray(j2d))
        np.testing.assert_allclose(np.asarray(t_est), t_true, atol=0.05)


class TestProcrustes:
    def test_exact_recovery_under_similarity(self, rng):
        S2 = rng.normal(size=(8, 14, 3)).astype(np.float32)
        R = random_rotmats(rng, 8)
        s = rng.uniform(0.5, 2.0, size=(8, 1, 1)).astype(np.float32)
        t = rng.normal(size=(8, 1, 3)).astype(np.float32)
        S1 = (np.einsum("bij,bnj->bni", R, S2) * s + t).astype(np.float32)
        S1_hat = similarity_transform(jnp.asarray(S1), jnp.asarray(S2))
        np.testing.assert_allclose(np.asarray(S1_hat), S2, atol=1e-4)

    def test_matches_reference_numpy_algorithm(self, rng):
        """Cross-check the batched SVD path against a direct per-sample
        numpy Umeyama implementation (the reference's algorithm)."""
        S1 = rng.normal(size=(6, 14, 3)).astype(np.float32)
        S2 = rng.normal(size=(6, 14, 3)).astype(np.float32)

        def umeyama(a, b):
            a, b = a.T, b.T
            mu1, mu2 = a.mean(1, keepdims=True), b.mean(1, keepdims=True)
            X1, X2 = a - mu1, b - mu2
            var1 = (X1**2).sum()
            K = X1 @ X2.T
            U, s, Vh = np.linalg.svd(K)
            V = Vh.T
            Z = np.eye(3)
            Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
            R = V @ Z @ U.T
            scale = np.trace(R @ K) / var1
            t = mu2 - scale * (R @ mu1)
            return (scale * R @ a + t).T

        want = np.stack([umeyama(S1[i], S2[i]) for i in range(6)])
        got = np.asarray(similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_reconstruction_error_zero_for_aligned(self, rng):
        S = rng.normal(size=(4, 14, 3)).astype(np.float32)
        err = reconstruction_error(jnp.asarray(S), jnp.asarray(S))
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


class TestAccel:
    def test_zero_for_equal_trajectories(self, rng):
        J = rng.normal(size=(10, 14, 3)).astype(np.float32)
        err = compute_error_accel(jnp.asarray(J), jnp.asarray(J))
        assert err.shape == (8,)
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-6)
