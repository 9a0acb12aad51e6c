import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.ops import (
    rot6d_to_rotmat,
    quat_to_rotmat,
    batch_rodrigues,
    rotmat_to_quat,
    rotmat_to_aa,
)


def random_rotmats(rng, n):
    """Uniform-ish random rotations via QR of gaussians."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q.astype(np.float32)


class TestRot6d:
    def test_orthonormal_det_one(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
        R = rot6d_to_rotmat(x)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(R, -1, -2) @ R), np.asarray(eye), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_roundtrip_from_rotation(self, rng):
        R = random_rotmats(rng, 32)
        # 6D repr = first two *columns*, interleaved row-major as (3, 2).
        six = R[:, :, :2].reshape(32, 6)
        R2 = rot6d_to_rotmat(jnp.asarray(six))
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_accepts_flat_pose_vector(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 24 * 6)).astype(np.float32))
        R = rot6d_to_rotmat(x)
        assert R.shape == (48, 3, 3)

    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
        g = jax.grad(lambda v: rot6d_to_rotmat(v).sum())(x)
        assert np.isfinite(np.asarray(g)).all()


class TestRodrigues:
    def test_identity_at_zero(self):
        R = batch_rodrigues(jnp.zeros((3, 3)))
        np.testing.assert_allclose(
            np.asarray(R), np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6
        )

    def test_matches_closed_form(self, rng):
        # Rodrigues formula: R = I + sin(t) K + (1 - cos(t)) K^2
        aa = rng.normal(size=(16, 3)).astype(np.float32)
        theta = np.linalg.norm(aa, axis=1, keepdims=True)
        k = aa / theta
        K = np.zeros((16, 3, 3), dtype=np.float32)
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        s = np.sin(theta)[..., None]
        c = np.cos(theta)[..., None]
        R_ref = np.eye(3) + s * K + (1 - c) * (K @ K)
        R = batch_rodrigues(jnp.asarray(aa))
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda v: batch_rodrigues(v).sum())(jnp.zeros((2, 3)))
        assert np.isfinite(np.asarray(g)).all()


class TestQuat:
    def test_roundtrip(self, rng):
        R = random_rotmats(rng, 64)
        q = rotmat_to_quat(jnp.asarray(R))
        R2 = quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_near_pi_rotations(self, rng):
        # Angles near pi stress the w~0 branches.
        axis = rng.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        aa = (axis * (np.pi - 1e-3)).astype(np.float32)
        R = batch_rodrigues(jnp.asarray(aa))
        aa2 = rotmat_to_aa(R)
        R2 = batch_rodrigues(aa2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


class TestRotmatToAA:
    def test_roundtrip(self, rng):
        axis = rng.normal(size=(64, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        angles = rng.uniform(0.05, np.pi - 0.05, size=(64, 1))
        aa = (axis * angles).astype(np.float32)
        out = rotmat_to_aa(batch_rodrigues(jnp.asarray(aa)))
        np.testing.assert_allclose(np.asarray(out), aa, atol=1e-4)

    def test_identity_maps_to_zero(self):
        out = rotmat_to_aa(jnp.broadcast_to(jnp.eye(3), (2, 3, 3)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_grad_finite_everywhere(self, rng):
        R = jnp.asarray(random_rotmats(rng, 8))
        g = jax.grad(lambda r: rotmat_to_aa(r).sum())(R)
        assert np.isfinite(np.asarray(g)).all()
        # identity is the degenerate point for the quat->aa scale
        g0 = jax.grad(lambda r: rotmat_to_aa(r).sum())(
            jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        )
        assert np.isfinite(np.asarray(g0)).all()

    def test_parity_with_torch_reference_semantics(self, rng):
        """The composed rotmat->quat->aa must match the reference's kornia
        implementation on random rotations (checked against an independent
        scipy computation)."""
        from scipy.spatial.transform import Rotation

        R = random_rotmats(rng, 32)
        ours = np.asarray(rotmat_to_aa(jnp.asarray(R)))
        want = Rotation.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(ours, want, atol=1e-4)
