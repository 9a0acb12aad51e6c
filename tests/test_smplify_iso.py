import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.models import synthetic_smpl_model, smpl_forward
from dynaboa_tpu.models.hmr import HMRISO
from dynaboa_tpu.smplify import SMPLify, gmof, camera_fitting_loss
from dynaboa_tpu.ops.camera import perspective_projection


class TestGmof:
    def test_small_residuals_quadratic(self):
        x = jnp.asarray([0.01, -0.01])
        np.testing.assert_allclose(np.asarray(gmof(x, 100.0)), np.asarray(x)**2,
                                   rtol=1e-4)

    def test_saturates_at_sigma_squared(self):
        big = float(gmof(jnp.asarray([1e4]), 100.0)[0])
        assert big <= 100.0**2
        assert big > 0.99 * 100.0**2


class TestSMPLify:
    @pytest.fixture(scope="class")
    def setup(self):
        smpl = synthetic_smpl_model(seed=20, num_vertices=256)
        prior = synthetic_gmm_prior(seed=21)
        return smpl, prior

    def test_fit_reduces_reprojection(self, setup, rng):
        smpl, prior = setup
        B = 2
        # ground-truth bodies produce the target keypoints
        gt_pose = jnp.asarray(rng.normal(scale=0.15, size=(B, 72)).astype(np.float32))
        gt_betas = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)).astype(np.float32))
        cam_t = jnp.asarray(np.tile([0.0, 0.0, 10.0], (B, 1)).astype(np.float32))
        center = jnp.full((B, 2), 112.0)

        out = smpl_forward(smpl, gt_betas, gt_pose, pose2rot=True)
        eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        j2d = perspective_projection(out.joints, eye, cam_t, 5000.0, center)
        kp = jnp.concatenate([j2d, jnp.ones((B, 49, 1))], axis=-1)

        fitter = SMPLify(smpl, prior, num_iters=30)
        init_pose = gt_pose + 0.2 * jnp.asarray(
            rng.normal(size=(B, 72)).astype(np.float32))
        init_betas = jnp.zeros((B, 10))

        loss_before = fitter.get_fitting_loss(init_pose, init_betas, cam_t,
                                              center, kp)
        verts, joints, pose, betas, cam_out, reproj = fitter(
            init_pose, init_betas, cam_t, center, kp)
        assert float(reproj.sum()) < float(loss_before.sum())
        assert verts.shape[0] == B and joints.shape == (B, 49, 3)
        assert np.isfinite(np.asarray(verts)).all()


class TestHMRISO:
    @pytest.mark.slow
    def test_dual_head_outputs(self, rng):
        model = HMRISO(layers=(1, 1, 1, 1), width=16, regressor_dim=64)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert len(out) == 6
        fsl_rotmat, fsl_shape, fsl_cam, ssl_rotmat, ssl_shape, ssl_cam = out
        assert fsl_rotmat.shape == (1, 24, 3, 3)
        assert ssl_rotmat.shape == (1, 24, 3, 3)
        assert fsl_shape.shape == (1, 10) and ssl_shape.shape == (1, 10)
        # heads are independently initialized -> different outputs
        assert not np.allclose(np.asarray(fsl_cam), np.asarray(ssl_cam))
