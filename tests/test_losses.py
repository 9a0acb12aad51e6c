import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.losses import (
    load_gmm_prior,
    default_gmm_path,
    synthetic_gmm_prior,
    gmm_prior_nll,
    shape_prior,
    angle_prior,
    keypoint_2d_loss,
    pose_prior_loss,
    teacher_loss,
    labeled_loss,
    motion_loss,
    aligned_s3d_loss,
    feature_cosine_similarities,
)
from dynaboa_tpu.ops import batch_rodrigues
from tests.test_rotations import random_rotmats


class TestGMMPrior:
    def test_loads_shipped_asset(self):
        path = default_gmm_path()
        assert path is not None
        prior = load_gmm_prior(path)
        assert prior.means.shape == (8, 69)
        assert prior.precisions.shape == (8, 69, 69)
        assert prior.nll_weights.shape == (8,)

    def test_nll_matches_direct_computation(self, rng):
        prior = synthetic_gmm_prior(seed=1)
        pose = rng.normal(size=(4, 69)).astype(np.float32)
        got = np.asarray(gmm_prior_nll(prior, jnp.asarray(pose)))

        means = np.asarray(prior.means, np.float64)
        precs = np.asarray(prior.precisions, np.float64)
        nw = np.asarray(prior.nll_weights, np.float64)
        want = []
        for p in pose:
            vals = []
            for m in range(8):
                d = p - means[m]
                vals.append(0.5 * d @ precs[m] @ d - np.log(nw[m]))
            want.append(min(vals))
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_nll_lower_at_mean(self):
        prior = synthetic_gmm_prior(seed=2)
        at_mean = gmm_prior_nll(prior, prior.means[:1])
        far = gmm_prior_nll(prior, prior.means[:1] + 3.0)
        assert float(at_mean[0]) < float(far[0])

    def test_grad_finite(self, rng):
        prior = load_gmm_prior(default_gmm_path())
        pose = jnp.asarray(rng.normal(scale=0.3, size=(2, 69)).astype(np.float32))
        g = jax.grad(lambda p: gmm_prior_nll(prior, p).mean())(pose)
        assert np.isfinite(np.asarray(g)).all()


class TestFrameLosses:
    def test_keypoint_loss_zero_at_gt(self, rng):
        pred = rng.normal(size=(2, 49, 2)).astype(np.float32)
        gt = np.concatenate([pred, np.ones((2, 49, 1), np.float32)], axis=-1)
        loss = keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt))
        assert float(loss) == 0.0

    def test_keypoint_loss_conf_weighting(self, rng):
        pred = np.zeros((1, 49, 2), np.float32)
        gt = np.zeros((1, 49, 3), np.float32)
        gt[0, 25:, :2] = 1.0      # error of 1 on every GT joint
        gt[0, 25:, 2] = 0.0       # but zero confidence
        loss = keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt))
        assert float(loss) == 0.0
        gt[0, 25, 2] = 1.0        # one confident joint
        loss = keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt))
        # mean over 24*2 elements, two of them contribute 1.0 each
        np.testing.assert_allclose(float(loss), 2.0 / 48, rtol=1e-6)

    def test_shape_prior(self):
        betas = jnp.asarray([[1.0] * 10, [0.0] * 10])
        np.testing.assert_allclose(float(shape_prior(betas)), 5.0)

    def test_pose_prior_uses_body_rotations_only(self, rng):
        prior = synthetic_gmm_prior(seed=3)
        R = random_rotmats(rng, 24).reshape(1, 24, 3, 3)
        betas = jnp.zeros((1, 10))
        l1 = pose_prior_loss(prior, jnp.asarray(R), betas)
        R2 = R.copy()
        R2[0, 0] = np.eye(3)  # change only the global orient
        l2 = pose_prior_loss(prior, jnp.asarray(R2), betas)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_teacher_loss_mix(self, rng):
        a = [jnp.asarray(rng.normal(size=s).astype(np.float32))
             for s in [(1, 24, 3, 3), (1, 10), (1, 49, 2), (1, 49, 3)]]
        total, parts = teacher_loss(*a, *a)
        assert float(total) == 0.0
        b = [x + 1.0 for x in a]
        total, parts = teacher_loss(*a, *b)
        want = 5 * parts["s2dloss"] + 5 * parts["s3dloss"] + \
            0.001 * parts["shape_loss"] + parts["pose_loss"]
        np.testing.assert_allclose(float(total), float(want), rtol=1e-6)

    def test_aligned_s3d_translation_invariant(self, rng):
        pred = rng.normal(size=(1, 24, 3)).astype(np.float32)
        gt = rng.normal(size=(1, 24, 3)).astype(np.float32)
        conf = np.ones((1, 24, 1), np.float32)
        l1 = aligned_s3d_loss(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(conf))
        l2 = aligned_s3d_loss(jnp.asarray(pred + 5.0), jnp.asarray(gt - 3.0),
                              jnp.asarray(conf))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)

    def test_labeled_loss_zero_at_gt(self, rng):
        aa = rng.normal(scale=0.2, size=(1, 72)).astype(np.float32)
        rotmat = batch_rodrigues(jnp.asarray(aa).reshape(-1, 3)).reshape(1, 24, 3, 3)
        shape = jnp.asarray(rng.normal(size=(1, 10)).astype(np.float32))
        s2d = rng.normal(size=(1, 49, 2)).astype(np.float32)
        gt_j2d = np.concatenate([s2d, np.ones((1, 49, 1), np.float32)], -1)
        s3d49 = rng.normal(size=(1, 49, 3)).astype(np.float32)
        gt_s3d = np.concatenate(
            [s3d49[:, 25:], np.ones((1, 24, 1), np.float32)], -1
        )
        total, _ = labeled_loss(
            rotmat, shape, jnp.asarray(s2d), jnp.asarray(s3d49),
            jnp.asarray(aa), shape, jnp.asarray(gt_j2d), jnp.asarray(gt_s3d),
        )
        assert float(total) < 1e-8

    def test_motion_loss_conf_gating(self, rng):
        pred = rng.normal(size=(1, 24, 2)).astype(np.float32)
        hist_pred = rng.normal(size=(1, 24, 2)).astype(np.float32)
        gt = np.concatenate(
            [pred + hist_pred * 0, np.ones((1, 24, 1), np.float32)], -1
        )
        hist = np.concatenate([hist_pred, np.ones((1, 24, 1), np.float32)], -1)
        # pred motion == gt motion -> zero
        gt[..., :2] = pred
        hist[..., :2] = hist_pred
        loss = motion_loss(jnp.asarray(pred) - jnp.asarray(hist_pred) + jnp.asarray(hist_pred),
                           jnp.asarray(gt), jnp.asarray(hist_pred),
                           jnp.asarray(hist))
        assert float(loss) < 1e-10
        # unconfident joints gate out
        hist[..., 2] = 0.0
        gt2 = gt.copy()
        gt2[..., :2] += 10.0
        loss = motion_loss(jnp.asarray(pred), jnp.asarray(gt2),
                           jnp.asarray(hist_pred), jnp.asarray(hist))
        assert float(loss) == 0.0


class TestFeatureSims:
    def test_identical_features_similarity_one(self, rng):
        feats = [jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
                 for _ in range(15)]
        sims = feature_cosine_similarities(feats, feats)
        assert sims.shape == (15,)
        np.testing.assert_allclose(np.asarray(sims), 1.0, atol=1e-6)

    def test_orthogonal_features_similarity_zero(self):
        a = [jnp.asarray([[1.0, 0.0]])]
        b = [jnp.asarray([[0.0, 1.0]])]
        sims = feature_cosine_similarities(a, b)
        np.testing.assert_allclose(np.asarray(sims), 0.0, atol=1e-7)

    def test_angle_prior_shape(self, rng):
        pose = jnp.asarray(rng.normal(size=(2, 69)).astype(np.float32))
        out = angle_prior(pose)
        assert out.shape == (2, 4)
