"""Tests for the long-tail reference API surfaces added for full inventory
parity: the non-merged GMM NLL + mixture mean + prior factory
(reference utils/smplify/prior.py:36-50, 176-231), the HMMR translation fit
(utils/geometry.py:134-153), the pre-remap smplx joint set
(model/smpl.py:39-43), the posetrack original naming (kp_utils.py:338-357),
and the SMPLify-X body-fitting loss (utils/smplify/losses.py:26-47).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dynaboa_tpu.losses import (
    synthetic_gmm_prior,
    gmm_prior_nll,
    gmm_prior_nll_full,
    gmm_mean_pose,
    create_prior,
    angle_prior,
)
from dynaboa_tpu.ops.camera import (
    estimate_translation,
    estimate_translation_hmmr,
)
from dynaboa_tpu.ops import keypoints as kp
from dynaboa_tpu.models.smpl import (
    synthetic_smpl_model,
    smpl_forward,
    original_joints,
    lbs,
)
from dynaboa_tpu.ops.rotations import batch_rodrigues
from dynaboa_tpu.smplify import body_fitting_loss_smplify_x, gmof


class TestGMMFullNLL:
    def test_matches_direct_reference_formula(self, rng):
        """Per-sample mirror of prior.py:198-225 (quadratic NOT halved,
        0.5*(logdet + D*log2pi) normalizer, -log nll_weight of argmin)."""
        prior = synthetic_gmm_prior(seed=3)
        pose = rng.normal(size=(5, 69)).astype(np.float32)
        got = np.asarray(gmm_prior_nll_full(prior, jnp.asarray(pose)))

        means = np.asarray(prior.means, np.float64)
        precs = np.asarray(prior.precisions, np.float64)
        nw = np.asarray(prior.nll_weights, np.float64)
        logdets = np.asarray(prior.logdets, np.float64)
        D = means.shape[1]
        want = []
        for p in pose:
            vals = []
            for m in range(8):
                d = p - means[m]
                quad = d @ precs[m] @ d
                vals.append(quad + 0.5 * (logdets[m] + D * np.log(2 * np.pi)))
            i = int(np.argmin(vals))
            want.append(vals[i] - np.log(nw[i]))
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_orders_like_merged_on_clear_cases(self, rng):
        """Both formulations agree that a pose AT a component mean scores
        far lower than a distant pose."""
        prior = synthetic_gmm_prior(seed=4)
        near = np.asarray(prior.means)[2:3]
        far = near + 5.0
        poses = jnp.asarray(np.concatenate([near, far]).astype(np.float32))
        full = np.asarray(gmm_prior_nll_full(prior, poses))
        merged = np.asarray(gmm_prior_nll(prior, poses))
        assert full[0] < full[1] and merged[0] < merged[1]

    def test_mean_pose(self):
        prior = synthetic_gmm_prior(seed=5)
        got = np.asarray(gmm_mean_pose(prior))
        want = np.asarray(prior.weights) @ np.asarray(prior.means)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestCreatePrior:
    def test_dispatch(self, rng):
        prior = synthetic_gmm_prior(seed=6)
        pose = jnp.asarray(rng.normal(size=(3, 69)).astype(np.float32))

        merged = create_prior("gmm", prior)
        np.testing.assert_allclose(np.asarray(merged(pose)),
                                   np.asarray(gmm_prior_nll(prior, pose)))
        full = create_prior("gmm", prior, use_merged=False)
        np.testing.assert_allclose(np.asarray(full(pose)),
                                   np.asarray(gmm_prior_nll_full(prior, pose)))

        l2 = create_prior("l2")
        np.testing.assert_allclose(np.asarray(l2(pose)),
                                   (np.asarray(pose) ** 2).sum(-1), rtol=1e-6)
        # 'angle' keeps the reference module's (B, 4) per-joint shape
        ang = create_prior("angle")
        np.testing.assert_allclose(np.asarray(ang(pose)),
                                   np.asarray(angle_prior(pose)), rtol=1e-6)
        # 'none' returns the reference's scalar 0.0 (prior.py:44-47)
        assert create_prior("none")(pose) == 0.0
        assert create_prior(None)(pose) == 0.0

    def test_unknown_and_missing_gmm_raise(self):
        with pytest.raises(ValueError):
            create_prior("vposer")
        with pytest.raises(ValueError):
            create_prior("gmm")


class TestEstimateTranslationHMMR:
    def test_equals_core_on_first_14(self, rng):
        S = rng.normal(size=(3, 19, 3)).astype(np.float32)
        S[..., 2] += 5.0
        j2d = rng.uniform(0, 256, size=(3, 19, 3)).astype(np.float32)
        j2d[..., 2] = rng.uniform(0.5, 1.0, size=(3, 19)).astype(np.float32)
        got = np.asarray(estimate_translation_hmmr(jnp.asarray(S),
                                                   jnp.asarray(j2d)))
        want = np.asarray(estimate_translation(jnp.asarray(S[:, :14]),
                                               jnp.asarray(j2d[:, :14]),
                                               img_size=256.0))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_recovers_known_translation(self, rng):
        """Project 3D points with a known translation and recover it."""
        f, img_size = 5000.0, 256.0
        S = rng.normal(size=(2, 19, 3)).astype(np.float64) * 0.3
        t = np.array([[0.05, -0.02, 8.0], [-0.1, 0.03, 12.0]])
        pts = S + t[:, None, :]
        xy = f * pts[..., :2] / pts[..., 2:3] + img_size / 2.0
        j2d = np.concatenate([xy, np.ones_like(xy[..., :1])], -1)
        got = np.asarray(estimate_translation_hmmr(
            jnp.asarray(S.astype(np.float32)),
            jnp.asarray(j2d.astype(np.float32))))
        np.testing.assert_allclose(got, t, rtol=1e-3, atol=1e-3)


class TestOriginalJoints:
    def test_pre_remap_assembly(self, rng):
        model = synthetic_smpl_model(seed=0)
        betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32) * 0.3)
        aa = rng.normal(size=(2, 72)).astype(np.float32) * 0.2
        rotmats = batch_rodrigues(jnp.asarray(aa).reshape(-1, 3)).reshape(
            2, 24, 3, 3)
        verts, kin = lbs(model, betas, rotmats)
        orig = np.asarray(original_joints(model, verts, kin))
        assert orig.shape == (2, 45, 3)
        # first 24 = posed kinematic joints; last 21 = selected vertices
        np.testing.assert_allclose(orig[:, :24], np.asarray(kin))
        np.testing.assert_allclose(
            orig[:, 24:], np.asarray(verts)[:, np.asarray(model.vertex_joint_ids)])
        # consistency with the full forward's smpl_joints field
        out = smpl_forward(model, betas, rotmats)
        np.testing.assert_allclose(orig[:, :24], np.asarray(out.smpl_joints))


class TestPosetrackOriginalNames:
    def test_positional_alignment_with_canonical(self):
        assert len(kp.POSETRACK_ORIGINAL_KP_NAMES) == 17
        rename = {
            "head_bottom": "neck", "head_top": "headtop",
            "left_ear": "lear", "right_ear": "rear",
            "left_shoulder": "lshoulder", "right_shoulder": "rshoulder",
            "left_elbow": "lelbow", "right_elbow": "relbow",
            "left_wrist": "lwrist", "right_wrist": "rwrist",
            "left_hip": "lhip", "right_hip": "rhip",
            "left_knee": "lknee", "right_knee": "rknee",
            "left_ankle": "lankle", "right_ankle": "rankle",
        }
        canonical = tuple(rename.get(n, n)
                          for n in kp.POSETRACK_ORIGINAL_KP_NAMES)
        assert canonical == kp.joint_names("posetrack")


class TestBodyFittingLossSmplifyX:
    def test_matches_direct_formula(self, rng):
        B, J, Z = 2, 49, 32
        body_pose = rng.normal(size=(B, 69)).astype(np.float32) * 0.2
        betas = rng.normal(size=(B, 10)).astype(np.float32) * 0.3
        emb = rng.normal(size=(B, Z)).astype(np.float32)
        cam_t = np.tile(np.array([0.0, 0.0, 10.0], np.float32), (B, 1))
        center = np.full((B, 2), 112.0, np.float32)
        joints3 = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.4
        conf = rng.uniform(0, 1, size=(B, J)).astype(np.float32)
        j2d = rng.uniform(0, 224, size=(B, J, 2)).astype(np.float32)

        got = float(body_fitting_loss_smplify_x(
            jnp.asarray(body_pose), jnp.asarray(betas), jnp.asarray(emb),
            jnp.asarray(cam_t), jnp.asarray(center), jnp.asarray(joints3),
            jnp.asarray(conf), jnp.asarray(j2d)))

        # direct numpy mirror of reference losses.py:26-47
        f = 5000.0
        pts = joints3 + cam_t[:, None, :]
        proj = f * pts[..., :2] / pts[..., 2:3] + center[:, None, :]
        reproj = (conf**2) * np.asarray(
            gmof(jnp.asarray(proj - j2d), 100.0)).sum(-1)
        pose_prior = (4.78**2) * (emb**2).sum()
        shape_p = (5.0**2) * (betas**2).sum(-1)
        angle_p = (15.2**2) * np.asarray(
            angle_prior(jnp.asarray(body_pose))).sum(-1)
        want = (reproj.sum(-1) + pose_prior + shape_p + angle_p).sum()
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_reprojection_output_mode(self, rng):
        B, J = 1, 49
        args = (
            jnp.zeros((B, 69)), jnp.zeros((B, 10)), jnp.zeros((B, 8)),
            jnp.asarray(np.tile(np.array([0, 0, 10.0], np.float32), (B, 1))),
            jnp.full((B, 2), 112.0),
            jnp.asarray(rng.normal(size=(B, J, 3)).astype(np.float32)),
            jnp.ones((B, J)),
            jnp.asarray(rng.uniform(0, 224, size=(B, J, 2)).astype(np.float32)),
        )
        rep = body_fitting_loss_smplify_x(*args, output="reprojection")
        assert rep.shape == (B, J)
