"""SMPLify: iterative test-time body fitting (optional capability).

Capability parity with reference ``utils/smplify/smplify.py:16-175`` and
``utils/smplify/losses.py:11-113`` (present but dormant in the reference —
SURVEY §1): two-stage fitting with Adam — stage 1 optimizes camera
translation + global orient against hip/shoulder reprojection with a depth
anchor; stage 2 optimizes body pose + betas + global orient against the
Geman-McClure robust reprojection error with GMM, angle and shape priors.

TPU-first: both 100-iteration stages compile to single ``lax.fori_loop``
programs over optax Adam state, so one fit is two XLA dispatches instead of
200 python-side optimizer steps.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
import optax

from dynaboa_tpu import constants
from dynaboa_tpu.losses.priors import GMMPrior, gmm_prior_nll, angle_prior
from dynaboa_tpu.models.smpl import SMPLModel, smpl_forward
from dynaboa_tpu.ops.camera import perspective_projection


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robust error (reference losses.py:11-17)."""
    x2 = x**2
    s2 = sigma**2
    return (s2 * x2) / (s2 + x2)


# joint groups (reference losses.py:96-99, smplify.py:31-33)
_OP_ANCHORS = [constants.JOINT_IDS[j] for j in
               ("OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder")]
_GT_ANCHORS = [constants.JOINT_IDS[j] for j in
               ("Right Hip", "Left Hip", "Right Shoulder", "Left Shoulder")]
IGNORED_JOINTS = [constants.JOINT_IDS[j] for j in
                  ("OP Neck", "OP RHip", "OP LHip", "Right Hip", "Left Hip")]


def _project(joints, cam_t, camera_center, focal_length):
    B = joints.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=joints.dtype), (B, 3, 3))
    return perspective_projection(joints, eye, cam_t, focal_length,
                                  camera_center)


def camera_fitting_loss(model_joints, camera_t, camera_t_est, camera_center,
                        joints_2d, joints_conf, focal_length=5000.0,
                        depth_loss_weight=100.0):
    """Reference losses.py:83-113."""
    proj = _project(model_joints, camera_t, camera_center, focal_length)
    op = jnp.asarray(_OP_ANCHORS)
    gt = jnp.asarray(_GT_ANCHORS)
    err_op = (joints_2d[:, op] - proj[:, op]) ** 2
    err_gt = (joints_2d[:, gt] - proj[:, gt]) ** 2
    is_valid = (joints_conf[:, op].min(axis=-1) > 0).astype(
        joints_2d.dtype)[:, None, None]
    reproj = (is_valid * err_op + (1 - is_valid) * err_gt).sum(axis=(1, 2))
    depth = (depth_loss_weight**2) * (camera_t[:, 2] - camera_t_est[:, 2]) ** 2
    return (reproj + depth).sum()


def body_fitting_loss(body_pose, betas, model_joints, camera_t, camera_center,
                      joints_2d, joints_conf, prior: GMMPrior,
                      focal_length=5000.0, sigma=100.0,
                      pose_prior_weight=4.78, shape_prior_weight=5.0,
                      angle_prior_weight=15.2, output="sum"):
    """Reference losses.py:49-81."""
    proj = _project(model_joints, camera_t, camera_center, focal_length)
    reproj_err = gmof(proj - joints_2d, sigma)
    reproj = (joints_conf**2) * reproj_err.sum(axis=-1)

    pose_prior_loss = (pose_prior_weight**2) * gmm_prior_nll(prior, body_pose)
    angle_loss = (angle_prior_weight**2) * angle_prior(body_pose).sum(axis=-1)
    shape_loss = (shape_prior_weight**2) * (betas**2).sum(axis=-1)

    total = reproj.sum(axis=-1) + pose_prior_loss + angle_loss + shape_loss
    if output == "reprojection":
        return reproj
    return total.sum()


def body_fitting_loss_smplify_x(body_pose, betas, pose_embedding, camera_t,
                                camera_center, model_joints, joints_conf,
                                joints_2d, focal_length=5000.0, sigma=100.0,
                                body_pose_weight=4.78, shape_prior_weight=5.0,
                                angle_prior_weight=15.2, output="sum"):
    """SMPLify-X body-fitting loss variant: the GMM pose prior is replaced by
    an L2 penalty on a latent pose embedding (VPoser-style), everything else
    matches ``body_fitting_loss`` (reference losses.py:26-47; imported but
    never called by the reference's SMPLify — kept for capability parity).

    Args:
      pose_embedding: (B, Z) latent pose code; penalized as
        ``body_pose_weight**2 * sum(embedding**2)``.
    """
    proj = _project(model_joints, camera_t, camera_center, focal_length)
    reproj_err = gmof(proj - joints_2d, sigma)
    reproj = (joints_conf**2) * reproj_err.sum(axis=-1)

    pose_prior_loss = (body_pose_weight**2) * jnp.sum(pose_embedding**2)
    shape_loss = (shape_prior_weight**2) * (betas**2).sum(axis=-1)
    angle_loss = (angle_prior_weight**2) * angle_prior(body_pose).sum(axis=-1)

    total = reproj.sum(axis=-1) + pose_prior_loss + angle_loss + shape_loss
    if output == "reprojection":
        return reproj
    return total.sum()


class SMPLify:
    """Two-stage SMPL fitting, jitted end-to-end."""

    def __init__(self, smpl: SMPLModel, prior: GMMPrior,
                 step_size: float = 1e-2, num_iters: int = 100,
                 focal_length: float = 5000.0):
        self.smpl = smpl
        self.prior = prior
        self.num_iters = num_iters
        self.focal_length = focal_length
        self.tx = optax.adam(step_size, b1=0.9, b2=0.999, eps=1e-8,
                             eps_root=0.0)
        self._fit = jax.jit(self._fit_impl)

    def _joints(self, global_orient, body_pose, betas):
        pose = jnp.concatenate([global_orient, body_pose], axis=1)
        out = smpl_forward(self.smpl, betas, pose, pose2rot=True)
        return out.joints, out.vertices

    def _run_stage(self, loss_fn, params, n_iters):
        opt_state = self.tx.init(params)

        def body(_, carry):
            params, opt_state = carry
            g = jax.grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, n_iters, body, (params, opt_state))
        return params

    def _fit_impl(self, init_pose, init_betas, init_cam_t, camera_center,
                  keypoints_2d):
        joints_2d = keypoints_2d[..., :2]
        joints_conf = keypoints_2d[..., 2]

        body_pose0 = init_pose[:, 3:]
        global_orient0 = init_pose[:, :3]

        # Stage 1: camera translation + global orient
        def cam_loss(p):
            joints, _ = self._joints(p["global_orient"], body_pose0,
                                     init_betas)
            return camera_fitting_loss(
                joints, p["camera_t"], init_cam_t, camera_center,
                joints_2d, joints_conf, self.focal_length)

        p1 = self._run_stage(
            cam_loss,
            {"global_orient": global_orient0, "camera_t": init_cam_t},
            self.num_iters)
        camera_t = p1["camera_t"]

        # Stage 2: body pose + betas + global orient; hip/neck joints ignored
        conf2 = joints_conf.at[:, jnp.asarray(IGNORED_JOINTS)].set(0.0)

        def body_loss(p):
            joints, _ = self._joints(p["global_orient"], p["body_pose"],
                                     p["betas"])
            return body_fitting_loss(
                p["body_pose"], p["betas"], joints, camera_t, camera_center,
                joints_2d, conf2, self.prior, self.focal_length)

        p2 = self._run_stage(
            body_loss,
            {"global_orient": p1["global_orient"], "body_pose": body_pose0,
             "betas": init_betas},
            self.num_iters)

        joints, vertices = self._joints(p2["global_orient"], p2["body_pose"],
                                        p2["betas"])
        reproj = body_fitting_loss(
            p2["body_pose"], p2["betas"], joints, camera_t, camera_center,
            joints_2d, conf2, self.prior, self.focal_length,
            output="reprojection")
        pose = jnp.concatenate([p2["global_orient"], p2["body_pose"]], axis=1)
        return vertices, joints, pose, p2["betas"], camera_t, reproj

    def __call__(self, init_pose, init_betas, init_cam_t, camera_center,
                 keypoints_2d):
        """Fit the body model to 2D keypoints.

        Args:
          init_pose: (B, 72), init_betas: (B, 10), init_cam_t: (B, 3),
          camera_center: (B, 2), keypoints_2d: (B, 49, 3).
        Returns:
          (vertices, joints, pose, betas, camera_translation,
           per-joint reprojection loss)
        """
        return self._fit(init_pose, init_betas, init_cam_t, camera_center,
                         keypoints_2d)

    def get_fitting_loss(self, pose, betas, cam_t, camera_center,
                         keypoints_2d):
        """Reprojection loss at given parameters (reference
        smplify.py:141-172)."""
        joints_2d = keypoints_2d[..., :2]
        conf = keypoints_2d[..., 2].at[:, jnp.asarray(IGNORED_JOINTS)].set(0.0)
        joints, _ = self._joints(pose[:, :3], pose[:, 3:], betas)
        return body_fitting_loss(pose[:, 3:], betas, joints, cam_t,
                                 camera_center, joints_2d, conf, self.prior,
                                 self.focal_length, output="reprojection")
