import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu import constants
from dynaboa_tpu.models import (
    SMPL_PARENTS,
    smpl_forward,
    synthetic_smpl_model,
    lbs,
)
from tests.test_rotations import random_rotmats


def numpy_lbs_reference(model, betas, rotmats):
    """Independent, direct numpy implementation of linear blend skinning:
    explicit per-joint global transforms, no homogeneous-matrix packing."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    Jreg = np.asarray(model.J_regressor, np.float64)
    W = np.asarray(model.lbs_weights, np.float64)
    parents = model.parents

    N = betas.shape[0]
    out_v, out_j = [], []
    for n in range(N):
        v_shaped = v_template + shapedirs @ betas[n]
        J = Jreg @ v_shaped.reshape(-1, 3)

        pose_feat = (rotmats[n, 1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

        # forward kinematics: global rotation and joint position per joint
        Rg = [rotmats[n, 0]]
        pg = [J[0]]
        for k in range(1, 24):
            p = parents[k]
            Rg.append(Rg[p] @ rotmats[n, k])
            pg.append(Rg[p] @ (J[k] - J[p]) + pg[p])
        Rg = np.stack(Rg)
        pg = np.stack(pg)

        # skinning: v' = sum_k w_k (Rg_k (v - J_k) + pg_k)
        per_joint = np.einsum("kij,vj->kvi", Rg, v_posed) - np.einsum(
            "kij,kj->ki", Rg, J
        )[:, None] + pg[:, None]
        verts = np.einsum("vk,kvi->vi", W, per_joint)
        out_v.append(verts)
        out_j.append(pg)
    return np.stack(out_v), np.stack(out_j)


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl_model(seed=3, num_vertices=512)


class TestLBS:
    def test_identity_pose_is_rest_shape(self, model):
        betas = jnp.zeros((2, 10))
        rotmats = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        verts, joints = lbs(model, betas, rotmats)
        np.testing.assert_allclose(
            np.asarray(verts),
            np.broadcast_to(np.asarray(model.v_template), (2, 512, 3)),
            atol=1e-5,
        )
        rest_J = np.asarray(model.J_regressor) @ np.asarray(model.v_template)
        np.testing.assert_allclose(np.asarray(joints[0]), rest_J, atol=1e-5)

    def test_matches_independent_numpy_reference(self, model, rng):
        betas = rng.normal(size=(3, 10)).astype(np.float32)
        rotmats = random_rotmats(rng, 3 * 24).reshape(3, 24, 3, 3)
        verts, joints = lbs(model, jnp.asarray(betas), jnp.asarray(rotmats))
        want_v, want_j = numpy_lbs_reference(model, betas, rotmats)
        np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-4)
        np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-4)

    def test_global_orient_rotates_rigidly(self, model, rng):
        # identity body pose + global orientation R == rigid rotation about
        # the root joint
        betas = jnp.zeros((1, 10))
        R = random_rotmats(rng, 1)
        rotmats = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 24, 3, 3)).copy()
        rotmats[0, 0] = R[0]
        verts, _ = lbs(model, betas, jnp.asarray(rotmats))
        root = (np.asarray(model.J_regressor) @ np.asarray(model.v_template))[0]
        want = (np.asarray(model.v_template) - root) @ R[0].T + root
        np.testing.assert_allclose(np.asarray(verts[0]), want, atol=1e-4)

    @pytest.mark.slow
    def test_grad_flows(self, model, rng):
        betas = jnp.asarray(rng.normal(size=(1, 10)).astype(np.float32))

        def loss(b):
            v, _ = lbs(model, b, jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3)))
            return (v**2).sum()

        g = jax.grad(loss)(betas)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestSMPLForward:
    def test_output_shapes(self, model, rng):
        betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
        rotmats = jnp.asarray(random_rotmats(rng, 48).reshape(2, 24, 3, 3))
        out = smpl_forward(model, betas, rotmats)
        assert out.vertices.shape == (2, 512, 3)
        assert out.joints.shape == (2, 49, 3)
        assert out.smpl_joints.shape == (2, 24, 3)

    def test_pose2rot_axis_angle_path(self, model, rng):
        betas = jnp.zeros((1, 10))
        aa = rng.normal(scale=0.2, size=(1, 72)).astype(np.float32)
        out_aa = smpl_forward(model, betas, jnp.asarray(aa), pose2rot=True)
        from dynaboa_tpu.ops import batch_rodrigues

        rotmats = batch_rodrigues(jnp.asarray(aa).reshape(-1, 3)).reshape(1, 24, 3, 3)
        out_rm = smpl_forward(model, betas, rotmats)
        np.testing.assert_allclose(
            np.asarray(out_aa.vertices), np.asarray(out_rm.vertices), atol=1e-5
        )

    def test_spin_gather_contract(self, model):
        """SPIN joint ordering: OP MidHip (idx 8) must equal SMPL joint 0
        (pelvis), per constants.JOINT_MAP."""
        betas = jnp.zeros((1, 10))
        rotmats = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        out = smpl_forward(model, betas, rotmats)
        np.testing.assert_allclose(
            np.asarray(out.joints[0, 8]), np.asarray(out.smpl_joints[0, 0]),
            atol=1e-6,
        )

    def test_parents_table(self):
        assert len(SMPL_PARENTS) == constants.NUM_JOINTS
        assert SMPL_PARENTS[0] == -1
        assert all(SMPL_PARENTS[k] < k for k in range(1, 24))
