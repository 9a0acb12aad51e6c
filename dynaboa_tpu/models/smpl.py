"""Functional SMPL body model with the SPIN 49-joint output space.

Capability parity with reference ``model/smpl.py`` (which wraps the external
``smplx`` package) — here the full linear-blend-skinning pipeline is in-repo
and functional:

  vertices, joints = smpl_forward(model, betas, pose)

The heavy contractions (blend shapes 6890x3x10, pose blendshapes 6890x3x207,
skinning 6890x24, joint regression 54x6890) are pure jnp einsums by default so
XLA fuses them; a fused Pallas kernel path for the skinning lives in
``dynaboa_tpu.kernels.lbs`` and plugs in via ``smpl_forward(..., lbs_fn=...)``
— the engine enables it for its no-grad decode paths with
``AdaptConfig.use_pallas_lbs`` (the kernel has no VJP, so the in-loss decode
always uses the einsum path; pick per-platform from the measurements in
``tools/bench_lbs.py``).

Model data loads from an ``.npz`` (see ``tools/convert_smpl.py`` for
converting the official SMPL pickle); a deterministic synthetic model with the
true topology shapes backs the test suite, since the SMPL body data is
license-gated and not redistributable.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from dynaboa_tpu import constants
from dynaboa_tpu.ops.rotations import batch_rodrigues

_HI = lax.Precision.HIGHEST


class SMPLModel(NamedTuple):
    """Static SMPL model data (one per gender), all jnp arrays.

    Shapes follow the official model: V=6890 vertices, K=24 joints, B=10
    shape coefficients, P=207 pose-blendshape features (23 * 9).
    """

    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, B)
    posedirs: jnp.ndarray        # (P, V*3)  — row-major flattened, lbs layout
    J_regressor: jnp.ndarray     # (K, V)
    lbs_weights: jnp.ndarray     # (V, K)
    parents: tuple               # length-K python tuple (static for tracing)
    faces: np.ndarray            # (F, 3) int32, host-side (rendering only)
    J_regressor_extra: jnp.ndarray  # (9, V) — SPIN extra joints
    vertex_joint_ids: jnp.ndarray   # (21,) int32 selected mesh vertices


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray        # (N, V, 3)
    joints: jnp.ndarray          # (N, 49, 3) SPIN ordering
    smpl_joints: jnp.ndarray     # (N, 24, 3) posed kinematic joints


def _rigid_transform_chain(rot_mats, joints, parents):
    """World transforms of each joint from local rotations (relative-joint
    formulation, identical maths to the standard SMPL LBS).

    Args:
      rot_mats: (N, K, 3, 3)
      joints: (N, K, 3) rest-pose joint locations.
      parents: length-K tuple; parents[0] is ignored (root).
    Returns:
      posed_joints: (N, K, 3), rel_transforms: (N, K, 4, 4)
    """
    N, K = rot_mats.shape[0], rot_mats.shape[1]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, [p for p in parents[1:]]]], axis=1
    )

    # local 4x4 transforms
    top = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)  # (N,K,3,4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rot_mats.dtype), (N, K, 1, 4)
    )
    local = jnp.concatenate([top, bottom], axis=-2)                    # (N,K,4,4)

    # The kinematic chain is static, and its DEPTH (~7 for SMPL) is much
    # smaller than its joint count: batch all joints of equal depth into one
    # (N, L, 4, 4) product instead of emitting K-1 sequential 4x4 matmuls.
    # Per-pair arithmetic is unchanged (same products, same order), so the
    # result matches the sequential walk; the op count drops from 23 chained
    # matmuls to max-depth batched ones — this chain runs inside every loss
    # gradient, so it is on the per-update critical path.
    #
    # The 4x4 products are written as broadcast-multiply + sum rather than
    # dot_general: these dots are length-4 (VPU work, no MXU win), and the
    # many-batch-dims dot_generals this produces under vmap (the
    # multi-stream path) trip an XLA:TPU lowering bug — the batched 4x4
    # matmul gets rewritten into a dilated convolution that fails a
    # post-optimization shape check.
    def mm4(a, b):
        # (..., 4, 4) @ (..., 4, 4) via VPU ops
        return (a[..., :, :, None] * b[..., None, :, :]).sum(axis=-2)

    depth = [0] * K
    for k in range(1, K):
        depth[k] = depth[parents[k]] + 1
    world = local
    for d in range(1, max(depth) + 1):
        ids = tuple(k for k in range(K) if depth[k] == d)
        pids = tuple(parents[k] for k in ids)
        world = world.at[:, ids].set(
            mm4(world[:, pids, :, :], local[:, ids, :, :]))

    posed_joints = world[..., :3, 3]
    # subtract the contribution of the rest joint location (standard trick);
    # length-4 matvec as multiply+sum (see mm4 note above)
    joints_homo = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], -1)
    correction = (world * joints_homo[..., None, :]).sum(-1)
    rel = world.at[..., :3, 3].add(-correction[..., :3])
    return posed_joints, rel


def lbs(
    model: SMPLModel,
    betas: jnp.ndarray,
    pose_rotmats: jnp.ndarray,
):
    """Linear blend skinning.

    Args:
      model: SMPLModel.
      betas: (N, 10)
      pose_rotmats: (N, 24, 3, 3) — global_orient at index 0.
    Returns:
      vertices (N, V, 3), posed kinematic joints (N, 24, 3)
    """
    N = betas.shape[0]
    dtype = betas.dtype

    # 1. Shape blendshapes: v_shaped = T + shapedirs . betas
    v_shaped = model.v_template + jnp.einsum(
        "vcb,nb->nvc", model.shapedirs, betas, precision=_HI
    )

    # 2. Rest-pose joints
    J = jnp.einsum("kv,nvc->nkc", model.J_regressor, v_shaped, precision=_HI)

    # 3. Pose blendshapes from the non-root rotations
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (pose_rotmats[:, 1:] - eye).reshape(N, -1)          # (N, 207)
    pose_offsets = jnp.matmul(
        pose_feature, model.posedirs, precision=_HI
    ).reshape(N, -1, 3)
    v_posed = v_shaped + pose_offsets

    # 4. Kinematic chain
    posed_joints, rel_transforms = _rigid_transform_chain(
        pose_rotmats, J, model.parents
    )

    # 5. Skinning: per-vertex blended transforms
    # T_v = sum_k w_vk * A_k  -> apply to homogeneous rest vertices
    T = jnp.einsum("vk,nkij->nvij", model.lbs_weights, rel_transforms,
                   precision=_HI)
    v_homo = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], -1)
    # per-vertex affine application: length-4 dots as multiply+sum (VPU; the
    # (N,V)-batched dot_general form trips the same vmap lowering bug as the
    # chain matmuls, see mm4 above)
    verts = (T * v_homo[..., None, :]).sum(-1)[..., :3]
    return verts, posed_joints


def spin_joints(model: SMPLModel, verts: jnp.ndarray,
                kin_joints: jnp.ndarray) -> jnp.ndarray:
    """SPIN 49-joint assembly from skinned vertices: [24 posed kinematic +
    21 selected vertices + 9 extra regressed] gathered into the SPIN order
    (reference model/smpl.py:25-37, constants.py:72-90)."""
    sel_verts = verts[:, model.vertex_joint_ids]                       # (N,21,3)
    extra = jnp.einsum("jv,nvc->njc", model.J_regressor_extra, verts,
                       precision=_HI)                                  # (N,9,3)
    joints54 = jnp.concatenate([kin_joints, sel_verts, extra], axis=1)
    return joints54[:, jnp.asarray(constants.SPIN_JOINT_GATHER)]


def original_joints(model: SMPLModel, verts: jnp.ndarray,
                    kin_joints: jnp.ndarray) -> jnp.ndarray:
    """The pre-remap smplx joint set: [24 posed kinematic + 21 selected
    vertices], without the 9 extra regressed joints and without the SPIN
    gather (reference model/smpl.py:39-43 ``get_original_kps``)."""
    sel_verts = verts[:, model.vertex_joint_ids]
    return jnp.concatenate([kin_joints, sel_verts], axis=1)


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,
    pose: jnp.ndarray,
    pose2rot: bool = False,
    lbs_fn=None,
) -> SMPLOutput:
    """Full SMPL forward returning SPIN's 49-joint set.

    Mirrors reference model/smpl.py:25-37: vertices via LBS + the 49-entry
    SPIN gather (``spin_joints``).

    Args:
      betas: (N, 10)
      pose: (N, 24, 3, 3) rotmats if not pose2rot, else (N, 72) axis-angle.
      lbs_fn: optional replacement for the einsum ``lbs`` path — e.g. a
        ``dynaboa_tpu.kernels.lbs.PallasSMPL`` instance.  NB the Pallas
        kernel has no VJP; only use it outside gradient computations.
    """
    if pose2rot:
        rotmats = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
    else:
        rotmats = pose
    if lbs_fn is not None:
        verts, kin_joints = lbs_fn(betas, rotmats)
    else:
        verts, kin_joints = lbs(model, betas, rotmats)
    joints = spin_joints(model, verts, kin_joints)
    return SMPLOutput(vertices=verts, joints=joints, smpl_joints=kin_joints)


# ---------------------------------------------------------------------------
# Model data loading
# ---------------------------------------------------------------------------

# SMPL kinematic tree (public topology).
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 20, 21,
)


def load_smpl_npz(path: str) -> SMPLModel:
    """Load a converted SMPL model (see tools/convert_smpl.py)."""
    data = np.load(path, allow_pickle=False)
    posedirs = data["posedirs"]
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    extra = data.get("J_regressor_extra")
    if extra is None:
        extra = np.zeros((constants.NUM_EXTRA_JOINTS, constants.NUM_VERTICES),
                         np.float32)
    return SMPLModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(data["shapedirs"][..., :10], jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        parents=tuple(int(p) for p in data["kintree_parents"]),
        faces=np.asarray(data["f"], np.int32),
        J_regressor_extra=jnp.asarray(extra, jnp.float32),
        vertex_joint_ids=jnp.asarray(constants.VERTEX_JOINT_IDS),
    )


def synthetic_smpl_model(
    seed: int = 0,
    num_vertices: int = constants.NUM_VERTICES,
) -> SMPLModel:
    """Deterministic stand-in with the true SMPL topology shapes.

    Used by the test-suite and benchmarks when the license-gated SMPL body
    data is absent.  The geometry is a vaguely body-shaped point cloud with
    smooth skinning weights so LBS behaves qualitatively like the real model
    (rigid under identity pose, smooth under articulation).
    """
    rng = np.random.default_rng(seed)
    V, K, B = num_vertices, constants.NUM_JOINTS, constants.NUM_BETAS

    # Rest joints roughly on a body-like kinematic tree.
    joints = rng.normal(scale=0.3, size=(K, 3)).astype(np.float64)
    for k in range(1, K):
        joints[k] = joints[SMPL_PARENTS[k]] + rng.normal(scale=0.15, size=3)

    # Vertices scattered around bones.
    owner = rng.integers(0, K, size=V)
    v_template = joints[owner] + rng.normal(scale=0.07, size=(V, 3))

    # Smooth skinning weights by distance to joints.
    d2 = ((v_template[:, None, :] - joints[None]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.02)
    w[np.arange(V), owner] += 1.0
    weights = (w / w.sum(1, keepdims=True)).astype(np.float32)

    # J_regressor that exactly reproduces the construction joints from the
    # template (per-joint normalized weights over its owned vertices).
    Jreg = np.zeros((K, V), np.float64)
    for k in range(K):
        mask = owner == k
        if mask.sum() == 0:
            mask[rng.integers(0, V)] = True
        Jreg[k, mask] = 1.0 / mask.sum()
    # correct so that Jreg @ v_template == joints exactly is not required;
    # rest joints simply follow the regressor like the real model.

    shapedirs = rng.normal(scale=0.01, size=(V, 3, B)).astype(np.float32)
    posedirs = rng.normal(
        scale=0.001, size=(constants.NUM_POSEDIRS, V * 3)
    ).astype(np.float32)

    # Random but valid triangle list.
    faces = rng.integers(0, V, size=(13776, 3)).astype(np.int32)

    Jreg_extra = np.zeros((constants.NUM_EXTRA_JOINTS, V), np.float32)
    cols = rng.integers(0, V, size=(constants.NUM_EXTRA_JOINTS, 4))
    for j in range(constants.NUM_EXTRA_JOINTS):
        Jreg_extra[j, cols[j]] = 0.25

    vji = constants.VERTEX_JOINT_IDS
    if num_vertices < constants.NUM_VERTICES:
        vji = np.minimum(vji, num_vertices - 1).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(Jreg, jnp.float32),
        lbs_weights=jnp.asarray(weights),
        parents=SMPL_PARENTS,
        faces=faces,
        J_regressor_extra=jnp.asarray(Jreg_extra),
        vertex_joint_ids=jnp.asarray(vji),
    )
