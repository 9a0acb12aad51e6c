"""On-device 3D evaluation metrics: MPJPE, PA-MPJPE, PVE.

Definition parity with reference dynaboa_benchmark.py:204-262 / BASELINE.md:
- MPJPE: mean L2 over 14 joints (H36M regressor on vertices, H36M_TO_J14
  selection, pelvis-centered), x1000 -> mm.
- PA-MPJPE: same after per-sample Procrustes alignment.
- PVE: mean per-vertex L2 vs the *neutral*-SMPL GT mesh, x1000.
GT joints come from gendered meshes (male by default, female where
gender == 1).

The reference computes Procrustes per frame in numpy on the host; here
everything is jnp so the metrics fuse into the adaptation step's XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from dynaboa_tpu import constants
from dynaboa_tpu.models.smpl import SMPLModel, smpl_forward
from dynaboa_tpu.ops.procrustes import similarity_transform

_HI = lax.Precision.HIGHEST


class GenderedSMPL(NamedTuple):
    """The three SMPL bodies + H36M joint regressor used by evaluation
    (reference base_adaptor.py:143-149)."""

    neutral: SMPLModel
    male: SMPLModel
    female: SMPLModel
    J_regressor_h36m: jnp.ndarray   # (17, V)


def h36m_14_joints(Jreg: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """Pelvis-centered 14-joint skeleton from mesh vertices."""
    j = jnp.einsum("kv,nvc->nkc", Jreg, vertices, precision=_HI)  # (N,17,3)
    pelvis = j[:, :1]
    j = j[:, jnp.asarray(np.asarray(constants.H36M_TO_J14))]
    return j - pelvis


def gt_targets(
    smpls: GenderedSMPL,
    gt_pose: jnp.ndarray,          # (N, 72) axis-angle
    gt_betas: jnp.ndarray,         # (N, 10)
    gender: jnp.ndarray,           # (N,) int: 0 male, 1 female
) -> dict:
    """Prediction-independent evaluation targets: three GT SMPL forwards
    (gendered J14 skeleton + neutral mesh).  Loop-invariant within a frame —
    the per-update metric records (reference dynaboa_benchmark.py:158-191)
    evaluate up to 1+optim_steps predictions against the SAME targets, so
    the caller computes these once outside the dynamic while_loop (XLA does
    not hoist them out of the loop body on its own; measured ~1 ms per
    evaluate on the v5e)."""
    male = smpl_forward(smpls.male, gt_betas, gt_pose, pose2rot=True)
    female = smpl_forward(smpls.female, gt_betas, gt_pose, pose2rot=True)
    gt_vertices = jnp.where(
        (gender == 1)[:, None, None], female.vertices, male.vertices
    )
    neutral = smpl_forward(smpls.neutral, gt_betas, gt_pose, pose2rot=True)
    return {
        "gt_j14": h36m_14_joints(smpls.J_regressor_h36m, gt_vertices),
        "gt_neutral_vertices": neutral.vertices,
    }


def evaluate_pred(
    smpls: GenderedSMPL,
    pred_vertices: jnp.ndarray,    # (N, V, 3)
    targets: dict,
):
    """Metrics of one prediction against precomputed ``gt_targets``."""
    gt_j14 = targets["gt_j14"]
    pred_j14 = h36m_14_joints(smpls.J_regressor_h36m, pred_vertices)

    mpjpe = jnp.sqrt(((pred_j14 - gt_j14) ** 2).sum(-1)).mean(-1)

    aligned = similarity_transform(pred_j14, gt_j14)
    pampjpe = jnp.sqrt(((aligned - gt_j14) ** 2).sum(-1)).mean(-1)

    pve = jnp.sqrt(
        ((targets["gt_neutral_vertices"] - pred_vertices) ** 2).sum(-1)
    ).mean(-1)

    return {
        "mpjpe": mpjpe * 1000.0,
        "pampjpe": pampjpe * 1000.0,
        "pve": pve * 1000.0,
    }


def evaluate_frame(
    smpls: GenderedSMPL,
    pred_vertices: jnp.ndarray,    # (N, V, 3)
    gt_pose: jnp.ndarray,          # (N, 72) axis-angle
    gt_betas: jnp.ndarray,         # (N, 10)
    gender: jnp.ndarray,           # (N,) int: 0 male, 1 female
):
    """Returns dict of (N,) metric arrays in millimetres."""
    return evaluate_pred(
        smpls, pred_vertices, gt_targets(smpls, gt_pose, gt_betas, gender))
