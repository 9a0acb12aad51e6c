"""Fused Pallas kernel for SMPL pose-blendshape + linear blend skinning.

Replaces the external CUDA LBS path of the reference's ``smplx`` dependency
(reference model/smpl.py:25-37) with an in-repo TPU kernel.  One pass over a
vertex tile computes:

  offsets = pose_feature @ posedirs_tile          (MXU)
  v_posed = v_shaped_tile + offsets               (VPU)
  verts   = sum_k w_k * (A_k[:3, :3] v_posed + A_k[:3, 3])   (VPU)

so the 17 MB posedirs stream through VMEM exactly once and neither the pose
offsets nor the per-vertex blended transforms are ever materialized in HBM.

Layout: component-major (3, V) with vertices on the 128-lane axis — xyz and
the 24 joints are tiny dimensions that would waste lanes, vertices are the
long axis.  V is padded to a multiple of the lane tile.

Measured on TPU v5 lite (tools/bench_lbs.py, V=6890, 2026-08-16):
  B=1   einsum 951 us   pallas 935 us   -> pallas marginally ahead
  B=8   einsum 711 us   pallas 733 us   -> einsum
  B=40  einsum 695 us   pallas 1312 us  -> einsum (XLA batches the matmuls;
        the kernel's per-sample grid serializes)
Conclusion: XLA's fused einsum path is the default
(AdaptConfig.use_pallas_lbs=False); the kernel is kept as the measured
alternative and wins only at batch 1 where dispatch overhead dominates.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynaboa_tpu.models.smpl import SMPLModel, _rigid_transform_chain

TILE_V = 512
NUM_JOINTS = 24
POSE_FEATS = 207


def _skin_kernel(pf_ref, pd_ref, vs_ref, w_ref, A_ref, out_ref):
    """One (sample, vertex-tile) program.

    Block shapes:
      pf_ref: (1, 1, 207)   pose feature (R - I, flattened) for this sample
                            (unit middle axis so the trailing block dims
                            equal the array dims — the Mosaic tiling rule)
      pd_ref: (3, 207, T)   posedirs, component-major
      vs_ref: (1, 3, T)     shaped template vertices
      w_ref:  (24, T)       skinning weights, joint-major
      A_ref:  (1, 24, 4, 4) relative joint transforms
      out_ref:(1, 3, T)     posed vertices
    """
    pf = pf_ref[0]  # (1, 207)

    # Pose-corrected vertex components, kept as three (1, T) vectors.
    vp = []
    for c in range(3):
        off = jnp.dot(pf, pd_ref[c], preferred_element_type=jnp.float32)
        vp.append(vs_ref[0, c:c + 1, :] + off)

    # Blend per-joint rigid transforms on the fly: 24 scalar-weighted
    # affine applications accumulated on the VPU.
    acc = [jnp.zeros_like(vp[0]) for _ in range(3)]
    for k in range(NUM_JOINTS):
        wk = w_ref[k:k + 1, :]  # (1, T)
        for i in range(3):
            t = (
                A_ref[0, k, i, 0] * vp[0]
                + A_ref[0, k, i, 1] * vp[1]
                + A_ref[0, k, i, 2] * vp[2]
                + A_ref[0, k, i, 3]
            )
            acc[i] = acc[i] + wk * t

    for i in range(3):
        out_ref[0, i:i + 1, :] = acc[i]


def skinning_kernel_call(
    pose_feature: jnp.ndarray,   # (N, 207)
    posedirs_cm: jnp.ndarray,    # (3, 207, Vp)
    v_shaped_cm: jnp.ndarray,    # (N, 3, Vp)
    weights_jm: jnp.ndarray,     # (24, Vp)
    rel_transforms: jnp.ndarray, # (N, 24, 4, 4)
    interpret: bool = False,
) -> jnp.ndarray:
    """Launch the fused kernel over an (N, Vp / TILE_V) grid -> (N, 3, Vp)."""
    N, Vp = v_shaped_cm.shape[0], v_shaped_cm.shape[2]
    assert Vp % TILE_V == 0, f"V must be padded to {TILE_V}, got {Vp}"
    grid = (N, Vp // TILE_V)

    return pl.pallas_call(
        _skin_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 3, Vp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, POSE_FEATS), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, POSE_FEATS, TILE_V), lambda n, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_V), lambda n, i: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_JOINTS, TILE_V), lambda n, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_JOINTS, 4, 4), lambda n, i: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TILE_V), lambda n, i: (n, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * 3 * POSE_FEATS * Vp + N * NUM_JOINTS * Vp * 24,
            bytes_accessed=4 * (3 * POSE_FEATS * Vp + N * 3 * Vp * 2
                                + NUM_JOINTS * Vp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pose_feature[:, None, :], posedirs_cm, v_shaped_cm, weights_jm,
      rel_transforms)


class PallasSMPL:
    """SMPL forward with the fused Pallas skinning path.

    Holds kernel-layout copies of the model buffers (component-major
    posedirs, joint-major weights, lane-padded V).  The cheap stages (shape
    blendshapes, rest joints, kinematic chain) stay as jnp ops — they are
    tiny 24-wide contractions XLA fuses well; the fused kernel covers the
    V-wide streaming work.
    """

    def __init__(self, model: SMPLModel, interpret: bool = False):
        self.model = model
        self.interpret = interpret
        V = model.v_template.shape[0]
        self.V = V
        self.Vp = ((V + TILE_V - 1) // TILE_V) * TILE_V
        pad = self.Vp - V

        # posedirs arrives as (207, V*3); component-major -> (3, 207, Vp).
        pd = np.asarray(model.posedirs).reshape(POSE_FEATS, V, 3)
        pd = np.transpose(pd, (2, 0, 1))
        self.posedirs_cm = jnp.asarray(
            np.pad(pd, ((0, 0), (0, 0), (0, pad))), jnp.float32
        )
        w = np.asarray(model.lbs_weights).T  # (24, V)
        self.weights_jm = jnp.asarray(np.pad(w, ((0, 0), (0, pad))), jnp.float32)
        vt = np.asarray(model.v_template).T  # (3, V)
        self.v_template_cm = jnp.asarray(
            np.pad(vt, ((0, 0), (0, pad))), jnp.float32
        )
        sd = np.transpose(np.asarray(model.shapedirs), (1, 2, 0))  # (3, B, V)
        self.shapedirs_cm = jnp.asarray(
            np.pad(sd, ((0, 0), (0, 0), (0, pad))), jnp.float32
        )

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, betas: jnp.ndarray, rotmats: jnp.ndarray):
        """betas (N, 10), rotmats (N, 24, 3, 3) -> vertices (N, V, 3),
        posed kinematic joints (N, 24, 3)."""
        model = self.model
        N = betas.shape[0]

        v_shaped_cm = self.v_template_cm + jnp.einsum(
            "cbv,nb->ncv", self.shapedirs_cm, betas,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Rest joints from the unpadded region.
        v_shaped = jnp.swapaxes(v_shaped_cm[..., : self.V], 1, 2)
        J = jnp.einsum("kv,nvc->nkc", model.J_regressor, v_shaped,
                       precision=jax.lax.Precision.HIGHEST)
        posed_joints, rel = _rigid_transform_chain(rotmats, J, model.parents)

        eye = jnp.eye(3, dtype=betas.dtype)
        pose_feature = (rotmats[:, 1:] - eye).reshape(N, -1)

        verts_cm = skinning_kernel_call(
            pose_feature, self.posedirs_cm, v_shaped_cm, self.weights_jm,
            rel, interpret=self.interpret,
        )
        verts = jnp.swapaxes(verts_cm[..., : self.V], 1, 2)
        return verts, posed_joints
