"""Pose and shape priors.

Capability parity with reference ``utils/smplify/prior.py``: the GMM
max-mixture negative log-likelihood (MaxMixturePrior:100-231, 'merged' path),
the SMPLify elbow/knee angle prior (SMPLifyAnglePrior:53-89) and the L2 prior
(L2Prior:92-97).  The GMM data (means/covars/weights over the 69-d body pose)
loads from the standard ``gmm_08.pkl`` or a converted ``.npz``; precisions and
normalized mixture weights are precomputed in float64 at load, exactly like
the reference's buffer setup (prior.py:142-171).
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

POSE_DIM = 69


class GMMPrior(NamedTuple):
    means: jnp.ndarray        # (M, 69)
    precisions: jnp.ndarray   # (M, 69, 69)
    nll_weights: jnp.ndarray  # (M,) — weights / ((2*pi)^(69/2) * relative sqrt-det)
    weights: jnp.ndarray      # (M,) raw mixture weights (reference prior.py:163-164)
    logdets: jnp.ndarray      # (M,) log(det(cov) + eps) for the full-NLL path


# Reference prior.py:103 default determinant regularizer.
_GMM_EPSILON = 1e-16


def _build_gmm(means: np.ndarray, covs: np.ndarray, weights: np.ndarray) -> GMMPrior:
    means = means.astype(np.float64)
    covs = covs.astype(np.float64)
    weights = weights.astype(np.float64)

    precisions = np.stack([np.linalg.inv(c) for c in covs])
    dets = np.array([np.linalg.det(c) for c in covs])
    sqrdets = np.sqrt(dets)
    const = (2 * np.pi) ** (POSE_DIM / 2.0)
    nll_weights = weights / (const * (sqrdets / sqrdets.min()))

    return GMMPrior(
        means=jnp.asarray(means, jnp.float32),
        precisions=jnp.asarray(precisions, jnp.float32),
        nll_weights=jnp.asarray(nll_weights, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        logdets=jnp.asarray(np.log(dets + _GMM_EPSILON), jnp.float32),
    )


def load_gmm_prior(path: str) -> GMMPrior:
    """Load from gmm_XX.pkl (dict of means/covars/weights) or converted npz."""
    if path.endswith(".npz"):
        d = np.load(path)
        return _build_gmm(d["means"], d["covars"], d["weights"])
    with open(path, "rb") as f:
        g = pickle.load(f, encoding="latin1")
    if not isinstance(g, dict):  # sklearn GMM object
        g = {"means": g.means_, "covars": g.covars_, "weights": g.weights_}
    return _build_gmm(np.asarray(g["means"]), np.asarray(g["covars"]),
                      np.asarray(g["weights"]))


def default_gmm_path() -> str | None:
    """Locate a GMM asset: repo asset dir, then the conventional data dirs."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(here, "assets", "gmm_08.npz"),
        os.path.join(os.path.dirname(here), "data", "gmm_08.pkl"),
        "data/gmm_08.pkl",
        "data/spin_data/gmm_08.pkl",
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def synthetic_gmm_prior(seed: int = 0, num_gaussians: int = 8) -> GMMPrior:
    """Deterministic stand-in prior for tests (diagonal-dominant covariances)."""
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=0.2, size=(num_gaussians, POSE_DIM))
    A = rng.normal(scale=0.05, size=(num_gaussians, POSE_DIM, POSE_DIM))
    covs = np.einsum("mij,mkj->mik", A, A) + np.eye(POSE_DIM) * 0.5
    weights = rng.dirichlet(np.ones(num_gaussians))
    return _build_gmm(means, covs, weights)


def gmm_prior_nll(prior: GMMPrior, pose: jnp.ndarray) -> jnp.ndarray:
    """Max-mixture NLL: min over components of the quadratic term minus the
    log mixture weight (reference prior.py:181-196, 'merged' formulation).

    Args:
      pose: (B, 69) body pose as axis-angle (no global orient).
    Returns:
      (B,) per-sample NLL.
    """
    diff = pose[:, None, :] - prior.means[None]                # (B, M, 69)
    prec_diff = jnp.einsum("mij,bmj->bmi", prior.precisions, diff,
                           precision=_HI)
    quad = jnp.sum(prec_diff * diff, axis=-1)                  # (B, M)
    loglik = 0.5 * quad - jnp.log(prior.nll_weights)[None]
    return jnp.min(loglik, axis=1)


def gmm_prior_nll_full(prior: GMMPrior, pose: jnp.ndarray) -> jnp.ndarray:
    """Full (non-'merged') max-mixture NLL with the Gaussian normalizers kept
    explicit: per component quadratic + 0.5*(log det cov + D*log 2pi) — the
    quadratic is deliberately NOT halved, matching the reference formula —
    minimized over components, minus the log nll-weight of the argmin
    component (reference prior.py:198-225, the ``use_merged=False`` branch of
    ``MaxMixturePrior.forward``).

    The reference's batched indexing (`log_likelihoods[:, min_idx]`) only
    gathers correctly for batch size 1; this implements the per-sample gather
    it intends.

    Args:
      pose: (B, 69) body pose as axis-angle (no global orient).
    Returns:
      (B,) per-sample NLL.
    """
    diff = pose[:, None, :] - prior.means[None]                # (B, M, 69)
    prec_diff = jnp.einsum("mij,bmj->bmi", prior.precisions, diff,
                           precision=_HI)
    quad = jnp.sum(prec_diff * diff, axis=-1)                  # (B, M)
    loglik = quad + 0.5 * (prior.logdets
                           + POSE_DIM * jnp.log(2.0 * jnp.pi))[None]
    min_idx = jnp.argmin(loglik, axis=1)
    min_ll = jnp.take_along_axis(loglik, min_idx[:, None], axis=1)[:, 0]
    return min_ll - jnp.log(prior.nll_weights)[min_idx]


def gmm_mean_pose(prior: GMMPrior) -> jnp.ndarray:
    """Mean of the mixture: weights @ means (reference prior.py:176-179)."""
    return jnp.einsum("m,mj->j", prior.weights, prior.means, precision=_HI)


def create_prior(prior_type: str | None, prior: GMMPrior | None = None,
                 use_merged: bool = True):
    """Factory mirroring reference prior.py:36-50: returns a callable
    ``f(pose, betas)`` for 'gmm' | 'l2' | 'angle' | 'none'.

    The reference returns nn.Modules; here each kind closes over its data and
    stays jit-compatible.  'gmm' requires ``prior``; ``use_merged`` picks the
    merged vs full NLL formulation (prior.py:226-231).  Output shapes match
    the reference modules: (B,) for gmm/l2, (B, 4) per-joint penalties for
    'angle' (SMPLifyAnglePrior.forward), scalar 0.0 for 'none'.
    """
    if prior_type == "gmm":
        if prior is None:
            raise ValueError("create_prior('gmm') needs a GMMPrior")
        fn = gmm_prior_nll if use_merged else gmm_prior_nll_full
        return lambda pose, betas=None: fn(prior, pose)
    if prior_type == "l2":
        return lambda pose, betas=None: jnp.sum(pose**2, axis=-1)
    if prior_type == "angle":
        return lambda pose, betas=None: angle_prior(pose)
    if prior_type in ("none", None):
        return lambda pose, betas=None: 0.0
    raise ValueError(f"Prior {prior_type!r} is not implemented")


def shape_prior(betas: jnp.ndarray, row_w=None) -> jnp.ndarray:
    """L2 shape regularizer: mean over batch of sum(betas^2)
    (reference base_adaptor.py:401-402); optional per-row weights exclude
    window pad rows (losses/adaptation.py row_weighted_mean)."""
    per = jnp.sum(betas**2, axis=-1)
    if row_w is None:
        return per.mean()
    return (per * row_w).sum() / row_w.sum()


# SMPLify angle prior: indices into the 72-d full pose for l/r elbow and knee
# bend dimensions, with bend-direction signs (reference prior.py:53-89).
_ANGLE_IDXS = np.array([55, 58, 12, 15], dtype=np.int32)
_ANGLE_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], dtype=np.float32)


def angle_prior(pose: jnp.ndarray, with_global_pose: bool = False) -> jnp.ndarray:
    """Penalize hyper-extension of elbows/knees.

    Args:
      pose: (B, 69) body pose (or (B, 72) if with_global_pose).
    Returns:
      (B, 4) per-joint penalties exp(pose * sign)^2.
    """
    idxs = _ANGLE_IDXS - (0 if with_global_pose else 3)
    return jnp.exp(pose[:, idxs] * _ANGLE_SIGNS) ** 2


def l2_prior(x: jnp.ndarray) -> jnp.ndarray:
    """Plain sum-of-squares prior (reference prior.py:92-97)."""
    return jnp.sum(x**2)
